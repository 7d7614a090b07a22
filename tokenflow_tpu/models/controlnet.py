"""Flax ControlNet — TPU-native re-implementation.

Architectural contract of ``diffusers.ControlNetModel`` as the reference
uses it (preprocess.py:60-68,129-149: canny ControlNet on SD-1.5 producing
down-block + mid-block residuals consumed by the UNet). The encoder half
mirrors UNet2DConditionModel exactly (same module names, so the weight
converter shares the UNet rename rules), plus the conditioning-image
embedder and the zero-initialized projection convs.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from tokenflow_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2DModel,
    timestep_embedding,
)
from tokenflow_tpu.models.unet2d import UNet2DConfig


class ControlNetCondEmbedding(nn.Module):
    """Conditioning-image encoder: RGB (B,H,W,3) -> (B,H/8,W/8,320).

    diffusers ControlNetConditioningEmbedding semantics: conv_in(3->16),
    interleaved stride-1/stride-2 convs through (16,32,96,256), zero-init
    conv_out(256->block0)."""

    conditioning_channels: tuple = (16, 32, 96, 256)
    out_channels: int = 320
    num_downsamples: int = 3  # 3 stride-2 convs = the x8 latent factor
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cond):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # use the last (num_downsamples+1) channel stops so the full-size
        # config keeps exact diffusers naming/shapes
        ch = self.conditioning_channels[
            len(self.conditioning_channels) - 1 - self.num_downsamples :
        ]
        h = nn.Conv(ch[0], (3, 3), name="conv_in", **common)(
            cond.astype(self.dtype)
        )
        h = nn.silu(h)
        for i in range(len(ch) - 1):
            h = nn.Conv(ch[i], (3, 3), name=f"block_{2 * i}", **common)(h)
            h = nn.silu(h)
            h = nn.Conv(
                ch[i + 1], (3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1)), name=f"block_{2 * i + 1}", **common,
            )(h)
            h = nn.silu(h)
        return nn.Conv(
            self.out_channels, (3, 3), name="conv_out",
            kernel_init=nn.initializers.zeros, **common,
        )(h)


class ControlNetModel(nn.Module):
    """UNet encoder + cond embedder + zero convs -> (down_residuals, mid)."""

    config: UNet2DConfig  # matches the base UNet's encoder config
    kv_block: int = 1024
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # (B, h, w, 4) latent
        timesteps: jax.Array,
        encoder_hidden_states: jax.Array,
        controlnet_cond: jax.Array,  # (B, H, W, 3) conditioning image
        conditioning_scale: float = 1.0,
    ):
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        context = encoder_hidden_states.astype(self.dtype)

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = timestep_embedding(
            timesteps,
            cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            freq_shift=cfg.freq_shift,
        )
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, name="time_embedding", **common
        )(t_emb)

        def resnet(ch, name):
            return ResnetBlock2D(
                out_channels=ch, eps=cfg.norm_eps, name=name, **common
            )

        def attn(level, name):
            return Transformer2DModel(
                channels=cfg.block_out_channels[level],
                heads=cfg.num_heads[level],
                dim_head=cfg.head_dim(level),
                use_linear_projection=cfg.use_linear_projection,
                kv_block=self.kv_block,
                name=name,
                **common,
            )

        h = nn.Conv(
            cfg.block_out_channels[0], (3, 3), name="conv_in", **common
        )(sample.astype(self.dtype))
        factor = controlnet_cond.shape[1] // sample.shape[1]
        num_down = max(int(np.log2(factor)), 0) if factor >= 1 else 0
        h = h + ControlNetCondEmbedding(
            out_channels=cfg.block_out_channels[0],
            num_downsamples=num_down,
            name="cond_embedding",
            **common,
        )(controlnet_cond)

        skips = [h]
        n_levels = len(cfg.block_out_channels)
        for i in range(n_levels):
            for j in range(cfg.layers_per_block):
                h = resnet(cfg.block_out_channels[i], f"down_{i}_res_{j}")(
                    h, temb
                )
                if cfg.attn_down[i]:
                    h, _ = attn(i, f"down_{i}_attn_{j}")(h, context, None)
                skips.append(h)
            if i < n_levels - 1:
                h = Downsample2D(
                    cfg.block_out_channels[i], name=f"down_{i}_downsample",
                    **common,
                )(h)
                skips.append(h)

        h = resnet(cfg.block_out_channels[-1], "mid_res_0")(h, temb)
        h, _ = attn(n_levels - 1, "mid_attn")(h, context, None)
        h = resnet(cfg.block_out_channels[-1], "mid_res_1")(h, temb)

        zero = nn.initializers.zeros
        down_res = tuple(
            nn.Conv(
                s.shape[-1], (1, 1), name=f"controlnet_down_{i}",
                kernel_init=zero, **common,
            )(s)
            * conditioning_scale
            for i, s in enumerate(skips)
        )
        mid_res = (
            nn.Conv(
                h.shape[-1], (1, 1), name="controlnet_mid",
                kernel_init=zero, **common,
            )(h)
            * conditioning_scale
        )
        return down_res, mid_res
