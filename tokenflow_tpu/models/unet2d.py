"""Flax SD UNet (conditional, 2D) — TPU-native re-implementation.

Covers the architectural contract of the diffusers ``UNet2DConditionModel``
checkpoints the reference loads (SURVEY.md §2.8): SD-1.5 / 2.0-base /
2.1-base / 2-depth, including ControlNet residual inputs
(reference preprocess.py:129-149) and the 5-channel depth variant
(reference preprocess.py:207-209).

Differences from a port: NHWC layout, fp32-normalization/bf16-matmul dtype
policy, lazy channel inference (no torch-style channel bookkeeping), and the
explicit edit-context threading replacing all attribute hooks. The editing
cache returned in PIVOTAL mode / consumed in PROPAGATE mode is a flat
``{site: {"pivot_h", "kf_attn"}}`` pytree — the functional equivalent of the
reference's hook-cached tensors (tokenflow_utils.py:327,360).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tokenflow_tpu.models.layers import (
    Downsample2D,
    FusedGroupNorm,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2DModel,
    Upsample2D,
    timestep_embedding,
)
from tokenflow_tpu.ops import editctx


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    # per-resolution head counts (diffusers' historically-misnamed
    # ``attention_head_dim``): SD-2.x (5,10,20,20) -> d_head 64;
    # SD-1.5 (8,8,8,8) -> d_head = channels/8.
    num_heads: Sequence[int] = (5, 10, 20, 20)
    use_linear_projection: bool = True
    norm_eps: float = 1e-5
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    # which blocks carry cross-attn transformers (SD: all but the last down
    # block / first up block)
    attn_down: Sequence[bool] = (True, True, True, False)
    attn_up: Sequence[bool] = (False, True, True, True)

    @staticmethod
    def sd21_base() -> "UNet2DConfig":
        return UNet2DConfig()

    @staticmethod
    def sd21_depth() -> "UNet2DConfig":
        # stabilityai/stable-diffusion-2-depth: 5 input channels
        # (4 latent + 1 depth map), otherwise SD-2.1.
        return UNet2DConfig(in_channels=5)

    @staticmethod
    def sd15() -> "UNet2DConfig":
        return UNet2DConfig(
            cross_attention_dim=768,
            num_heads=(8, 8, 8, 8),
            use_linear_projection=False,
        )

    @staticmethod
    def tiny(cross_attention_dim: int = 32) -> "UNet2DConfig":
        """Small config for tests: same topology, 2 resolutions."""
        return UNet2DConfig(
            block_out_channels=(32, 64),
            layers_per_block=1,
            cross_attention_dim=cross_attention_dim,
            num_heads=(2, 4),
            attn_down=(True, False),
            attn_up=(False, True),
        )

    def head_dim(self, level: int) -> int:
        return self.block_out_channels[level] // self.num_heads[level]


class UNet2DConditionModel(nn.Module):
    config: UNet2DConfig
    kv_block: int = 1024
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # (B, H, W, C_in) NHWC
        timesteps: jax.Array,  # scalar or (B,)
        encoder_hidden_states: jax.Array,  # (B, 77, cross_dim)
        edit: Optional[editctx.UNetEdit] = None,
        down_block_residuals: Optional[Sequence[jax.Array]] = None,
        mid_block_residual: Optional[jax.Array] = None,
    ):
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        edit = edit or editctx.UNetEdit()
        context = encoder_hidden_states.astype(self.dtype)
        cache: dict[str, dict[str, jax.Array]] = {}

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
        skips = [h]

        # ---- down
        n_levels = len(cfg.block_out_channels)
        for i in range(n_levels):
            for j in range(cfg.layers_per_block):
                h = resnet(cfg.block_out_channels[i], f"down_{i}_res_{j}")(
                    h, temb
                )
                if cfg.attn_down[i]:
                    site = f"down_{i}_{j}"
                    h, c = attn(i, f"down_{i}_attn_{j}")(
                        h, context, edit.for_site(site)
                    )
                    if c is not None:
                        cache[site] = c
                skips.append(h)
            if i < n_levels - 1:
                h = Downsample2D(
                    cfg.block_out_channels[i], name=f"down_{i}_downsample",
                    **common,
                )(h)
                skips.append(h)

        if down_block_residuals is not None:
            skips = [s + r for s, r in zip(skips, down_block_residuals)]

        # ---- mid
        h = resnet(cfg.block_out_channels[-1], "mid_res_0")(h, temb)
        h, c = attn(n_levels - 1, "mid_attn")(
            h, context, edit.for_site("mid")
        )
        if c is not None:
            cache["mid"] = c
        h = resnet(cfg.block_out_channels[-1], "mid_res_1")(h, temb)
        if mid_block_residual is not None:
            h = h + mid_block_residual

        # ---- up
        rev = list(reversed(cfg.block_out_channels))
        for i in range(n_levels):
            level = n_levels - 1 - i  # resolution level for heads/channels
            for j in range(cfg.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                conv_site = f"up_{i}_res_{j}"
                conv_edit = edit.for_conv(conv_site)
                if conv_edit is None:
                    h = resnet(rev[i], conv_site)(h, temb)
                else:
                    h, c = resnet(rev[i], conv_site)(h, temb, conv_edit)
                    if c is not None:
                        cache[conv_site] = c
                if cfg.attn_up[i]:
                    site = f"up_{i}_{j}"
                    h, c = attn(level, f"up_{i}_attn_{j}")(
                        h, context, edit.for_site(site)
                    )
                    if c is not None:
                        cache[site] = c
            if i < n_levels - 1:
                h = Upsample2D(rev[i], name=f"up_{i}_upsample", **common)(h)

        h = FusedGroupNorm(
            groups=32, eps=cfg.norm_eps, act="silu", dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv_norm_out",
        )(h)
        eps = nn.Conv(cfg.out_channels, (3, 3), name="conv_out", **common)(h)
        return eps, cache
