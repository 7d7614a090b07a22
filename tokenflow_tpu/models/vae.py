"""Flax AutoencoderKL (SD VAE) — TPU-native re-implementation (NHWC).

Architectural contract of the diffusers ``AutoencoderKL`` checkpoints the
reference loads (SURVEY.md §2.8): encoder (posterior mean used
deterministically, reference preprocess.py:173-182), decoder, mid-block
single-head spatial attention, 0.18215 latent scaling applied at the
pipeline layer (as in the reference).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tokenflow_tpu.models.layers import (
    Downsample2D,
    FusedGroupNorm,
    ResnetBlock2D,
    Upsample2D,
)
from tokenflow_tpu.ops.attention import sdp_attention


@dataclasses.dataclass(frozen=True)
class AutoencoderKLConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    norm_eps: float = 1e-6
    scaling_factor: float = 0.18215

    @staticmethod
    def sd() -> "AutoencoderKLConfig":
        return AutoencoderKLConfig()

    @staticmethod
    def tiny() -> "AutoencoderKLConfig":
        return AutoencoderKLConfig(
            block_out_channels=(16, 32), layers_per_block=1, norm_groups=8
        )


class VAEAttention(nn.Module):
    """Single-head spatial self-attention of the VAE mid block."""

    channels: int
    eps: float = 1e-6
    groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = FusedGroupNorm(
            groups=self.groups, eps=self.eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name="group_norm",
        )(x)
        h = h.reshape(b, hh * ww, c)
        q = nn.Dense(c, name="to_q", **common)(h)
        k = nn.Dense(c, name="to_k", **common)(h)
        v = nn.Dense(c, name="to_v", **common)(h)
        o = sdp_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        o = nn.Dense(c, name="to_out", **common)(o)
        return x + o.reshape(b, hh, ww, c)


class Encoder(nn.Module):
    config: AutoencoderKLConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        def resnet(ch, name):
            return ResnetBlock2D(
                out_channels=ch, eps=cfg.norm_eps, groups=cfg.norm_groups,
                use_temb=False, name=name, **common,
            )

        h = nn.Conv(
            cfg.block_out_channels[0], (3, 3), name="conv_in", **common
        )(x.astype(self.dtype))
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = resnet(ch, f"down_{i}_res_{j}")(h)
            if i < n - 1:
                # VAE encoder downsample uses asymmetric (0,1) padding.
                h = Downsample2D(
                    ch, asymmetric_pad=True, name=f"down_{i}_downsample",
                    **common,
                )(h)
        ch = cfg.block_out_channels[-1]
        h = resnet(ch, "mid_res_0")(h)
        h = VAEAttention(
            channels=ch, eps=cfg.norm_eps, groups=cfg.norm_groups,
            name="mid_attn", **common,
        )(h)
        h = resnet(ch, "mid_res_1")(h)
        h = FusedGroupNorm(
            groups=cfg.norm_groups, eps=cfg.norm_eps, act="silu",
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="conv_norm_out",
        )(h)
        return nn.Conv(
            2 * cfg.latent_channels, (3, 3), name="conv_out", **common
        )(h)


class Decoder(nn.Module):
    config: AutoencoderKLConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        def resnet(ch, name):
            return ResnetBlock2D(
                out_channels=ch, eps=cfg.norm_eps, groups=cfg.norm_groups,
                use_temb=False, name=name, **common,
            )

        rev = list(reversed(cfg.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), name="conv_in", **common)(
            z.astype(self.dtype)
        )
        h = resnet(rev[0], "mid_res_0")(h)
        h = VAEAttention(
            channels=rev[0], eps=cfg.norm_eps, groups=cfg.norm_groups,
            name="mid_attn", **common,
        )(h)
        h = resnet(rev[0], "mid_res_1")(h)
        n = len(rev)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = resnet(ch, f"up_{i}_res_{j}")(h)
            if i < n - 1:
                h = Upsample2D(ch, name=f"up_{i}_upsample", **common)(h)
        h = FusedGroupNorm(
            groups=cfg.norm_groups, eps=cfg.norm_eps, act="silu",
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="conv_norm_out",
        )(h)
        return nn.Conv(
            cfg.out_channels, (3, 3), name="conv_out", **common
        )(h)


class AutoencoderKL(nn.Module):
    config: AutoencoderKLConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = Encoder(self.config, name="encoder", **common)
        self.decoder = Decoder(self.config, name="decoder", **common)
        self.quant_conv = nn.Conv(
            2 * self.config.latent_channels, (1, 1), name="quant_conv",
            **common,
        )
        self.post_quant_conv = nn.Conv(
            self.config.latent_channels, (1, 1), name="post_quant_conv",
            **common,
        )

    def encode_moments(self, x):
        """(B,H,W,3) image in [-1,1] -> (mean, logvar), each (B,h,w,4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, rng=None):
        """Posterior mean (deterministic, the reference's default —
        preprocess.py:179) or a sample when ``rng`` is given."""
        mean, logvar = self.encode_moments(x)
        if rng is None:
            return mean
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None):
        z = self.encode(x, rng)
        return self.decode(z)
