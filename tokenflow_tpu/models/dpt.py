"""Flax DPT (dense prediction transformer) depth estimator — MiDaS 3.0.

TPU-native replacement for the reference's torch.hub MiDaS DPT_Large
(reference preprocess.py:69-70,76-111 and run_tokenflow_pnp.py:70-105 load
``intel-isl/MiDaS`` ``DPT_Large`` and run it per frame on GPU). The same
weights are published as HF ``Intel/dpt-large``; this module implements the
model from scratch in Flax/NHWC so depth-conditioned editing
(sd_version='depth') runs end-to-end on TPU, and
``weights.convert_dpt_state_dict`` maps the HF torch checkpoint onto it.

Semantics follow the DPT paper as realized by the HF reference
implementation (transformers/models/dpt/modeling_dpt.py, v4.57):

  ViT backbone   patch conv (p x p, stride p) -> [CLS] + tokens + pos embed
                 (pos grid bilinearly resized when the input grid differs);
                 pre-LN blocks (LN -> MHSA -> +res; LN -> MLP(gelu) -> +res).
                 The neck consumes the raw block outputs at
                 ``backbone_out_indices`` — NOT the final-layernormed state
                 (modeling_dpt.py DPTForDepthEstimation.forward keeps
                 hidden_states[1:][idx], which are pre-layernorm).
  Reassemble     per tapped stage: drop CLS; tokens -> (h/p, w/p) map;
                 readout 'project' (concat CLS to every token, Linear+GELU);
                 1x1 conv to stage width; resize by factor {4,2,1,0.5}
                 (k=f stride=f transposed conv for f>1 — computed here as an
                 exact einsum pixel-shuffle, one MXU matmul per stage —
                 identity for f=1, 3x3 stride-2 conv for f=0.5).
  Fusion         3x3 no-bias conv to fusion width, then RefineNet-style
                 top-down: + preact residual units, bilinear x2 upsample
                 (align_corners=True), 1x1 projection.
  Head           3x3 conv (C->C/2) -> x2 bilinear (align_corners=True) ->
                 3x3 conv (->32) -> relu -> 1x1 conv (->1) -> relu.

Everything is NHWC; torch NCHW only appears in the weight converter.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 16
    image_size: int = 384  # pos-embed native grid (resized for other sizes)
    backbone_out_indices: Sequence[int] = (5, 11, 17, 23)
    neck_hidden_sizes: Sequence[int] = (256, 512, 1024, 1024)
    reassemble_factors: Sequence[float] = (4, 2, 1, 0.5)
    fusion_hidden_size: int = 256
    layer_norm_eps: float = 1e-12

    @staticmethod
    def dpt_large() -> "DPTConfig":
        """Intel/dpt-large == torch.hub intel-isl/MiDaS DPT_Large."""
        return DPTConfig()

    @staticmethod
    def tiny() -> "DPTConfig":
        """Small config for golden tests (matches a tiny HF DPTConfig)."""
        return DPTConfig(
            hidden_size=32,
            num_layers=4,
            num_heads=2,
            intermediate_size=64,
            patch_size=16,
            image_size=64,
            backbone_out_indices=(0, 1, 2, 3),
            neck_hidden_sizes=(8, 12, 16, 16),
            fusion_hidden_size=16,
        )


def resize_bilinear(
    x: jax.Array, out_hw: tuple[int, int], *, align_corners: bool
) -> jax.Array:
    """Bilinear resize of NHWC ``x`` matching torch.nn.functional.interpolate.

    align_corners=True maps output corners onto input corners
    (src = dst * (in-1)/(out-1)); align_corners=False uses half-pixel
    centers (src = (dst+0.5) * in/out - 0.5, clamped). jax.image.resize
    only implements the latter, and the DPT fusion/head upsamples need the
    former, so both are implemented here as separable gathers.
    """

    def axis_weights(n_in: int, n_out: int):
        if n_in == n_out:
            return None
        dst = jnp.arange(n_out, dtype=jnp.float32)
        if align_corners and n_out > 1:
            src = dst * (n_in - 1) / (n_out - 1)
        elif align_corners:
            src = jnp.zeros_like(dst)
        else:
            src = jnp.clip((dst + 0.5) * n_in / n_out - 0.5, 0.0, n_in - 1)
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.minimum(lo + 1, n_in - 1)
        w = (src - lo.astype(jnp.float32)).astype(x.dtype)
        return lo, hi, w

    out_h, out_w = out_hw
    hw = axis_weights(x.shape[1], out_h)
    if hw is not None:
        lo, hi, w = hw
        x = x[:, lo] * (1 - w)[None, :, None, None] + x[:, hi] * w[
            None, :, None, None
        ]
    ww = axis_weights(x.shape[2], out_w)
    if ww is not None:
        lo, hi, w = ww
        x = x[:, :, lo] * (1 - w)[None, None, :, None] + x[:, :, hi] * w[
            None, None, :, None
        ]
    return x


class ViTBlock(nn.Module):
    cfg: DPTConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln = dict(
            epsilon=cfg.layer_norm_eps,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
        )
        b, s, dim = x.shape
        h = nn.LayerNorm(name="norm1", **ln)(x).astype(self.dtype)
        q = nn.Dense(dim, name="q", **common)(h)
        k = nn.Dense(dim, name="k", **common)(h)
        v = nn.Dense(dim, name="v", **common)(h)
        d = dim // cfg.num_heads
        q, k, v = (
            p.reshape(b, s, cfg.num_heads, d) for p in (q, k, v)
        )
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (d**-0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        o = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        x = x + nn.Dense(dim, name="proj", **common)(o.reshape(b, s, dim))

        h = nn.LayerNorm(name="norm2", **ln)(x).astype(self.dtype)
        h = nn.Dense(cfg.intermediate_size, name="fc1", **common)(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(dim, name="fc2", **common)(h)


class Reassemble(nn.Module):
    """One tapped stage: readout-project, 1x1 channel proj, spatial resize."""

    cfg: DPTConfig
    stage: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, tokens: jax.Array, cls: jax.Array, grid_hw: tuple[int, int]
    ) -> jax.Array:
        cfg = self.cfg
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, s, dim = tokens.shape
        gh, gw = grid_hw
        # readout 'project': concat CLS to each token, Linear + GELU
        ro = jnp.concatenate(
            [tokens, jnp.broadcast_to(cls[:, None], tokens.shape)], axis=-1
        )
        h = nn.Dense(dim, name="readout", **common)(ro)
        h = nn.gelu(h, approximate=False)
        h = h.reshape(b, gh, gw, dim)
        ch = cfg.neck_hidden_sizes[self.stage]
        h = nn.Conv(ch, (1, 1), name="proj", **common)(h)
        f = cfg.reassemble_factors[self.stage]
        if f > 1:
            # k=f stride=f transposed conv == per-pixel matmul to an (f, f)
            # block (exact pixel-shuffle form; no overlap at stride==kernel)
            f = int(f)
            w = self.param(
                "resize_kernel",
                nn.initializers.lecun_normal(),
                (f, f, ch, ch),
                self.param_dtype,
            )
            bias = self.param(
                "resize_bias", nn.initializers.zeros, (ch,), self.param_dtype
            )
            h = jnp.einsum(
                "bijc,uvco->biujvo",
                h,
                w.astype(self.dtype),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
            h = h.reshape(b, gh * f, gw * f, ch) + bias.astype(self.dtype)
        elif f < 1:
            s2 = int(round(1 / f))
            h = nn.Conv(
                ch, (3, 3), strides=(s2, s2), padding=1, name="resize",
                **common,
            )(h)
        return h


class PreActResidual(nn.Module):
    cfg: DPTConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ch = self.cfg.fusion_hidden_size
        h = nn.Conv(ch, (3, 3), padding=1, name="conv1", **common)(
            nn.relu(x)
        )
        h = nn.Conv(ch, (3, 3), padding=1, name="conv2", **common)(
            nn.relu(h)
        )
        return x + h


class FusionLayer(nn.Module):
    cfg: DPTConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, residual: jax.Array | None) -> jax.Array:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if residual is not None:
            if residual.shape[1:3] != x.shape[1:3]:
                residual = resize_bilinear(
                    residual, x.shape[1:3], align_corners=False
                )
            x = x + PreActResidual(
                self.cfg, name="res1", **common
            )(residual)
        x = PreActResidual(self.cfg, name="res2", **common)(x)
        x = resize_bilinear(
            x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=True
        )
        return nn.Conv(
            self.cfg.fusion_hidden_size, (1, 1), name="proj", **common
        )(x)


class DPTDepthModel(nn.Module):
    """Full DPT depth estimator: (B, H, W, 3) normalized RGB -> (B, H, W)
    raw inverse-depth predictions (same output convention as MiDaS)."""

    config: DPTConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, img_h, img_w, _ = pixels.shape
        p = cfg.patch_size
        gh, gw = img_h // p, img_w // p

        # --- ViT embeddings
        h = nn.Conv(
            cfg.hidden_size, (p, p), strides=(p, p), name="patch_embed",
            **common,
        )(pixels.astype(self.dtype))
        h = h.reshape(b, gh * gw, cfg.hidden_size)
        cls_tok = self.param(
            "cls_token",
            nn.initializers.zeros,
            (1, 1, cfg.hidden_size),
            self.param_dtype,
        )
        native = cfg.image_size // p
        pos = self.param(
            "pos_embed",
            nn.initializers.zeros,
            (1, native * native + 1, cfg.hidden_size),
            self.param_dtype,
        )
        pos_cls, pos_grid = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (native, native):
            pos_grid = resize_bilinear(
                pos_grid.reshape(1, native, native, cfg.hidden_size),
                (gh, gw),
                align_corners=False,
            ).reshape(1, gh * gw, cfg.hidden_size)
        h = jnp.concatenate(
            [jnp.broadcast_to(cls_tok, (b, 1, cfg.hidden_size)), h], axis=1
        )
        h = h + jnp.concatenate([pos_cls, pos_grid], axis=1).astype(
            self.dtype
        )

        # --- transformer, tapping raw block outputs (pre final-layernorm)
        taps = {}
        want = set(cfg.backbone_out_indices)
        for i in range(cfg.num_layers):
            h = ViTBlock(cfg, name=f"block_{i}", **common)(h)
            if i in want:
                taps[i] = h

        # --- reassemble + neck convs
        feats = []
        for stage, idx in enumerate(cfg.backbone_out_indices):
            t = taps[idx]
            f = Reassemble(
                cfg, stage=stage, name=f"reassemble_{stage}", **common
            )(t[:, 1:], t[:, 0], (gh, gw))
            f = nn.Conv(
                cfg.fusion_hidden_size, (3, 3), padding=1, use_bias=False,
                name=f"neck_conv_{stage}", **common,
            )(f)
            feats.append(f)

        # --- top-down fusion (deepest first)
        fused = None
        for j, f in enumerate(reversed(feats)):
            if fused is None:
                fused = FusionLayer(cfg, name=f"fusion_{j}", **common)(
                    f, None
                )
            else:
                fused = FusionLayer(cfg, name=f"fusion_{j}", **common)(
                    fused, f
                )

        # --- head
        ch = cfg.fusion_hidden_size
        h = nn.Conv(ch // 2, (3, 3), padding=1, name="head_conv1", **common)(
            fused
        )
        h = resize_bilinear(
            h, (h.shape[1] * 2, h.shape[2] * 2), align_corners=True
        )
        h = nn.Conv(32, (3, 3), padding=1, name="head_conv2", **common)(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), name="head_conv3", **common)(h)
        h = nn.relu(h)
        return h[..., 0]
