"""Shared Flax building blocks for the SD UNet / VAE (NHWC, TPU-first).

These re-implement the architectural contracts of the diffusers modules the
reference depends on (SURVEY.md §2.8) from their published semantics — not a
code port. Conventions:

  - images/latents are NHWC (XLA:TPU's preferred conv layout); the pipeline
    converts at the host boundary;
  - ``dtype`` is the activation/compute dtype (bf16 on TPU), ``param_dtype``
    the parameter storage dtype; attention logits and normalizations
    accumulate in fp32;
  - editing surgery (extended attention / NN propagation / PnP injection) is
    driven by explicit :mod:`tokenflow_tpu.ops.editctx` directives threaded
    through ``__call__`` — the functional replacement for the reference's
    monkey-patched forwards (tokenflow_utils.py:49-294).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tokenflow_tpu.ops import editctx
from tokenflow_tpu.ops.attention import flash_attention, merge_heads, split_heads
from tokenflow_tpu.ops.extended_attention import (
    extended_attention,
    inject_source_qk,
)
from tokenflow_tpu.ops.propagation import token_propagation


def norm_dtype():
    """Normalization compute dtype. fp32 by default for stability; set
    TOKENFLOW_NORM_DTYPE=bf16 to run GroupNorm/LayerNorm in bf16 (the
    reference's fp16 autocast runs its norms in half precision, so this is
    a parity-safe perf knob; resolved at trace time)."""
    import os

    return (
        jnp.bfloat16
        if os.environ.get("TOKENFLOW_NORM_DTYPE", "f32") == "bf16"
        else jnp.float32
    )


class FusedGroupNorm(nn.Module):
    """GroupNorm with optional fused SiLU and a Pallas fast path.

    Param layout ("scale"/"bias", shape (C,)) is identical to
    flax.linen.GroupNorm so checkpoints and the HF weight converter are
    unaffected. With the explicit opt-in (ops.attention.use_pallas_gn,
    knob TOKENFLOW_PALLAS_GN=1, vetoed by TOKENFLOW_PALLAS=0 under a
    mesh) eligible sites run the layout-matched Pallas
    kernels (kernels/group_norm.py) — stats + apply at HBM-bandwidth
    speed-of-light with bitcast (not copy) transposes into the convs'
    physical layouts; XLA's native lowering measured ~30% of the
    edit-step device time (scripts/tpu_profile_step.py). Stats are fp32
    on both paths (TOKENFLOW_NORM_DTYPE only affects the jnp fallback,
    matching the previous nn.GroupNorm behavior).
    """

    groups: int = 32
    eps: float = 1e-5
    act: Optional[str] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from tokenflow_tpu.kernels import group_norm as gn
        from tokenflow_tpu.ops.attention import use_pallas_gn

        c = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones, (c,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (c,), self.param_dtype
        )
        # EXPLICIT opt-in (not auto like flash/match): measured in the
        # full edit scan the kernel is net-neutral-to-negative (PERF.md
        # round-2 GroupNorm study) because XLA already fuses the GN apply
        # into the consuming conv; the kernel remains available for
        # contexts with different fusion structure. The master
        # TOKENFLOW_PALLAS=0 switch vetoes (no SPMD rule -> replicated
        # compute under a mesh; see ops.attention.use_pallas_gn).
        if use_pallas_gn() and gn.fits_vmem(
            x.shape, x.dtype.itemsize
        ):
            y = gn.group_norm_nhwc(
                x, scale, bias, groups=self.groups, eps=self.eps,
                act=self.act,
            )
        else:
            # bit-identical to the pre-FusedGroupNorm nn.GroupNorm path
            # (a reformulated jnp mirror drifts ~1ulp, which flips NN-match
            # argmax indices in the chaotic tiny-stack parity tests)
            y = nn.GroupNorm(
                num_groups=self.groups, epsilon=self.eps,
                dtype=norm_dtype(), param_dtype=self.param_dtype,
                parent=None,
            ).apply({"params": {"scale": scale, "bias": bias}}, x)
            if self.act == "silu":
                y = nn.silu(y)
        return y.astype(self.dtype)


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding
    semantics; SD uses flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], -1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """t_emb -> Linear -> silu -> Linear (time_embedding of the SD UNet)."""

    embed_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jax.Array) -> jax.Array:
        h = nn.Dense(
            self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear_1",
        )(t_emb.astype(self.dtype))
        h = nn.silu(h)
        return nn.Dense(
            self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear_2",
        )(h)


class Attention(nn.Module):
    """Multi-head attention with separate projection/compute entry points so
    editing code can run surgery between projection and softmax."""

    heads: int
    dim_head: int
    out_dim: Optional[int] = None  # defaults to heads * dim_head
    kv_block: int = 1024
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        inner = self.heads * self.dim_head
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.to_q = nn.Dense(inner, use_bias=False, name="to_q", **common)
        self.to_k = nn.Dense(inner, use_bias=False, name="to_k", **common)
        self.to_v = nn.Dense(inner, use_bias=False, name="to_v", **common)
        self.to_out = nn.Dense(
            self.out_dim or inner, use_bias=True, name="to_out", **common
        )

    def qkv(self, x, context=None):
        context = x if context is None else context
        return self.to_q(x), self.to_k(context), self.to_v(context)

    def out(self, attn_out):
        return self.to_out(attn_out)

    def __call__(self, x, context=None):
        q, k, v = self.qkv(x, context)
        o = flash_attention(
            split_heads(q, self.heads),
            split_heads(k, self.heads),
            split_heads(v, self.heads),
            kv_block=self.kv_block,
        )
        return self.to_out(merge_heads(o))


class GEGLUFeedForward(nn.Module):
    """Dense(8d) -> split -> x * gelu(gate) -> Dense(d) (diffusers GEGLU FF)."""

    dim: int
    mult: int = 4
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.Dense(inner * 2, name="proj_in", **common)(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, name="proj_out", **common)(h)


class BasicTransformerBlock(nn.Module):
    """Self-attn + cross-attn + GEGLU FF with TokenFlow edit modes.

    Edit modes (cf. reference TokenFlowBlock, tokenflow_utils.py:296-429):
      NONE      -> standard self-attention.
      PIVOTAL   -> keyframe extended attention (+ optional PnP q/k
                   injection); returns the cache {pivot_h, kf_attn}.
      PROPAGATE -> self-attention replaced by NN-gather from the cache.
    """

    dim: int
    heads: int
    dim_head: int
    kv_block: int = 1024
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln = dict(epsilon=1e-5, dtype=norm_dtype(), param_dtype=self.param_dtype)
        self.norm1 = nn.LayerNorm(name="norm1", **ln)
        self.attn1 = Attention(
            heads=self.heads, dim_head=self.dim_head, out_dim=self.dim,
            kv_block=self.kv_block, name="attn1", **common,
        )
        self.norm2 = nn.LayerNorm(name="norm2", **ln)
        self.attn2 = Attention(
            heads=self.heads, dim_head=self.dim_head, out_dim=self.dim,
            kv_block=self.kv_block, name="attn2", **common,
        )
        self.norm3 = nn.LayerNorm(name="norm3", **ln)
        self.ff = GEGLUFeedForward(dim=self.dim, name="ff", **common)

    def __call__(
        self,
        x: jax.Array,
        context: jax.Array,
        edit: Optional[editctx.BlockEdit] = None,
    ):
        b, s, dim = x.shape
        cache_out = None
        h_norm = self.norm1(x).astype(self.dtype)

        mode = editctx.EditMode.NONE if edit is None else edit.mode
        if mode == editctx.EditMode.NONE:
            attn_out = self.attn1(h_norm)
        elif mode == editctx.EditMode.PIVOTAL:
            # batch is FRAME-MAJOR: item i = (frame i//3, stream i%3).
            # A stream-major (3, kf) view of a frame-sharded batch axis is
            # not an expressible HLO sharding, so GSPMD would all-gather
            # the full hidden states at every edit site (measured,
            # scripts/inspect_sharded_hlo.py); the frame-major layout
            # factors cleanly over the frames mesh.
            # ns=3 exact ([source|uncond|cond]); ns=2 for the source-free
            # SDEdit approximate pivotal pass ([uncond|cond], see
            # editctx.UNetEdit.for_site src_free_piv)
            kf, ns = edit.n_frames, edit.n_streams
            q, k, v = self.attn1.qkv(h_norm)
            q3, k3, v3 = (
                p.reshape(kf, ns, s, -1).transpose(1, 0, 2, 3)
                for p in (q, k, v)
            )
            if edit.qk_inject_site:
                q3, k3 = inject_source_qk(q3, k3, edit.qk_gate)
            o3 = extended_attention(
                q3, k3, v3, heads=self.heads, kv_block=self.kv_block
            )
            attn_out = self.attn1.out(
                o3.transpose(1, 0, 2, 3).reshape(b, s, -1)
            )
            cache_out = {
                # stream-0 normed states drive the NN matching: the
                # source stream (reference pivot_hidden_states[0],
                # tokenflow_utils.py:335-336), or uncond when source-free
                "pivot_h": h_norm.reshape(kf, ns, s, dim)[:, 0],
                "kf_attn": attn_out.reshape(kf, ns, s, dim).transpose(
                    1, 0, 2, 3
                ),
            }
            if edit.cache_uncond:
                # matching table of the approximate (source-free)
                # propagation pass — see editctx.UNetEdit.prop_approx
                cache_out["pivot_h_uncond"] = h_norm.reshape(
                    kf, ns, s, dim
                )[:, 1]
        elif mode == editctx.EditMode.PROPAGATE:
            f, ns = edit.n_frames, edit.n_streams
            # stream 0 of the batch drives the matching: the source
            # stream in the exact 3-stream layout, the uncond stream in
            # the approximate 2-stream layout (matched against the
            # pivot_h_uncond table editctx.for_site routed in)
            o3 = token_propagation(
                h_norm.reshape(f, ns, s, dim)[:, 0],
                edit.pivot_h,
                edit.kf_attn,
                edit.prop_pa,
                edit.prop_pb,
                edit.prop_w1,
            )
            attn_out = (
                o3.transpose(1, 0, 2, 3).reshape(b, s, dim)
            ).astype(self.dtype)
        elif mode == editctx.EditMode.FUSED:
            # batch = [3*kf pivots | 3*f frames], each segment frame-major;
            # pivots run extended attention producing this site's cache,
            # frames propagate from it — one batch, same math as two-pass
            kf, f = edit.n_pivots, edit.n_frames
            h3 = h_norm.reshape(kf + f, 3, s, dim)
            hp = h3[:kf].transpose(1, 0, 2, 3)  # (3, kf, s, dim)
            hq = h3[kf:]  # (f, 3, s, dim)
            q, k, v = self.attn1.qkv(hp.reshape(3 * kf, s, dim))
            q3, k3, v3 = (p.reshape(3, kf, s, -1) for p in (q, k, v))
            if edit.qk_inject_site:
                q3, k3 = inject_source_qk(q3, k3, edit.qk_gate)
            op = extended_attention(
                q3, k3, v3, heads=self.heads, kv_block=self.kv_block
            )
            kf_attn = self.attn1.out(op.reshape(3 * kf, s, -1)).reshape(
                3, kf, s, dim
            )
            oq = token_propagation(
                hq[:, 0], hp[0], kf_attn,
                edit.prop_pa, edit.prop_pb, edit.prop_w1,
            ).astype(self.dtype)
            attn_out = jnp.concatenate(
                [
                    kf_attn.transpose(1, 0, 2, 3).reshape(3 * kf, s, dim),
                    oq.transpose(1, 0, 2, 3).reshape(3 * f, s, dim),
                ],
                axis=0,
            )
        else:
            raise ValueError(f"unknown edit mode {mode!r}")

        x = x + attn_out
        x = x + self.attn2(self.norm2(x).astype(self.dtype), context)
        x = x + self.ff(self.norm3(x).astype(self.dtype))
        return x, cache_out


class Transformer2DModel(nn.Module):
    """GroupNorm -> proj_in -> BasicTransformerBlock -> proj_out + residual.

    ``use_linear_projection`` selects Linear (SD-2.x) vs 1x1-conv (SD-1.5)
    projections, matching the two UNet generations.
    """

    channels: int
    heads: int
    dim_head: int
    use_linear_projection: bool = True
    kv_block: int = 1024
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: jax.Array,
        edit: Optional[editctx.BlockEdit] = None,
    ):
        b, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        residual = x
        h = FusedGroupNorm(
            groups=32, eps=1e-6, dtype=self.dtype,
            param_dtype=self.param_dtype, name="norm",
        )(x)
        if self.use_linear_projection:
            h = h.reshape(b, hh * ww, c)
            h = nn.Dense(inner, name="proj_in", **common)(h)
        else:
            h = nn.Conv(inner, (1, 1), name="proj_in", **common)(h)
            h = h.reshape(b, hh * ww, inner)
        h, cache = BasicTransformerBlock(
            dim=inner, heads=self.heads, dim_head=self.dim_head,
            kv_block=self.kv_block, name="block", **common,
        )(h, context, edit)
        if self.use_linear_projection:
            h = nn.Dense(c, name="proj_out", **common)(h)
            h = h.reshape(b, hh, ww, c)
        else:
            h = h.reshape(b, hh, ww, inner)
            h = nn.Conv(c, (1, 1), name="proj_out", **common)(h)
        return h + residual, cache


class ResnetBlock2D(nn.Module):
    """GN-silu-conv ×2 with additive time embedding and optional PnP
    feature injection after conv2 (reference tokenflow_utils.py:86-91:
    uncond/cond hidden streams overwritten by the source stream; the
    shortcut path is NOT injected).

    With an edit directive the call returns ``(out, cache)`` — cache is
    ``{"conv_src": (K, h, w, c)}`` in approximate PIVOTAL mode (the pivot
    source conv2 features the source-free propagation pass blends in,
    editctx.ConvEdit) and None otherwise."""

    out_channels: int
    eps: float = 1e-5
    groups: int = 32
    use_temb: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        temb: Optional[jax.Array] = None,
        edit: Optional[editctx.ConvEdit] = None,
    ):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        gn = dict(
            groups=self.groups, eps=self.eps, act="silu",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        h = FusedGroupNorm(name="norm1", **gn)(x)
        h = nn.Conv(self.out_channels, (3, 3), name="conv1", **common)(h)
        if self.use_temb and temb is not None:
            t = nn.Dense(
                self.out_channels, name="time_emb_proj", **common
            )(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = FusedGroupNorm(name="norm2", **gn)(h)
        h = nn.Conv(self.out_channels, (3, 3), name="conv2", **common)(h)

        cache = None
        if edit is not None and edit.gate is not None:
            # frame-major batch: (f, ns, ...) view, stream axis is axis 1
            f, ns = edit.n_frames, edit.n_streams
            h3 = h.reshape(f, ns, *h.shape[1:])
            if edit.approx and edit.mode == editctx.EditMode.PROPAGATE:
                # source-free pass: inject the two-pivot distance blend of
                # the cached pivot source features (temporal approximation
                # of the exact per-frame source features)
                src = (
                    edit.prop_w1[:, None, None, None]
                    * edit.src_cache[edit.prop_pa].astype(jnp.float32)
                    + (1.0 - edit.prop_w1)[:, None, None, None]
                    * edit.src_cache[edit.prop_pb].astype(jnp.float32)
                ).astype(h3.dtype)
                src = jnp.broadcast_to(src[:, None], h3.shape)
            else:
                src = jnp.broadcast_to(h3[:, :1], h3.shape)
                if edit.approx and edit.mode == editctx.EditMode.PIVOTAL:
                    cache = {"conv_src": h3[:, 0]}
            h = jnp.where(edit.gate, src, h3).reshape(h.shape)

        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), name="conv_shortcut", **common
            )(x)
        out = x + h
        return out if edit is None else (out, cache)


class Downsample2D(nn.Module):
    """3x3 stride-2 conv. ``asymmetric_pad`` matches the VAE encoder's
    pad-(0,1,0,1) convention; the UNet uses symmetric SAME-style padding."""

    channels: int
    asymmetric_pad: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = ((0, 1), (0, 1)) if self.asymmetric_pad else ((1, 1), (1, 1))
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=pad,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)


class Upsample2D(nn.Module):
    """Nearest x2 upsample + 3x3 conv."""

    channels: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(
            self.channels, (3, 3), dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv",
        )(x)
