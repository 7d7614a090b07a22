"""Pallas TPU fused GroupNorm (+SiLU), layout-matched to XLA:TPU convs.

Profiling the compiled edit step (scripts/tpu_profile_step.py, round 2)
showed norm statistics ("convert_reduce" fusions) at ~30% of device time —
more than convs (19%) or attention (9%): XLA lowers each GroupNorm to a
stats pass + an apply pass and, at the conv-adjacent sites, materializes a
full layout-converting copy of the activation alongside the stats.

A first whole-block (B, S, C) kernel computed the op at speed-of-light
(0.36 ms/call measured) but was a net LOSS in the step (+4%): XLA:TPU
stores these activations with the batch dimension in lanes
(layout {0,3,2,1} at the 64² sites) or batch-in-sublanes ({3,0,2,1} at
32²/16²), and forcing the Pallas default layout inserted relayout copies
around every call (+404 ms/step of transpose fusions, measured).

This version is layout-matched: the wrapper TRANSPOSES LOGICALLY so that
the default (row-major) layout of the kernel operand coincides with the
conv's physical layout — the transpose lowers to a bitcast, not a copy:

  - "bl" (batch-in-lanes, the 64²-spatial sites):
        (B,H,W,C) -> transpose(1,2,3,0) -> (S, C, B); physical minor
        order B, C, W, H on both sides.
  - "cl" (channels-in-lanes, the smaller-spatial sites):
        (B,H,W,C) -> transpose(1,2,0,3) -> (S, B, C).

Stats and apply are separate pallas_calls (3 HBM passes total — the
bandwidth optimum for an op whose reduction spans the whole spatial
extent): `stats` streams S-chunks accumulating per-(channel, batch)
sums/sumsq in a VMEM-resident output block and finalizes the per-channel
affine (a, b) = (inv*scale, bias - mean*inv*scale); `apply` streams
x*a + b (+ optional SiLU). Group reduce/broadcast over channels ride the
MXU via a (C, G) one-hot matrix — no lane/sublane reshapes.

Semantics match flax.linen.GroupNorm over NHWC (fp32 stats,
var = E[x^2] - E[x]^2) + optional nn.silu, as used by every norm site in
the SD UNet/VAE (models/layers.py::FusedGroupNorm).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# target bytes for one streamed (s_chunk, ·, ·) block
_BLOCK_BUDGET_BYTES = 6 * 1024 * 1024
# dispatch cap: per-site total VMEM (in/out blocks double-buffered + f32
# temps) must stay well under the 100MB limit; pixel-res VAE tensors with
# tiny S-divisors fall back to jnp.
_MIN_CHUNK = 8


def group_norm_ref(
    x: jax.Array,  # (B, S, C)
    scale: jax.Array,  # (C,)
    bias: jax.Array,  # (C,)
    *,
    groups: int,
    eps: float,
    act: str | None = None,
) -> jax.Array:
    """jnp reference (flax GroupNorm semantics, fp32 stats)."""
    b, s, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, s, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = (xf * xf).mean(axis=(1, 3), keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, s, c) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _onehot(c: int, groups: int) -> np.ndarray:
    """(C, G) one-hot group-membership matrix (group reduce = matmul)."""
    return np.kron(
        np.eye(groups, dtype=np.float32),
        np.ones((c // groups, 1), np.float32),
    )


def _stats_kernel(
    x_ref, scale_ref, bias_ref, onehot_ref, ab_ref, *, eps, n, c_axis
):
    """Accumulate sums/sumsq over S-chunks into ab_ref ((2, ·, ·), VMEM-
    resident across the grid), finalize the affine on the last step.

    c_axis: which minor axis of the 2D block is channels — 0 for "bl"
    blocks (C, B), 1 for "cl" blocks (B, C).
    """
    j = pl.program_id(0)
    n_s = pl.num_programs(0)

    @pl.when(j == 0)
    def _init():
        ab_ref[:] = jnp.zeros_like(ab_ref)

    x = x_ref[:].astype(jnp.float32)  # (s_chunk, ·, ·)
    ab_ref[0] += jnp.sum(x, axis=0)
    ab_ref[1] += jnp.sum(x * x, axis=0)

    @pl.when(j == n_s - 1)
    def _finalize():
        onehot = onehot_ref[:]  # (C, G)
        sums, sumsq = ab_ref[0], ab_ref[1]
        if c_axis == 0:  # (C, B): group-combine via (G,C) @ (C,B)
            sums_g = jax.lax.dot(onehot.T, sums)  # (G, B)
            sumsq_g = jax.lax.dot(onehot.T, sumsq)
            mean_g = sums_g / n
            inv_g = jax.lax.rsqrt(sumsq_g / n - mean_g * mean_g + eps)
            mean = jax.lax.dot(onehot, mean_g)  # (C, B)
            inv = jax.lax.dot(onehot, inv_g)
            a = inv * scale_ref[:]  # (C, 1) broadcast over lanes
            b = bias_ref[:] - mean * a
        else:  # (B, C): (B,C) @ (C,G)
            sums_g = jax.lax.dot(sums, onehot)  # (B, G)
            sumsq_g = jax.lax.dot(sumsq, onehot)
            mean_g = sums_g / n
            inv_g = jax.lax.rsqrt(sumsq_g / n - mean_g * mean_g + eps)
            mean = jax.lax.dot(mean_g, onehot.T)  # (B, C)
            inv = jax.lax.dot(inv_g, onehot.T)
            a = inv * scale_ref[:]  # (1, C) broadcast over sublanes
            b = bias_ref[:] - mean * a
        ab_ref[0] = a
        ab_ref[1] = b


def _apply_kernel(x_ref, ab_ref, o_ref, *, act):
    x = x_ref[:].astype(jnp.float32)
    y = x * ab_ref[0] + ab_ref[1]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[:] = y.astype(o_ref.dtype)


def _padded_row_bytes(d1: int, d2: int, itemsize: int) -> int:
    """VMEM bytes of one (1, d1, d2) slice of a block: the lane dim (d2)
    pads to a multiple of 128 and the sublane dim (d1) to the dtype's min
    tile (16 for 2-byte types, 8 for 4-byte) — the first kernel version
    ignored this and OOM'd VMEM when the pivotal pass (batch 15) padded
    15 -> 128 lanes."""
    sub = 16 if itemsize == 2 else 8
    return (-(-d1 // sub) * sub) * (-(-d2 // 128) * 128) * itemsize


def _chunk(s: int, row_bytes: int) -> int:
    """Largest divisor of s whose (padded) block fits the budget."""
    cap = max(_MIN_CHUNK, _BLOCK_BUDGET_BYTES // max(row_bytes, 1))
    best = 1
    d = 1
    while d * d <= s:
        if s % d == 0:
            for cand in (d, s // d):
                if cand <= cap and cand > best:
                    best = cand
        d += 1
    return best


@functools.partial(
    jax.jit,
    static_argnames=("groups", "eps", "act", "layout", "interpret"),
)
def _group_norm_3d(
    xt: jax.Array,  # (S, C, B) for "bl", (S, B, C) for "cl"
    scale: jax.Array,  # (C,) fp32-able
    bias: jax.Array,
    *,
    groups: int,
    eps: float,
    act: str | None,
    layout: str,
    interpret: bool,
) -> jax.Array:
    s, d1, d2 = xt.shape
    c = d1 if layout == "bl" else d2
    b = d2 if layout == "bl" else d1
    c_axis = 0 if layout == "bl" else 1
    onehot = jnp.asarray(_onehot(c, groups))
    n = float(s * (c // groups))
    sc = scale.astype(jnp.float32).reshape(
        (c, 1) if layout == "bl" else (1, c)
    )
    bi = bias.astype(jnp.float32).reshape(
        (c, 1) if layout == "bl" else (1, c)
    )
    s_chunk = _chunk(s, _padded_row_bytes(d1, d2, xt.dtype.itemsize))

    grid = (s // s_chunk,)
    x_spec = pl.BlockSpec(
        (s_chunk, d1, d2), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    ab_spec = pl.BlockSpec(
        (2, d1, d2), lambda j: (0, 0, 0), memory_space=pltpu.VMEM
    )
    small = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=100 * 1024 * 1024,
    )
    ab = pl.pallas_call(
        functools.partial(_stats_kernel, eps=eps, n=n, c_axis=c_axis),
        grid=grid,
        in_specs=[x_spec, small(sc.shape), small(bi.shape),
                  small(onehot.shape)],
        out_specs=ab_spec,
        out_shape=jax.ShapeDtypeStruct((2, d1, d2), jnp.float32),
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            flops=3 * xt.size,
            bytes_accessed=xt.size * xt.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xt, sc, bi, onehot)
    out = pl.pallas_call(
        functools.partial(_apply_kernel, act=act),
        grid=grid,
        in_specs=[x_spec, ab_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(xt.shape, xt.dtype),
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            flops=3 * xt.size,
            bytes_accessed=2 * xt.size * xt.dtype.itemsize,
            transcendentals=xt.size if act else 0,
        ),
        interpret=interpret,
    )(xt, ab)
    return out


def group_norm_nhwc(
    x: jax.Array,  # (B, H, W, C) or (B, S, C)
    scale: jax.Array,
    bias: jax.Array,
    *,
    groups: int,
    eps: float,
    act: str | None = None,
    layout: str | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Layout-matched Pallas GroupNorm(+SiLU) over NHWC.

    layout: "bl" = batch-in-lanes operand form (matches XLA's choice at
    the large-spatial conv sites), "cl" = channels-in-lanes (the smaller
    sites), None = auto by spatial size (S >= 4096 -> "bl"), measured via
    scripts/tpu_profile_step.py round 2.
    """
    shape = x.shape
    b, c = shape[0], shape[-1]
    s = int(np.prod(shape[1:-1]))
    if layout is None:
        # XLA keeps the large-spatial conv activations batch-in-lanes when
        # the batch can fill lanes (propagation pass, B=120); the pivotal
        # pass (B=3*n_kf, e.g. 15) and smaller-spatial sites are
        # channel-minor (profiled layouts, scripts/tpu_profile_step.py)
        layout = "bl" if (s >= 4096 and b >= 96) else "cl"
    x3 = x.reshape(b, s, c)
    if layout == "bl":
        xt = x3.transpose(1, 2, 0)  # (S, C, B)
    else:
        xt = x3.transpose(1, 0, 2)  # (S, B, C)
    out = _group_norm_3d(
        xt, scale, bias, groups=groups, eps=eps, act=act, layout=layout,
        interpret=interpret,
    )
    if layout == "bl":
        x3 = out.transpose(2, 0, 1)
    else:
        x3 = out.transpose(1, 0, 2)
    return x3.reshape(shape)


def fits_vmem(shape, itemsize: int) -> bool:
    """Dispatch predicate: a streamed chunk plus the resident (2, ·, ·)
    fp32 affine block must fit comfortably; reject sites whose S has no
    reasonable divisor or whose per-row footprint is huge (pixel-res VAE
    tensors run the jnp path — they execute once per video, not per
    step)."""
    b, c = shape[0], shape[-1]
    s = int(np.prod(shape[1:-1]))
    layout = "bl" if (s >= 4096 and b >= 96) else "cl"
    d1, d2 = (c, b) if layout == "bl" else (b, c)
    row = _padded_row_bytes(d1, d2, itemsize)
    if row > _BLOCK_BUDGET_BYTES:
        return False
    if 2 * _padded_row_bytes(d1, d2, 4) > 8 * 1024 * 1024:  # affine block
        return False
    return _chunk(s, row) >= _MIN_CHUNK
