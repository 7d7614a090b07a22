"""Split token-match kernels for large-S sites (768p: S=9216, D=320).

The fused kernel (kernels/token_match.py) holds both pivots' full
(S, D) tables in VMEM; at 768p they no longer fit profitably. Split into:

  1. match kernel — z-blocked running argmax over pivot tokens: grid
     (F, n_q, n_z) with per-q-block (max, idx) scratch carried across the
     innermost z axis; emits int32 indices shaped (F, 1, S) (full-axis
     blocks are always tile-legal, and per-frame indices are tiny).
  2. gather kernel — one-hot @ kf-table matmuls for all 3 streams: grid
     (F, n_q); the kf tables are DMA'd once per frame (the fused kernel's
     failure mode at this size was per-step table re-DMA).

Same contract as ops.propagation.token_propagation; dispatched for sites
where the fused kernel's profitability cap rejects (ops/propagation.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def split_fits_vmem(
    s: int, d: int, budget: int = 100 << 20, ns: int = 3
) -> bool:
    """VMEM gate for the gather stage (the tighter of the two kernels):
    both pivots' (ns, S, D) bf16 kf tables double-buffered, plus the
    per-frame int32 index rows. Sites where this fails (e.g. 1024p-class
    latents, S=16384/D=320 -> ~126MB resident tables) must use the jnp
    match/gather instead — a VMEM overrun inside the edit scan can crash
    the TPU worker rather than raise (repo environment notes)."""
    return 2 * 2 * (ns * s * d * 2) + 2 * 256 * s * 2 < budget


def _match_kernel(
    pa_ref, pb_ref,  # scalar-prefetch (F,) int32
    x_ref,  # (1, BQ, D)
    pha_ref,  # (1, BZ, D) pivot-a token block
    phb_ref,  # (1, BZ, D)
    ia_ref,  # out (1, 1, BQ) int32
    ib_ref,
    m1_ref,  # scratch (BQ, 1) f32
    m2_ref,
    i1_ref,  # scratch (BQ, 1) i32
    i2_ref,
):
    jz = pl.program_id(2)
    n_z = pl.num_programs(2)

    @pl.when(jz == 0)
    def _init():
        m1_ref[:] = jnp.full_like(m1_ref, NEG_INF)
        m2_ref[:] = jnp.full_like(m2_ref, NEG_INF)
        i1_ref[:] = jnp.zeros_like(i1_ref)
        i2_ref[:] = jnp.zeros_like(i2_ref)

    x = x_ref[0]  # (BQ, D)
    bz = pha_ref.shape[1]

    def update(ph_ref, m_ref, i_ref):
        sim = jax.lax.dot_general(
            x, ph_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BZ)
        blk_max = sim.max(axis=-1, keepdims=True)
        blk_idx = jnp.argmax(sim, axis=-1)[:, None].astype(jnp.int32)
        better = blk_max > m_ref[:]
        m_ref[:] = jnp.where(better, blk_max, m_ref[:])
        i_ref[:] = jnp.where(better, blk_idx + jz * bz, i_ref[:])

    update(pha_ref, m1_ref, i1_ref)
    update(phb_ref, m2_ref, i2_ref)

    @pl.when(jz == n_z - 1)
    def _emit():
        ia_ref[0, 0] = i1_ref[:, 0]
        ib_ref[0, 0] = i2_ref[:, 0]


def _gather_kernel(
    pa_ref, pb_ref, w1_ref,  # scalar-prefetch
    ia_ref,  # (1, 1, S) int32 — whole frame's indices
    ib_ref,
    kfa_ref,  # (3, 1, S, D)
    kfb_ref,
    out_ref,  # (3, 1, BQ, D)
):
    f = pl.program_id(0)
    iq = pl.program_id(1)
    s = kfa_ref.shape[2]
    bq = out_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, s), 1)
    i1 = ia_ref[0, 0, pl.ds(iq * bq, bq)][:, None]
    i2 = ib_ref[0, 0, pl.ds(iq * bq, bq)][:, None]
    oh1 = (col == i1).astype(out_ref.dtype)
    oh2 = (col == i2).astype(out_ref.dtype)
    w = w1_ref[f]
    for c in range(out_ref.shape[0]):
        g1 = jax.lax.dot_general(
            oh1, kfa_ref[c, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g2 = jax.lax.dot_general(
            oh2, kfb_ref[c, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[c, 0] = (w * g1 + (1.0 - w) * g2).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bq_match", "bz", "bq_gather", "interpret")
)
def token_match_gather_split(
    norm_h_src: jax.Array,  # (F, S, D)
    p_hat: jax.Array,  # (K, S, D)
    kf_attn: jax.Array,  # (3, K, S, D)
    pa: jax.Array,  # (F,)
    pb: jax.Array,
    w1: jax.Array,
    *,
    bq_match: int = 1024,
    bz: int = 1024,
    bq_gather: int = 256,
    interpret: bool = False,
) -> jax.Array:
    f_total, s, d = norm_h_src.shape
    ns = kf_attn.shape[0]
    dtype = kf_attn.dtype
    bq_match = min(bq_match, s)
    bz = min(bz, s)
    bq_gather = min(bq_gather, s)
    assert s % bq_match == 0 and s % bz == 0 and s % bq_gather == 0

    pa = pa.astype(jnp.int32)
    pb = pb.astype(jnp.int32)

    # ---- stage 1: indices
    match_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(f_total, s // bq_match, s // bz),
        in_specs=[
            pl.BlockSpec(
                (1, bq_match, d),
                lambda f, iq, jz, pa_ref, pb_ref: (f, iq, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bz, d),
                lambda f, iq, jz, pa_ref, pb_ref: (pa_ref[f], jz, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bz, d),
                lambda f, iq, jz, pa_ref, pb_ref: (pb_ref[f], jz, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, bq_match),
                lambda f, iq, jz, pa_ref, pb_ref: (f, 0, iq),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bq_match),
                lambda f, iq, jz, pa_ref, pb_ref: (f, 0, iq),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq_match, 1), jnp.float32),
            pltpu.VMEM((bq_match, 1), jnp.float32),
            pltpu.VMEM((bq_match, 1), jnp.int32),
            pltpu.VMEM((bq_match, 1), jnp.int32),
        ],
    )
    idx_shape = jax.ShapeDtypeStruct((f_total, 1, s), jnp.int32)
    ia, ib = pl.pallas_call(
        _match_kernel,
        grid_spec=match_spec,
        out_shape=[idx_shape, idx_shape],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(pa, pb, norm_h_src, p_hat, p_hat)

    # ---- stage 2: gathers
    gather_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(f_total, s // bq_gather),
        in_specs=[
            pl.BlockSpec(
                (1, 1, s),
                lambda f, iq, pa_ref, pb_ref, w1_ref: (f, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s),
                lambda f, iq, pa_ref, pb_ref, w1_ref: (f, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ns, 1, s, d),
                lambda f, iq, pa_ref, pb_ref, w1_ref: (0, pa_ref[f], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ns, 1, s, d),
                lambda f, iq, pa_ref, pb_ref, w1_ref: (0, pb_ref[f], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (ns, 1, bq_gather, d),
            lambda f, iq, pa_ref, pb_ref, w1_ref: (0, f, iq, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=gather_spec,
        out_shape=jax.ShapeDtypeStruct((ns, f_total, s, d), dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(pa, pb, w1.astype(jnp.float32), ia, ib, kf_attn, kf_attn)
    return out
