"""Pallas TPU fused token-match + gather kernel.

Fuses the NN propagation inner loop (ops/propagation.py): for each frame's
token block, cosine-similarity argmax against both pivot token tables and
the blended gather of keyframe attention outputs — WITHOUT materializing
the (F, S, S) similarity tensor in HBM (the jnp fallback's transient, and
the reference's actual materialized tensor, tokenflow_utils.py:335-343).

Design notes (guide: /opt/skills/guides/pallas_guide.md):
  - grid (F, Sq_blocks, 3 streams), stream innermost; the one-hot argmax
    masks are computed once at stream 0 and persist in VMEM scratch;
  - gathers are expressed as one-hot @ table matmuls — MXU-friendly and
    guaranteed to lower (no vector-gather dependence);
  - per-frame pivot tables are selected by scalar-prefetched (pa, pb)
    driving the BlockSpec index maps;
  - the similarity accumulates in fp32 on the MXU; inputs stay bf16.

VMEM bound: needs roughly 2*(S*D)*(bf16+bf16) for pivot+kf tables +
BQ*S fp32 sim + 2*BQ*S one-hot; callers fall back to the jnp path when
``fits_vmem`` says no (e.g. 768p seq=9216 until the z-blocked variant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    pa_ref, pb_ref, w1_ref,  # scalar-prefetch: (F,) int32, int32, float32
    x_ref,  # (1, BQ, D)
    phat_a_ref,  # (1, S, D)
    phat_b_ref,  # (1, S, D)
    kf_a_ref,  # (1, 1, S, D)
    kf_b_ref,  # (1, 1, S, D)
    out_ref,  # (1, 1, BQ, D)
    oh1_ref,  # scratch (BQ, S) input-dtype
    oh2_ref,
):
    f = pl.program_id(0)
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _match():
        x = x_ref[0]  # (BQ, D)
        bq, _ = x.shape
        s = phat_a_ref.shape[1]
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, s), 1)

        def onehot_argmax(phat):
            sim = jax.lax.dot_general(
                x, phat[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BQ, S)
            idx = jnp.argmax(sim, axis=-1)
            return (col == idx[:, None]).astype(x.dtype)

        oh1_ref[:] = onehot_argmax(phat_a_ref)
        oh2_ref[:] = onehot_argmax(phat_b_ref)

    g1 = jax.lax.dot_general(
        oh1_ref[:], kf_a_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    g2 = jax.lax.dot_general(
        oh2_ref[:], kf_b_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    w = w1_ref[f]
    out_ref[0, 0] = (w * g1 + (1.0 - w) * g2).astype(out_ref.dtype)


def fits_vmem(s: int, d: int, bq: int = 128, budget: int = 100 << 20) -> bool:
    """Dispatch predicate: VMEM feasibility AND profitability.

    VMEM model vs the raised vmem_limit_bytes below (v5e physical VMEM is
    128MB; the default scoped limit of 16MB rejects the 512p top site by
    268KB — observed on hardware). Input tables count double for pipeline
    double-buffering.

    Profitability: the kernel re-fetches the kf tables on every stream
    grid step, so DMA grows with table size; measured on v5e it wins up to
    the 512p top site (table 2.6MB) and loses at 768p (5.9MB) — hence the
    4MB table cap until the two-kernel (match/gather-split) variant lands.
    """
    table = s * d * 2  # one bf16 pivot/kf table
    if table > (4 << 20):
        return False
    tables = 2 * 4 * table  # phat_a/b + kf_a/b, double-buffered
    oh = 2 * bq * s * 2
    sim = bq * s * 4
    x_out = 2 * (2 * bq * d * 4)
    return tables + oh + sim + x_out < budget


@functools.partial(jax.jit, static_argnames=("bq", "interpret"))
def token_match_gather_pallas(
    norm_h_src: jax.Array,  # (F, S, D)
    p_hat: jax.Array,  # (K, S, D) pre-normalized pivot tokens
    kf_attn: jax.Array,  # (3, K, S, D)
    pa: jax.Array,  # (F,) int32
    pb: jax.Array,  # (F,) int32
    w1: jax.Array,  # (F,) float32
    *,
    bq: int = 128,
    interpret: bool = False,
) -> jax.Array:
    f_total, s, d = norm_h_src.shape
    bq = min(bq, s)
    assert s % bq == 0, (s, bq)
    n_q = s // bq
    dtype = kf_attn.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(f_total, n_q, 3),
        in_specs=[
            pl.BlockSpec(
                (1, bq, d),
                lambda f, iq, c, pa_ref, pb_ref, w1_ref: (f, iq, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s, d),
                lambda f, iq, c, pa_ref, pb_ref, w1_ref: (pa_ref[f], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s, d),
                lambda f, iq, c, pa_ref, pb_ref, w1_ref: (pb_ref[f], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s, d),
                lambda f, iq, c, pa_ref, pb_ref, w1_ref: (c, pa_ref[f], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s, d),
                lambda f, iq, c, pa_ref, pb_ref, w1_ref: (c, pb_ref[f], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, d),
            lambda f, iq, c, pa_ref, pb_ref, w1_ref: (c, f, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, s), norm_h_src.dtype),
            pltpu.VMEM((bq, s), norm_h_src.dtype),
        ],
    )

    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, f_total, s, d), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * f_total * s * s * d,
            bytes_accessed=(
                norm_h_src.size + 2 * p_hat.size + 2 * kf_attn.size
            ) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        pa.astype(jnp.int32),
        pb.astype(jnp.int32),
        w1.astype(jnp.float32),
        norm_h_src,
        p_hat,
        p_hat,
        kf_attn,
        kf_attn,
    )
    return out
