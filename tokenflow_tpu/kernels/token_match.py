"""Pallas TPU fused token-match + gather kernel.

Fuses the NN propagation inner loop (ops/propagation.py): for each frame's
token block, cosine-similarity argmax against both pivot token tables and
the blended gather of keyframe attention outputs — WITHOUT materializing
the (F, S, S) similarity tensor in HBM (the jnp fallback's transient, and
the reference's actual materialized tensor, tokenflow_utils.py:335-343).

Design notes (guide: /opt/skills/guides/pallas_guide.md):
  - grid (F, Sq_blocks); each step computes the two one-hot argmax masks
    once and gathers ALL THREE streams (kf tables enter as (3,1,S,D)
    blocks), so the pivot/kf tables are DMA'd once per frame — the earlier
    stream-innermost variant re-fetched them every grid step, which
    dominated its runtime;
  - gathers are expressed as one-hot @ table matmuls — MXU-friendly and
    guaranteed to lower (no vector-gather dependence);
  - per-frame pivot tables are selected by scalar-prefetched (pa, pb)
    driving the BlockSpec index maps; the blend weight w1 rides the same
    scalar-prefetch path (SMEM (1,1) blocks of an (F,1) array are not
    lowerable on TPU);
  - similarities accumulate in fp32 on the MXU; inputs stay bf16;
  - scoped VMEM: the 16MB default limit rejects the 512p top site
    (observed on hardware: 16.26MB needed), so vmem_limit_bytes is raised
    (v5e has 128MB physical VMEM).

``fits_vmem`` gates dispatch on both feasibility and measured
profitability; oversizes fall back to the jnp path (768p top site until a
match/gather-split variant lands).
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
    kf_a_ref,  # (3, 1, S, D)
    kf_b_ref,  # (3, 1, S, D)
    out_ref,  # (3, 1, BQ, D)
):
    f = pl.program_id(0)
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

    oh1 = onehot_argmax(phat_a_ref)
    oh2 = onehot_argmax(phat_b_ref)
    w = w1_ref[f]

    # stream count is the leading kf-table axis: 3 ([source|uncond|cond])
    # on the exact path, 2 ([uncond|cond]) under approximate propagation
    for c in range(out_ref.shape[0]):
        g1 = jax.lax.dot_general(
            oh1, kf_a_ref[c, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g2 = jax.lax.dot_general(
            oh2, kf_b_ref[c, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[c, 0] = (w * g1 + (1.0 - w) * g2).astype(out_ref.dtype)


def fits_vmem(
    s: int, d: int, bq: int = 128, budget: int = 100 << 20, ns: int = 3
) -> bool:
    """Dispatch predicate: VMEM feasibility AND measured profitability.

    Tables count double for pipeline double-buffering. Profitability: on
    v5e the kernel wins up to the 512p top site and loses at 768p (table
    size drives residual DMA + VMEM pressure), hence the kf-block cap.
    """
    kf_block = ns * s * d * 2  # one (ns,S,D) bf16 kf table block
    if kf_block > (12 << 20):
        return False
    tables = 2 * (2 * kf_block + 2 * s * d * 2)  # kf_a/b + phat_a/b, dbuf
    sim = bq * s * 4
    oh = 2 * bq * s * 2
    x_out = 2 * (4 * bq * d * 4)
    return tables + sim + oh + x_out < budget


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
    ns = kf_attn.shape[0]
    bq = min(bq, s)
    assert s % bq == 0, (s, bq)
    n_q = s // bq
    dtype = kf_attn.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(f_total, n_q),
        in_specs=[
            pl.BlockSpec(
                (1, bq, d),
                lambda f, iq, pa_ref, pb_ref, w1_ref: (f, iq, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s, d),
                lambda f, iq, pa_ref, pb_ref, w1_ref: (pa_ref[f], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s, d),
                lambda f, iq, pa_ref, pb_ref, w1_ref: (pb_ref[f], 0, 0),
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
            (ns, 1, bq, d),
            lambda f, iq, pa_ref, pb_ref, w1_ref: (0, f, iq, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ns, f_total, s, d), dtype),
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


@functools.lru_cache(maxsize=None)
def _sharded_match(interpret: bool):
    """custom_partitioning wrapper for the match+gather kernels on a
    frames mesh: the frame axis shards (norm_h and the per-frame pivot
    index/weight vectors), the pivot/kf tables replicate (they are the
    per-step keyframe cache every shard consumes), and each device runs
    the kernel on its local frames — a plain pallas_call would instead be
    computed fully replicated by GSPMD. Chooses the fused or split kernel
    per shapes like the unsharded dispatch."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _call(norm_h, p_hat, kf_attn, pa, pb, w1):
        s, d = norm_h.shape[1], norm_h.shape[2]
        ns = kf_attn.shape[0]
        if fits_vmem(s, d, ns=ns):
            return token_match_gather_pallas(
                norm_h, p_hat, kf_attn, pa, pb, w1, interpret=interpret
            )
        from tokenflow_tpu.kernels.token_match_split import (
            split_fits_vmem,
            token_match_gather_split,
        )

        if split_fits_vmem(s, d, ns=ns):
            return token_match_gather_split(
                norm_h, p_hat, kf_attn, pa, pb, w1, interpret=interpret
            )
        # Neither kernel's VMEM model fits (e.g. 1024p-class S) — same
        # gate as the unsharded dispatch (ops/propagation.py): a VMEM
        # overrun inside the edit scan can crash the TPU worker, so run
        # the jnp match/gather (shardable) on each device's local shard.
        from tokenflow_tpu.ops.propagation import jnp_match_gather

        return jnp_match_gather(norm_h, p_hat, kf_attn, pa, pb, w1)

    tm = custom_partitioning(_call)

    def _f_axis(arg_shape):
        sh = getattr(arg_shape, "sharding", None)
        spec = tuple(sh.spec) if isinstance(sh, NamedSharding) else ()
        return spec[0] if spec else None

    def infer(mesh, arg_shapes, result_shape):
        f = _f_axis(arg_shapes[0])
        return NamedSharding(mesh, PartitionSpec(None, f, None, None))

    def partition(mesh, arg_shapes, result_shape):
        f = _f_axis(arg_shapes[0])
        fsh = PartitionSpec(f, None, None)
        repl = PartitionSpec()
        arg_shardings = (
            NamedSharding(mesh, fsh),
            NamedSharding(mesh, repl),
            NamedSharding(mesh, repl),
            NamedSharding(mesh, PartitionSpec(f)),
            NamedSharding(mesh, PartitionSpec(f)),
            NamedSharding(mesh, PartitionSpec(f)),
        )
        out_sh = NamedSharding(mesh, PartitionSpec(None, f, None, None))
        return mesh, _call, out_sh, arg_shardings

    tm.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        decode_shardings=True,
        # factors by first appearance: f(0) s(1) d(2) k(3) z(4) t(5);
        # only the frame axis may shard
        sharding_rule="f s d, k z d, t k z d, f, f, f -> t f s d",
        need_replication_factors=("s", "d", "k", "z", "t"),
    )
    return tm


def token_match_gather_sharded(
    norm_h_src: jax.Array,  # (F, S, D)
    p_hat: jax.Array,  # (K, S, D)
    kf_attn: jax.Array,  # (3, K, S, D)
    pa: jax.Array,  # (F,)
    pb: jax.Array,
    w1: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Mesh-aware entry (TOKENFLOW_MATCH_SHARDED=1; see _sharded_match)."""
    return _sharded_match(interpret)(
        norm_h_src, p_hat, kf_attn, pa, pb, w1
    )
