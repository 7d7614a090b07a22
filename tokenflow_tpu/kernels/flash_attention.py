"""Pallas TPU flash attention (online softmax, VMEM accumulators).

The hot kernel behind keyframe extended attention (ops/extended_attention):
the extended streams attend over the flattened keyframe sequence
(Skv = n_kf * seq, up to ~1.4e5 tokens at BASELINE config 5), and the
jnp fallback's lax.scan keeps its fp32 accumulator in HBM — this kernel
keeps (acc, m, l) in VMEM across the sequential KV grid dimension and
writes each output block exactly once.

Layout: (B, H, Sq, D) inside the kernel (head-major so blocks are 2D
(S, D) tiles); the public wrapper accepts the framework's (B, S, H, D).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2_E = math.log2(math.e)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
    *, scale, skv, bk, use_exp2, soft_bf16,
):
    """One (batch, head, q-block, kv-block) grid step.

    The matmul ceiling at SD's d_head=64 is ~50% of MXU peak (the 64-deep
    contraction / 64-wide PV output half-fill each 128x128 pass, and no
    head packing changes the pass count), so the kernel's headroom is on
    the VPU side of softmax. Two measured levers (scripts/tpu_flash_tune.py):
      use_exp2   fold scale*log2(e) into the Q tile once per block and use
                 exp2 instead of exp (exp lowers to exp2+mul on TPU; this
                 removes the per-logit scale mul and the extra mul in exp);
      soft_bf16  run the max/sub/exp2 elementwise chain in bf16 (2x VPU
                 lanes); l accumulates in f32. Probs are bf16 for the PV
                 matmul either way, matching the reference's fp16 softmax
                 precision class (tokenflow_utils.py:173-179).
    """
    jk = pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(jk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0]  # (BQ, D)
    k = k_ref[0, 0]  # (BK, D)
    v = v_ref[0, 0]

    if use_exp2:
        # pre-scale Q (O(BQ*D), amortized over BK logits per element)
        q = (q.astype(jnp.float32) * (scale * LOG2_E)).astype(q.dtype)
        expfn = jnp.exp2
    else:
        expfn = jnp.exp

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, BK), log2-domain when use_exp2
    if not use_exp2:
        s = s * scale

    # mask KV padding in the final block
    if skv % bk != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + jk * bk
        s = jnp.where(col < skv, s, NEG_INF)

    m_prev = m_ref[:]  # (BQ, 1) f32
    if soft_bf16:
        sb = s.astype(jnp.bfloat16)
        m_new = jnp.maximum(
            m_prev, sb.max(axis=-1, keepdims=True).astype(jnp.float32)
        )
        p = expfn(sb - m_new.astype(jnp.bfloat16))
        l_blk = jnp.sum(
            p, axis=-1, keepdims=True, dtype=jnp.float32
        )
    else:
        m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
        p = expfn(s - m_new)
        l_blk = p.sum(axis=-1, keepdims=True)
    corr = expfn(m_prev - m_new)
    l_ref[:] = l_ref[:] * corr + l_blk
    m_ref[:] = m_new
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * corr + pv

    @pl.when(jk == n_k - 1)
    def _finish():
        o_ref[0, 0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _env_flag(name: str, default: bool) -> bool:
    import os

    val = os.environ.get(name)
    if val is None:
        return default
    return val == "1"


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "bq", "bk", "interpret", "use_exp2", "soft_bf16"
    ),
)
def flash_attention_bhsd(
    q: jax.Array,  # (B, H, Sq, D)
    k: jax.Array,  # (B, H, Skv, D)
    v: jax.Array,
    *,
    scale: float,
    bq: int = 1024,
    bk: int = 1024,
    interpret: bool = False,
    use_exp2: bool = True,
    soft_bf16: bool = False,
) -> jax.Array:
    # defaults tuned on v5e at SD self-attention shapes (B=120, S=4096,
    # D=64): 1024/1024 reaches ~51 TF/s vs ~32 at 512/512, and beats
    # jax.nn.dot_product_attention (~43) — scripts/tpu_flash_tune.py
    b, h, sq, d = q.shape
    skv = k.shape[2]
    bq = min(bq, max(sq, 8))
    bk = min(bk, max(skv, 8))

    qp = _pad_to(q, 2, bq)
    kp = _pad_to(k, 2, bk)
    vp = _pad_to(v, 2, bk)
    n_q = qp.shape[2] // bq
    n_k = kp.shape[2] // bk

    grid = (b, h, n_q, n_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, skv=skv, bk=bk,
            use_exp2=use_exp2, soft_bf16=soft_bf16,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, bq, d),
                lambda bi, hi, iq, jk: (bi, hi, iq, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bk, d),
                lambda bi, hi, iq, jk: (bi, hi, jk, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bk, d),
                lambda bi, hi, iq, jk: (bi, hi, jk, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, d),
            lambda bi, hi, iq, jk: (bi, hi, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * skv * d,
            bytes_accessed=(
                q.size + k.size + v.size + q.size
            ) * q.dtype.itemsize,
            transcendentals=b * h * sq * skv,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :, :sq]


@functools.lru_cache(maxsize=None)
def _sharded_flash(scale, use_exp2, soft_bf16, interpret):
    """custom_partitioning wrapper: a plain pallas_call has no SPMD rule,
    so GSPMD would all-gather every operand and compute the kernel
    REPLICATED on each device of a mesh. This rule implements the Ulysses
    pattern natively in the kernel: queries stay sharded (any of B/Sq/H —
    under the sharded pivotal pass the keyframe axis lives flattened
    inside Sq), K/V are all-gathered over the mesh, each device runs the
    kernel on its query shard against the full K/V (exact: softmax rows
    are independent), and the output inherits the query sharding.

    Blocks are classed INSIDE the per-shard computation: ``partition``
    re-traces ``_call`` on the locally-sharded shapes, so default_blocks
    sees the PER-SHARD query length (e.g. the 512p pivotal pass on a
    v5e-8 runs Sq=2560 per shard, a different class than the global
    20480 — classing globally wasted ~38% of query rows as padding at
    that geometry)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def _call(q, k, v):
        # q here has the LOCAL (per-shard) shape when invoked as the
        # partitioned computation, and the global shape when traced
        # without a mesh — either way it is the shape the kernel runs
        bq, bk = default_blocks(q.shape[1], k.shape[1])
        return flash_attention_bhsd(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            scale=scale, bq=bq, bk=bk, interpret=interpret,
            use_exp2=use_exp2, soft_bf16=soft_bf16,
        ).transpose(0, 2, 1, 3)

    fa = custom_partitioning(_call)

    def _q_spec(arg_shape):
        sh = getattr(arg_shape, "sharding", None)
        spec = tuple(sh.spec) if isinstance(sh, NamedSharding) else ()
        spec = spec + (None,) * (4 - len(spec))
        # (B, Sq, H, D): keep B/Sq/H shardings, never shard head_dim
        return PartitionSpec(spec[0], spec[1], spec[2], None)

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, _q_spec(arg_shapes[0]))

    def partition(mesh, arg_shapes, result_shape):
        qspec = _q_spec(arg_shapes[0])
        arg_shardings = (
            NamedSharding(mesh, qspec),
            NamedSharding(mesh, PartitionSpec()),  # K/V all-gathered
            NamedSharding(mesh, PartitionSpec()),
        )
        return mesh, _call, NamedSharding(mesh, qspec), arg_shardings

    fa.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        decode_shardings=True,
        # Shardy path (default partitioner in this jax): queries shard on
        # b/sq/h; skv and the lane dim must be replicated per device (the
        # partitioner inserts the K/V all-gather)
        sharding_rule="b sq h d, b skv h d, b skv h d -> b sq h d",
        need_replication_factors=("d", "skv"),  # sorted by factor index
    )
    return fa


def default_blocks(sq: int, skv: int) -> tuple[int, int]:
    """Measured-best (bq, bk) per shape class on v5e (512p-class:
    scripts/tpu_flash_tune.py, round-2 sweep; 768p-class:
    scripts/tpu_config5_tune.py parts A/B, round-4 sweep — PERF.md):

      Sq < 8192 (512p sites, any KV):          1024x2048 (53.5 TF/s)
      Sq >= 8192, Skv <= Sq (768p self-attn):  2048x1024 (20.5 vs 11.8)
      Sq >= 8192, Skv > Sq (768p extended KV): 1024x1024 (65.4 vs 56.3)

    TOKENFLOW_FLASH_BQ / TOKENFLOW_FLASH_BK override the table."""
    import os

    if sq < 8192:
        bq, bk = 1024, 2048
    elif skv <= sq:
        bq, bk = 2048, 1024
    else:
        bq, bk = 1024, 1024
    return (
        int(os.environ.get("TOKENFLOW_FLASH_BQ", str(bq))),
        int(os.environ.get("TOKENFLOW_FLASH_BK", str(bk))),
    )


def flash_attention_sharded(
    q: jax.Array,  # (B, Sq, H, D) — framework layout
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Mesh-aware Pallas flash attention (see _sharded_flash). Engaged by
    the dispatch when TOKENFLOW_FLASH_SHARDED=1 (set by the CLI when a
    frames mesh is active); identical math to flash_attention_pallas."""
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    # blocks are classed inside the per-shard computation (_sharded_flash
    # _call) so the table sees the LOCAL query length under a mesh
    fa = _sharded_flash(
        scale,
        _env_flag("TOKENFLOW_FLASH_EXP2", True),
        _env_flag("TOKENFLOW_FLASH_SOFT_BF16", False),
        interpret,
    )
    return fa(q, k, v)


def flash_attention_pallas(
    q: jax.Array,  # (B, Sq, H, D) — framework layout
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float | None = None,
    bq: int | None = None,
    bk: int | None = None,
    interpret: bool = False,
    use_exp2: bool | None = None,
    soft_bf16: bool | None = None,
) -> jax.Array:
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    # per-shape-class measured defaults (see default_blocks)
    if bq is None or bk is None:
        dbq, dbk = default_blocks(q.shape[1], k.shape[1])
        bq = dbq if bq is None else bq
        bk = dbk if bk is None else bk
    if use_exp2 is None:
        use_exp2 = _env_flag("TOKENFLOW_FLASH_EXP2", True)
    if soft_bf16 is None:
        soft_bf16 = _env_flag("TOKENFLOW_FLASH_SOFT_BF16", False)
    out = flash_attention_bhsd(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        scale=scale,
        bq=bq,
        bk=bk,
        interpret=interpret,
        use_exp2=use_exp2,
        soft_bf16=soft_bf16,
    )
    return out.transpose(0, 2, 1, 3)
