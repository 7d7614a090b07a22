"""Attention primitives (pure functions, XLA-friendly).

TPU-first design notes:
  - logits always accumulate in float32 (MXU preferred_element_type), softmax
    in float32, output cast back to the compute dtype;
  - a blockwise (online-softmax) variant bounds HBM for long KV, used by the
    keyframe extended attention where KV length is n_keyframes * seq
    (reference tokenflow_utils.py:133-138 materializes the full similarity
    matrix per head instead);
  - shapes are batch-first `(B, S, H, D)` so the head axis stays adjacent to
    the lane dimension.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def use_pallas(kind: str = "flash") -> bool:
    """Kernel dispatch switch.

    Master switch TOKENFLOW_PALLAS: 1 forces on, 0 forces off, 'auto'
    (default) enables on TPU backends. Per-kernel overrides
    TOKENFLOW_PALLAS_FLASH / TOKENFLOW_PALLAS_MATCH (1/0) take precedence
    for their op (used to isolate kernel faults).
    """
    per = os.environ.get(f"TOKENFLOW_PALLAS_{kind.upper()}")
    if per == "1":
        return True
    if per == "0":
        return False
    env = os.environ.get("TOKENFLOW_PALLAS", "auto")
    if env == "1":
        return True
    if env == "0":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def use_pallas_gn() -> bool:
    """GroupNorm kernel dispatch: EXPLICIT opt-in (TOKENFLOW_PALLAS_GN=1
    — measured net-neutral-to-negative inside the edit scan, PERF.md
    round-2 GN study, so never auto), vetoed by the master switch
    TOKENFLOW_PALLAS=0. The veto matters under a frames mesh: the mesh
    setup (cli/common.maybe_frames_mesh) sets TOKENFLOW_PALLAS=0 because
    a pallas_call without an SPMD rule is computed replicated on every
    mesh device, and the GN kernel carries no custom_partitioning rule.
    """
    if os.environ.get("TOKENFLOW_PALLAS_GN") != "1":
        return False
    return os.environ.get("TOKENFLOW_PALLAS", "auto") != "0"


def split_heads(x: jax.Array, heads: int) -> jax.Array:
    """(B, S, H*D) -> (B, S, H, D)."""
    b, s, inner = x.shape
    return x.reshape(b, s, heads, inner // heads)


def merge_heads(x: jax.Array) -> jax.Array:
    """(B, S, H, D) -> (B, S, H*D)."""
    b, s, h, d = x.shape
    return x.reshape(b, s, h * d)


def sdp_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float | None = None,
) -> jax.Array:
    """Softmax(QK^T * scale) V with fp32 accumulation.

    q: (B, Sq, H, D); k, v: (B, Skv, H, D). Returns (B, Sq, H, D) in q.dtype.
    """
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd",
        probs.astype(q.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float | None = None,
    kv_block: int = 2048,
) -> jax.Array:
    """Blockwise attention with online softmax over the KV axis.

    Same contract as :func:`sdp_attention` but never materializes the full
    (Sq, Skv) logits — HBM use is O(Sq * kv_block). Used for keyframe
    extended attention where Skv = n_keyframes * seq can reach ~1.4e5 tokens
    (BASELINE config 5). A Pallas kernel with the same signature can be
    swapped in behind :func:`extended_attention` (kernels/ext_attention.py).
    """
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    skv = k.shape[1]
    if skv <= kv_block:
        return sdp_attention(q, k, v, scale=scale)

    if use_pallas("flash") and d % 8 == 0 and q.dtype in (
        jnp.bfloat16,
        jnp.float32,
    ):
        if os.environ.get("TOKENFLOW_FLASH_SHARDED") == "1":
            # mesh-aware variant: carries a custom_partitioning rule so
            # the kernel computes SHARDED under GSPMD (queries sharded,
            # K/V gathered) instead of being replicated per device
            from tokenflow_tpu.kernels.flash_attention import (
                flash_attention_sharded,
            )

            return flash_attention_sharded(q, k, v, scale=scale)
        from tokenflow_tpu.kernels.flash_attention import (
            flash_attention_pallas,
        )

        return flash_attention_pallas(q, k, v, scale=scale)

    n_blocks = -(-skv // kv_block)
    pad = n_blocks * kv_block - skv
    if pad:
        # Pad KV with -inf-masked tokens.
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    kb = k.reshape(k.shape[0], n_blocks, kv_block, *k.shape[2:])
    vb = v.reshape(v.shape[0], n_blocks, kv_block, *v.shape[2:])
    valid = (
        jnp.arange(n_blocks * kv_block).reshape(n_blocks, kv_block) < skv
    )

    b, sq, h, _ = q.shape

    def body(carry, xs):
        acc, m, l = carry  # acc: (B,Sq,H,D) f32, m/l: (B,H,Sq) f32
        k_i, v_i, valid_i = xs
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k_i, preferred_element_type=jnp.float32
        ) * scale
        logits = jnp.where(valid_i[None, None, None, :], logits, -jnp.inf)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        l_new = l * corr + p.sum(axis=-1)
        pv = jnp.einsum(
            "bhqk,bkhd->bqhd",
            p.astype(v_i.dtype),
            v_i,
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * corr.transpose(0, 2, 1)[..., None] + pv
        return (acc_new, m_new, l_new), None

    acc0 = jnp.zeros((b, sq, h, d), jnp.float32)
    m0 = jnp.full((b, h, sq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, sq), jnp.float32)
    (acc, _, l), _ = jax.lax.scan(
        body,
        (acc0, m0, l0),
        (kb.swapaxes(0, 1), vb.swapaxes(0, 1), valid),
    )
    out = acc / l.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)
