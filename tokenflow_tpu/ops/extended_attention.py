"""Keyframe extended attention (jnp reference implementation).

Replaces the reference's patched ``sa_forward`` (tokenflow_utils.py:106-294)
with a pure function on the 3-stream layout. Key TPU-first observation: in
the reference, every frame's queries attend over the *same* concatenated
keyframe K/V (k_uncond/k_cond are `.repeat(n_frames, 1, 1)` copies,
tokenflow_utils.py:133-138); since the KV set is shared, extended attention
over a stream is exactly *dense self-attention over the flattened
(n_frames*seq) token sequence* — one big MXU-friendly attention with no KV
duplication and no per-head Python loop (reference loops heads at
tokenflow_utils.py:168-190, 265-272).

The source stream keeps per-frame self-attention (reference
tokenflow_utils.py:173/177 uses per-frame K/V for stream 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tokenflow_tpu.ops.attention import flash_attention, merge_heads, split_heads


def inject_source_qk(
    q: jax.Array, k: jax.Array, gate: jax.Array | None
) -> tuple[jax.Array, jax.Array]:
    """PnP q/k injection: overwrite uncond+cond streams with the source
    stream when ``gate`` (t in the injection schedule) is set.

    Parity: reference tokenflow_utils.py:124-130 (v is NOT injected).
    q, k: (3, F, S, inner); gate: traced scalar bool or None.
    """
    if gate is None:
        return q, k

    def _inj(x):
        src = jnp.broadcast_to(x[:1], x.shape)
        return jnp.where(gate, src, x)

    return _inj(q), _inj(k)


def extended_attention(
    q3: jax.Array,
    k3: jax.Array,
    v3: jax.Array,
    *,
    heads: int,
    scale: float | None = None,
    kv_block: int = 2048,
) -> jax.Array:
    """Multi-stream keyframe attention.

    q3/k3/v3: (3, K, S, inner) projected q/k/v for [source|uncond|cond]
    (the reference layout), or (2, K, S, inner) [uncond|cond] for the
    source-free SDEdit approximate pivotal pass (editctx prop_approx with
    pnp=False — without injection no stream ever consumes the source, so
    it can be dropped here too).
    Returns (ns, K, S, inner): source (when present) = per-frame
    self-attention; uncond and cond = each frame's queries attend over all
    K frames' keys/values jointly (implemented as one dense attention over
    the flattened K*S sequence per stream).
    """
    ns, kf, s, inner = q3.shape
    assert ns in (2, 3), ns
    d = inner // heads
    scale = d**-0.5 if scale is None else scale

    # Uncond + cond streams (the last two): dense attention over the
    # flattened keyframe token sequence, batched as 2 streams.
    ext = slice(ns - 2, ns)
    q_ext = split_heads(q3[ext].reshape(2, kf * s, inner), heads)
    k_ext = split_heads(k3[ext].reshape(2, kf * s, inner), heads)
    v_ext = split_heads(v3[ext].reshape(2, kf * s, inner), heads)
    out_ext = flash_attention(q_ext, k_ext, v_ext, scale=scale, kv_block=kv_block)
    out_ext = merge_heads(out_ext).reshape(2, kf, s, inner)
    if ns == 2:
        return out_ext

    # Source stream: per-frame self-attention, batch = K frames.
    out_src = flash_attention(
        split_heads(q3[0], heads),
        split_heads(k3[0], heads),
        split_heads(v3[0], heads),
        scale=scale,
        kv_block=kv_block,
    )
    out = jnp.concatenate(
        [merge_heads(out_src).reshape(1, kf, s, inner), out_ext],
        axis=0,
    )
    return out
