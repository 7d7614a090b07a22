"""Nearest-neighbor token propagation (jnp reference implementation).

Replaces the reference TokenFlowBlock propagation path
(tokenflow_utils.py:296-429): during a propagation pass the self-attention
output of every frame is *gathered* from the cached keyframe attention
outputs via cosine-similarity nearest-neighbor token correspondences, then
two-pivot blended.

Faithfully reproduced reference quirks (SURVEY.md §7 "hard parts"):
  - the blend weight assumes the pivot sits at the *center* of its window
    (tokenflow_utils.py:377-378) even though the actual pivot is random;
  - the weight is squashed through a sigmoid, landing in [0.5, 0.731]
    (tokenflow_utils.py:383);
  - correspondences are computed on the source stream only and reused for
    all three streams (tokenflow_utils.py:335-348);
  - window w uses pivots {w, w-1}; window 0 uses only pivot 0
    (tokenflow_utils.py:331-333).

TPU-first deviations (math-preserving):
  - all windows are processed in one batched call (the reference loops
    windows sequentially on one GPU, run_tokenflow_pnp.py:229-232);
  - query-side L2 normalization is skipped: argmax over z of
    (x/|x|)·p_hat_z equals argmax of x·p_hat_z (row scale > 0 does not
    change the argmax), so only the pivot side is normalized;
  - window 0's single-pivot branch is expressed as pb=pa with a safe blend
    denominator: both gathers are then identical, so any finite weight
    reproduces the single-gather result exactly.

A Pallas kernel fusing normalize -> QK^T -> argmax -> gather (avoiding the
(S, 2S) similarity materialization) can be swapped in behind
``token_propagation`` (kernels/token_match.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def batch_cosine_sim(x: jax.Array, y: jax.Array) -> jax.Array:
    """Row-wise cosine similarity matrix (x @ y^T after L2 normalization).

    Public-API parity with reference util.py:61-69 (the token-
    correspondence primitive); the fused propagation paths below avoid
    materializing it.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
    y = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-12)
    return jnp.einsum("id,jd->ij", x, y, preferred_element_type=jnp.float32)


def propagation_indices(
    n_frames: int, window_size: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side per-frame propagation metadata: (pa, pb, w1).

    pa[f]/pb[f] are the two pivot (window) indices frame f gathers from —
    its own window and the previous one (window 0 reuses its own pivot
    twice, reproducing the reference's single-pivot branch,
    tokenflow_utils.py:331-333). w1[f] is the blend weight of the
    own-window pivot.

    Blend parity: reference tokenflow_utils.py:375-383 with the assumed
    mid-window pivot position and sigmoid squashing. The safe denominator
    covers window 0 (pa == pb -> d1 == d2 can both be 0 at the assumed
    center) where any finite weight is exact because both gathers coincide.
    """
    f = np.arange(n_frames)
    w = f // window_size
    pa = w
    pb = np.maximum(w - 1, 0)
    center = window_size // 2
    p1 = pa * window_size + center
    p2 = pb * window_size + center
    d1 = np.abs(f - p1).astype(np.float64)
    d2 = np.abs(f - p2).astype(np.float64)
    w1 = 1.0 / (1.0 + np.exp(-(d2 / (d1 + d2 + 1e-8))))
    return (
        pa.astype(np.int32),
        pb.astype(np.int32),
        w1.astype(np.float32),
    )


def jnp_match_gather(
    xq: jax.Array,  # (F, S, D) query tokens (need not be normalized)
    p_hat: jax.Array,  # (K, S, D) L2-normalized pivot tokens
    kf_attn: jax.Array,  # (3, K, S, D)
    pa_f: jax.Array,  # (F,)
    pb_f: jax.Array,  # (F,)
    w1: jax.Array,  # (F,)
) -> jax.Array:
    """Dense-jnp NN match + two-pivot blended gather.

    The reference semantics (tokenflow_utils.py:335-390) with the frame
    axis kept a real array axis so pjit can shard it; also the fallback
    the kernel dispatches (fused and split Pallas variants) degrade to
    when their VMEM models don't fit. Peak transient is the (F, S, S)
    similarity tensor — bounded by the pipeline's propagate_chunk.
    """
    xq = xq.astype(jnp.float32)

    def match_gather(p_idx):
        sim = jnp.einsum(
            "fsd,fzd->fsz",
            xq,
            p_hat.astype(jnp.float32)[p_idx],
            preferred_element_type=jnp.float32,
        )
        idx = jnp.argmax(sim, axis=-1)  # (F, S)
        # kf_attn[:, p_idx]: (3, F, S, D); gather tokens per frame.
        return jnp.take_along_axis(
            kf_attn[:, p_idx], idx[None, :, :, None], axis=2
        )

    g1 = match_gather(pa_f)
    g2 = match_gather(pb_f)
    w = w1.astype(kf_attn.dtype)[None, :, None, None]
    return w * g1 + (1 - w) * g2


def token_propagation(
    norm_h_src: jax.Array,
    pivot_h_src: jax.Array,
    kf_attn: jax.Array,
    pa_f: jax.Array,
    pb_f: jax.Array,
    w1: jax.Array,
) -> jax.Array:
    """Gather per-frame attention outputs from cached keyframe outputs.

    Args:
      norm_h_src: (F, S, D) source-stream normed hidden states of the
        propagation pass frames.
      pivot_h_src: (K, S, D) source-stream normed hidden states cached from
        the pivotal pass (reference pivot_hidden_states[0]).
      kf_attn: (3, K, S, D) cached keyframe attention outputs.
      pa_f, pb_f: (F,) pivot indices per frame (see propagation_indices;
        sliceable so propagation passes can be chunked over frames).
      w1: (F,) blend weight of pivot pa.

    Returns:
      (3, F, S, D) propagated attention outputs, dtype of kf_attn.
    """
    f_total, s, d = norm_h_src.shape
    ns = kf_attn.shape[0]  # 3 exact; 2 under approximate propagation

    # Normalize pivot tokens once (query-side normalization is argmax-
    # invariant, see module docstring).
    p = pivot_h_src.astype(jnp.float32)
    p_hat = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-12)

    from tokenflow_tpu.ops.attention import use_pallas

    if use_pallas("match") and s % 128 == 0 and d % 8 == 0:
        import os

        from tokenflow_tpu.kernels.token_match import (
            fits_vmem,
            token_match_gather_pallas,
        )
        from tokenflow_tpu.kernels.token_match_split import (
            token_match_gather_split,
        )

        if os.environ.get("TOKENFLOW_MATCH_SHARDED") == "1":
            # mesh-aware variant (custom_partitioning: frame axis shards,
            # keyframe tables replicate) — a plain pallas_call under
            # GSPMD would be computed replicated on every device
            from tokenflow_tpu.kernels.token_match import (
                token_match_gather_sharded,
            )

            return token_match_gather_sharded(
                norm_h_src,
                p_hat.astype(norm_h_src.dtype),
                kf_attn,
                pa_f,
                pb_f,
                w1,
            )
        if fits_vmem(s, d, ns=ns):
            return token_match_gather_pallas(
                norm_h_src,
                p_hat.astype(norm_h_src.dtype),
                kf_attn,
                pa_f,
                pb_f,
                w1,
            )
        # large-S sites (768p): split match/gather kernels keep the kf
        # tables resident per frame; gate on the gather stage's VMEM
        from tokenflow_tpu.kernels.token_match_split import (
            split_fits_vmem,
        )

        if split_fits_vmem(s, d, ns=ns):
            return token_match_gather_split(
                norm_h_src,
                p_hat.astype(norm_h_src.dtype),
                kf_attn,
                pa_f,
                pb_f,
                w1,
            )

    return jnp_match_gather(
        norm_h_src, p_hat, kf_attn, pa_f, pb_f, w1
    )
