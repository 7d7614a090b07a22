"""Tests for the core array ops vs straightforward dense references that
mirror the reference repo's semantics (tokenflow_utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenflow_tpu.ops.attention import (
    flash_attention,
    sdp_attention,
    split_heads,
)
from tokenflow_tpu.ops.extended_attention import (
    extended_attention,
    inject_source_qk,
)
from tokenflow_tpu.ops.propagation import (
    propagation_indices,
    token_propagation,
)


def _naive_attn(q, k, v, scale):
    # q: (B,S,H,D) -> dense softmax attention in fp64 for a gold standard
    q, k, v = (np.asarray(x, np.float64) for x in (q, k, v))
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) * scale
    logits -= logits.max(-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v)


def test_sdp_matches_naive():
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((2, 16, 4, 8)), jnp.float32)
        for _ in range(3)
    )
    out = sdp_attention(q, k, v)
    np.testing.assert_allclose(
        out, _naive_attn(q, k, v, 8**-0.5), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("skv,kv_block", [(16, 64), (100, 32), (128, 32)])
def test_flash_matches_sdp(skv, kv_block):
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((2, 8, 4, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, skv, 4, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, skv, 4, 8)), jnp.float32)
    out = flash_attention(q, k, v, kv_block=kv_block)
    np.testing.assert_allclose(
        out, _naive_attn(q, k, v, 8**-0.5), rtol=1e-4, atol=1e-5
    )


def _ref_extended(q3, k3, v3, heads):
    """Dense mirror of reference tokenflow_utils.py:216-283: stream 0 does
    per-frame self-attn; streams 1,2 attend over concatenated frame K/V."""
    three, kf, s, inner = q3.shape
    d = inner // heads
    scale = d**-0.5
    out = np.zeros_like(np.asarray(q3, np.float64))
    qh = np.asarray(q3, np.float64).reshape(3, kf, s, heads, d)
    kh = np.asarray(k3, np.float64).reshape(3, kf, s, heads, d)
    vh = np.asarray(v3, np.float64).reshape(3, kf, s, heads, d)
    # source stream
    o = _naive_attn(
        qh[0].transpose(0, 1, 2, 3).reshape(kf, s, heads, d),
        kh[0].reshape(kf, s, heads, d),
        vh[0].reshape(kf, s, heads, d),
        scale,
    )
    out[0] = o.reshape(kf, s, inner)
    # extended streams
    for c in (1, 2):
        k_all = kh[c].reshape(1, kf * s, heads, d)
        v_all = vh[c].reshape(1, kf * s, heads, d)
        for f in range(kf):
            o = _naive_attn(qh[c, f].reshape(1, s, heads, d), k_all, v_all, scale)
            out[c, f] = o.reshape(s, inner)
    return out


def test_extended_attention_matches_reference_semantics():
    rng = np.random.default_rng(2)
    kf, s, heads, d = 3, 10, 2, 8
    inner = heads * d
    q3, k3, v3 = (
        jnp.asarray(rng.standard_normal((3, kf, s, inner)), jnp.float32)
        for _ in range(3)
    )
    out = extended_attention(q3, k3, v3, heads=heads, kv_block=16)
    np.testing.assert_allclose(
        out, _ref_extended(q3, k3, v3, heads), rtol=1e-4, atol=1e-5
    )


def test_inject_source_qk():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((3, 2, 4, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 2, 4, 8)), jnp.float32)
    qi, ki = inject_source_qk(q, k, jnp.asarray(True))
    np.testing.assert_array_equal(qi[1], q[0])
    np.testing.assert_array_equal(qi[2], q[0])
    np.testing.assert_array_equal(ki[1], k[0])
    qi, ki = inject_source_qk(q, k, jnp.asarray(False))
    np.testing.assert_array_equal(qi, q)
    np.testing.assert_array_equal(ki, k)


def _ref_propagation(norm_h3_src, pivot_h_src, kf_attn, window_size):
    """Numpy mirror of reference tokenflow_utils.py:329-393 (per-window
    loop, incl. single-pivot window 0 and the sigmoid blend)."""

    def cos_sim(x, y):
        x = x / np.linalg.norm(x, axis=-1, keepdims=True)
        y = y / np.linalg.norm(y, axis=-1, keepdims=True)
        return x @ y.T

    f_total, s, d = norm_h3_src.shape
    out = np.zeros((3, f_total, s, d))
    kf_attn = np.asarray(kf_attn, np.float64)
    n_windows = f_total // window_size
    for w in range(n_windows):
        sl = slice(w * window_size, (w + 1) * window_size)
        x = np.asarray(norm_h3_src[sl], np.float64).reshape(-1, d)
        batch_idxs = [w] if w == 0 else [w, w - 1]
        piv = np.asarray(pivot_h_src, np.float64)[batch_idxs].reshape(-1, d)
        sim = cos_sim(x, piv)  # (ws*s, len*s)
        if len(batch_idxs) == 2:
            sim1, sim2 = sim[:, :s], sim[:, s:]
            idx1 = sim1.argmax(-1)
            idx2 = sim2.argmax(-1)
            a1 = kf_attn[:, w][:, idx1].reshape(3, window_size, s, d)
            a2 = kf_attn[:, w - 1][:, idx2].reshape(3, window_size, s, d)
            sg = np.arange(window_size) + w * window_size
            p1 = w * window_size + window_size // 2
            p2 = (w - 1) * window_size + window_size // 2
            d1 = np.abs(sg - p1)
            d2 = np.abs(sg - p2)
            w1 = 1 / (1 + np.exp(-(d2 / (d1 + d2))))
            w1 = w1[None, :, None, None]
            out[:, sl] = w1 * a1 + (1 - w1) * a2
        else:
            idx1 = sim.argmax(-1)
            out[:, sl] = kf_attn[:, w][:, idx1].reshape(3, window_size, s, d)
    return out


@pytest.mark.parametrize("n_windows", [1, 2, 3])
def test_token_propagation_matches_reference(n_windows):
    rng = np.random.default_rng(4)
    ws, s, d = 4, 6, 8
    f_total = n_windows * ws
    norm_h = jnp.asarray(rng.standard_normal((f_total, s, d)), jnp.float32)
    pivot_h = jnp.asarray(rng.standard_normal((n_windows, s, d)), jnp.float32)
    kf_attn = jnp.asarray(
        rng.standard_normal((3, n_windows, s, d)), jnp.float32
    )
    pa, pb, w1 = propagation_indices(f_total, ws)
    out = token_propagation(
        norm_h, pivot_h, kf_attn, jnp.asarray(pa), jnp.asarray(pb),
        jnp.asarray(w1),
    )
    ref = _ref_propagation(norm_h, pivot_h, kf_attn, ws)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_token_propagation_chunked_equals_full():
    """Chunking a propagation pass over frames (with sliced pa/pb/w1) must
    reproduce the all-frames result — the invariant the chunked propagation
    UNet pass relies on."""
    rng = np.random.default_rng(5)
    ws, s, d, n_windows = 2, 5, 4, 4
    f_total = ws * n_windows
    norm_h = jnp.asarray(rng.standard_normal((f_total, s, d)), jnp.float32)
    pivot_h = jnp.asarray(rng.standard_normal((n_windows, s, d)), jnp.float32)
    kf_attn = jnp.asarray(
        rng.standard_normal((3, n_windows, s, d)), jnp.float32
    )
    pa, pb, w1 = (jnp.asarray(x) for x in propagation_indices(f_total, ws))
    full = token_propagation(norm_h, pivot_h, kf_attn, pa, pb, w1)
    chunk = ws * 2
    parts = [
        token_propagation(
            norm_h[i : i + chunk], pivot_h, kf_attn,
            pa[i : i + chunk], pb[i : i + chunk], w1[i : i + chunk],
        )
        for i in range(0, f_total, chunk)
    ]
    np.testing.assert_allclose(
        full, np.concatenate(parts, axis=1), rtol=1e-6, atol=1e-6
    )


def test_batch_cosine_sim_matches_reference_math():
    from tokenflow_tpu.ops.propagation import batch_cosine_sim

    rng = np.random.default_rng(6)
    x = rng.standard_normal((5, 8))
    y = rng.standard_normal((7, 8))
    got = batch_cosine_sim(jnp.asarray(x), jnp.asarray(y))
    xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
    yn = y / np.linalg.norm(y, axis=-1, keepdims=True)
    np.testing.assert_allclose(got, xn @ yn.T, rtol=1e-5, atol=1e-6)
