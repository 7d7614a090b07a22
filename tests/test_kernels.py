"""Pallas kernel tests (interpret mode on CPU; real-hardware runs are
covered by the `tpu`-marked variants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenflow_tpu.kernels.flash_attention import flash_attention_pallas
from tokenflow_tpu.ops.attention import sdp_attention


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32
    )


@pytest.mark.parametrize(
    "sq,skv,bq,bk",
    [(16, 16, 8, 8), (32, 100, 16, 32), (24, 64, 8, 16)],
)
def test_flash_pallas_matches_sdp_interpret(sq, skv, bq, bk):
    b, h, d = 2, 3, 16
    q = _rand((b, sq, h, d), 0)
    k = _rand((b, skv, h, d), 1)
    v = _rand((b, skv, h, d), 2)
    ref = sdp_attention(q, k, v)
    out = flash_attention_pallas(
        q, k, v, bq=bq, bk=bk, interpret=True
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_flash_pallas_exp2_matches_sdp_interpret():
    """exp2-domain softmax is mathematically identical (exp(x) =
    exp2(x*log2e)); must agree to f32 rounding."""
    b, h, d, sq, skv = 2, 3, 16, 32, 100
    q, k, v = _rand((b, sq, h, d), 3), _rand((b, skv, h, d), 4), _rand(
        (b, skv, h, d), 5
    )
    ref = sdp_attention(q, k, v)
    out = flash_attention_pallas(
        q, k, v, bq=16, bk=32, interpret=True, use_exp2=True
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_flash_pallas_soft_bf16_matches_sdp_interpret():
    """bf16 softmax chain: same precision class as the reference's fp16
    softmax (tokenflow_utils.py:173-179); loose tolerance."""
    b, h, d, sq, skv = 2, 3, 16, 32, 100
    q, k, v = _rand((b, sq, h, d), 6), _rand((b, skv, h, d), 7), _rand(
        (b, skv, h, d), 8
    )
    ref = sdp_attention(q, k, v)
    out = flash_attention_pallas(
        q, k, v, bq=16, bk=32, interpret=True, use_exp2=True, soft_bf16=True
    )
    np.testing.assert_allclose(out, ref, rtol=5e-2, atol=2e-2)


def test_token_match_pallas_matches_jnp_interpret():
    from tokenflow_tpu.kernels.token_match import token_match_gather_pallas
    from tokenflow_tpu.ops.propagation import (
        propagation_indices,
        token_propagation,
    )

    rng = np.random.default_rng(3)
    f_total, ws, s, d, kf = 4, 2, 128, 16, 2
    norm_h = jnp.asarray(rng.standard_normal((f_total, s, d)), jnp.float32)
    pivot_h = jnp.asarray(rng.standard_normal((kf, s, d)), jnp.float32)
    kf_attn = jnp.asarray(rng.standard_normal((3, kf, s, d)), jnp.float32)
    pa, pb, w1 = (jnp.asarray(a) for a in propagation_indices(f_total, ws))

    import os

    os.environ["TOKENFLOW_PALLAS"] = "0"
    try:
        ref = token_propagation(norm_h, pivot_h, kf_attn, pa, pb, w1)
    finally:
        del os.environ["TOKENFLOW_PALLAS"]

    p32 = pivot_h.astype(jnp.float32)
    p_hat = p32 / (jnp.linalg.norm(p32, axis=-1, keepdims=True) + 1e-12)
    out = token_match_gather_pallas(
        norm_h, p_hat, kf_attn, pa, pb, w1, bq=64, interpret=True
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.tpu
def test_token_match_pallas_matches_jnp_tpu():
    import os

    from tokenflow_tpu.kernels.token_match import token_match_gather_pallas
    from tokenflow_tpu.ops.propagation import (
        propagation_indices,
        token_propagation,
    )

    rng = np.random.default_rng(7)
    f_total, ws, s, d, kf = 8, 2, 4096, 320, 4
    norm_h = jnp.asarray(rng.standard_normal((f_total, s, d)), jnp.bfloat16)
    pivot_h = jnp.asarray(rng.standard_normal((kf, s, d)), jnp.bfloat16)
    kf_attn = jnp.asarray(
        rng.standard_normal((3, kf, s, d)), jnp.bfloat16
    )
    pa, pb, w1 = (jnp.asarray(a) for a in propagation_indices(f_total, ws))

    os.environ["TOKENFLOW_PALLAS"] = "0"
    try:
        ref = token_propagation(norm_h, pivot_h, kf_attn, pa, pb, w1)
    finally:
        del os.environ["TOKENFLOW_PALLAS"]
    p32 = pivot_h.astype(jnp.float32)
    p_hat = (
        p32 / (jnp.linalg.norm(p32, axis=-1, keepdims=True) + 1e-12)
    ).astype(jnp.bfloat16)
    out = token_match_gather_pallas(norm_h, p_hat, kf_attn, pa, pb, w1)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )


@pytest.mark.tpu
def test_flash_pallas_matches_sdp_tpu():
    b, h, d, sq, skv = 2, 5, 64, 1024, 4096
    q = _rand((b, sq, h, d), 0).astype(jnp.bfloat16)
    k = _rand((b, skv, h, d), 1).astype(jnp.bfloat16)
    v = _rand((b, skv, h, d), 2).astype(jnp.bfloat16)
    ref = sdp_attention(q, k, v)
    out = flash_attention_pallas(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(ref, np.float32),
        rtol=2e-2,
        atol=2e-2,
    )


def test_token_match_split_matches_jnp_interpret():
    import os

    from tokenflow_tpu.kernels.token_match_split import (
        token_match_gather_split,
    )
    from tokenflow_tpu.ops.propagation import (
        propagation_indices,
        token_propagation,
    )

    rng = np.random.default_rng(11)
    f_total, ws, s, d, kf = 4, 2, 256, 16, 2
    norm_h = jnp.asarray(rng.standard_normal((f_total, s, d)), jnp.float32)
    pivot_h = jnp.asarray(rng.standard_normal((kf, s, d)), jnp.float32)
    kf_attn = jnp.asarray(rng.standard_normal((3, kf, s, d)), jnp.float32)
    pa, pb, w1 = (jnp.asarray(a) for a in propagation_indices(f_total, ws))

    os.environ["TOKENFLOW_PALLAS"] = "0"
    try:
        ref = token_propagation(norm_h, pivot_h, kf_attn, pa, pb, w1)
    finally:
        del os.environ["TOKENFLOW_PALLAS"]

    p32 = pivot_h.astype(jnp.float32)
    p_hat = p32 / (jnp.linalg.norm(p32, axis=-1, keepdims=True) + 1e-12)
    out = token_match_gather_split(
        norm_h, p_hat, kf_attn, pa, pb, w1,
        bq_match=128, bz=128, bq_gather=128, interpret=True,
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("act", [None, "silu"])
@pytest.mark.parametrize("layout", ["bl", "cl"])
def test_group_norm_pallas_matches_ref_interpret(act, layout):
    from tokenflow_tpu.kernels.group_norm import (
        group_norm_nhwc,
        group_norm_ref,
    )

    rng = np.random.default_rng(3)
    b, hh, ww, c, g = 3, 8, 8, 32, 8
    x = jnp.asarray(rng.standard_normal((b, hh, ww, c)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    ref = group_norm_ref(
        x.reshape(b, -1, c), scale, bias, groups=g, eps=1e-5, act=act
    ).reshape(x.shape)
    out = group_norm_nhwc(
        x, scale, bias, groups=g, eps=1e-5, act=act, layout=layout,
        interpret=True,
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_group_norm_pallas_bf16_chunked_interpret():
    """Multi-chunk S accumulation (grid > 1) in bf16."""
    from tokenflow_tpu.kernels import group_norm as gn

    rng = np.random.default_rng(4)
    b, hh, ww, c, g = 2, 16, 16, 96, 32
    x = jnp.asarray(rng.standard_normal((b, hh, ww, c)), jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    ref = gn.group_norm_ref(
        x.reshape(b, -1, c), scale, bias, groups=g, eps=1e-6, act="silu"
    ).reshape(x.shape)
    old = gn._BLOCK_BUDGET_BYTES
    gn._BLOCK_BUDGET_BYTES = 64 * 96 * 2 * 2  # force s_chunk=2 < S=256
    try:
        out = gn.group_norm_nhwc(
            x, scale, bias, groups=g, eps=1e-6, act="silu", interpret=True
        )
    finally:
        gn._BLOCK_BUDGET_BYTES = old
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_fused_group_norm_matches_flax_groupnorm():
    """FusedGroupNorm (jnp path) == flax nn.GroupNorm + silu, same params."""
    from flax import linen as nn

    from tokenflow_tpu.models.layers import FusedGroupNorm

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)
    fused = FusedGroupNorm(groups=8, eps=1e-5, act="silu")
    params = fused.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape), p.dtype), params
    )
    ours = fused.apply(params, x)
    ref_mod = nn.GroupNorm(num_groups=8, epsilon=1e-5)
    theirs = nn.silu(ref_mod.apply(params, x))
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(theirs), rtol=2e-5, atol=2e-5
    )


def test_flash_sharded_custom_partitioning():
    """flash_attention_sharded under an 8-device mesh: matches sdp, and
    the lowered HLO shows the kernel computing on the LOCAL query shard
    (not replicated — the point of the custom_partitioning rule)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tokenflow_tpu.kernels.flash_attention import (
        flash_attention_sharded,
    )
    from tokenflow_tpu.ops.attention import sdp_attention

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU harness")
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("frames",))

    rng = np.random.default_rng(7)
    b, sq, skv, h, d = 2, 128, 64, 2, 16
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)

    qsh = NamedSharding(mesh, P(None, "frames"))
    repl = NamedSharding(mesh, P())
    fn = jax.jit(
        lambda q, k, v: flash_attention_sharded(q, k, v, interpret=True),
        in_shardings=(qsh, repl, repl),
    )
    ref = sdp_attention(q, k, v)
    out = fn(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    # per-device query length must appear in the partitioned module
    txt = fn.lower(q, k, v).compile().as_text()
    local = f"f32[{b},{sq // 8},{h},{d}]"
    assert local in txt, f"expected local shard shape {local} in HLO"


def test_token_match_sharded_custom_partitioning():
    """token_match_gather_sharded on an 8-device frames mesh: matches the
    jnp reference and computes on the LOCAL frame shard."""
    import os

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tokenflow_tpu.kernels.token_match import (
        token_match_gather_sharded,
    )
    from tokenflow_tpu.ops.propagation import (
        propagation_indices,
        token_propagation,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU harness")
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("frames",))

    rng = np.random.default_rng(12)
    f_total, ws, s, d, kf = 8, 2, 128, 16, 4
    norm_h = jnp.asarray(rng.standard_normal((f_total, s, d)), jnp.float32)
    pivot_h = jnp.asarray(rng.standard_normal((kf, s, d)), jnp.float32)
    kf_attn = jnp.asarray(rng.standard_normal((3, kf, s, d)), jnp.float32)
    pa, pb, w1 = (jnp.asarray(a) for a in propagation_indices(f_total, ws))

    os.environ["TOKENFLOW_PALLAS"] = "0"
    try:
        ref = token_propagation(norm_h, pivot_h, kf_attn, pa, pb, w1)
    finally:
        del os.environ["TOKENFLOW_PALLAS"]

    p32 = pivot_h.astype(jnp.float32)
    p_hat = p32 / (jnp.linalg.norm(p32, axis=-1, keepdims=True) + 1e-12)
    fsh = NamedSharding(mesh, P("frames"))
    repl = NamedSharding(mesh, P())
    fn = jax.jit(
        lambda nh, ph, ka, a, b, w: token_match_gather_sharded(
            nh, ph, ka, a, b, w, interpret=True
        ),
        in_shardings=(fsh, repl, repl, fsh, fsh, fsh),
    )
    out = fn(norm_h, p_hat, kf_attn, pa, pb, w1)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
    txt = fn.lower(norm_h, p_hat, kf_attn, pa, pb, w1).compile().as_text()
    local = f"f32[{f_total // 8},{s},{d}]"
    assert local in txt, f"expected local shard shape {local} in HLO"


def test_vmem_gates_reject_oversized_sites():
    """Dispatch gates (fused + split kernels) must reject sites whose
    tables exceed the VMEM model — on hardware an overrun inside the edit
    scan can crash the TPU worker rather than raise (ADVICE round-2
    medium: the sharded dispatch previously skipped the split gate)."""
    from tokenflow_tpu.kernels.token_match import fits_vmem
    from tokenflow_tpu.kernels.token_match_split import split_fits_vmem

    # 512p top site: fused kernel eligible
    assert fits_vmem(4096, 320)
    # 768p top site: fused rejects (profitability cap), split accepts
    assert not fits_vmem(9216, 320)
    assert split_fits_vmem(9216, 320)
    # 1024p-class site: ~126MB resident kf tables — both must reject
    assert not fits_vmem(16384, 320)
    assert not split_fits_vmem(16384, 320)


def test_use_pallas_gn_requires_optin_and_master(monkeypatch):
    """GN kernel: explicit opt-in, vetoed by the master TOKENFLOW_PALLAS=0
    switch that the frames-mesh setup uses to disable SPMD-rule-less
    kernels (ADVICE round-2 low)."""
    from tokenflow_tpu.ops.attention import use_pallas_gn

    monkeypatch.delenv("TOKENFLOW_PALLAS_GN", raising=False)
    monkeypatch.delenv("TOKENFLOW_PALLAS", raising=False)
    assert not use_pallas_gn()  # never auto
    monkeypatch.setenv("TOKENFLOW_PALLAS_GN", "1")
    assert use_pallas_gn()
    monkeypatch.setenv("TOKENFLOW_PALLAS", "0")  # mesh veto
    assert not use_pallas_gn()
    monkeypatch.setenv("TOKENFLOW_PALLAS", "1")
    assert use_pallas_gn()
