"""Model-stack tests: shapes, edit-mode plumbing, and torch golden parity
for the numerics-critical pieces (conv/norm layout conversion, CLIP text
encoder incl. causal masking) using torch-CPU as the gold standard
(SURVEY.md §4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenflow_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from tokenflow_tpu.models.layers import ResnetBlock2D
from tokenflow_tpu.models.unet2d import UNet2DConfig, UNet2DConditionModel
from tokenflow_tpu.models.vae import AutoencoderKL, AutoencoderKLConfig
from tokenflow_tpu.models import weights as W
from tokenflow_tpu.ops import editctx


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = UNet2DConfig.tiny()
    model = UNet2DConditionModel(cfg)
    b, hw = 6, 16  # 3 streams x 2 frames
    x = jnp.zeros((b, hw, hw, cfg.in_channels))
    t = jnp.asarray(10)
    ctx = jnp.zeros((b, 7, cfg.cross_attention_dim))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    return model, params, cfg


def test_unet_forward_shape(tiny_unet):
    model, params, cfg = tiny_unet
    x = jnp.ones((2, 16, 16, cfg.in_channels)) * 0.1
    ctx = jnp.ones((2, 7, cfg.cross_attention_dim)) * 0.1
    eps, cache = model.apply(params, x, jnp.asarray(3), ctx)
    assert eps.shape == (2, 16, 16, cfg.out_channels)
    assert cache == {}
    assert np.isfinite(np.asarray(eps)).all()


def test_unet_pivotal_then_propagate(tiny_unet):
    model, params, cfg = tiny_unet
    kf, f, ws = 2, 4, 2
    rng = np.random.default_rng(0)
    ctx_dim = cfg.cross_attention_dim

    xp = jnp.asarray(rng.standard_normal((3 * kf, 16, 16, 4)), jnp.float32)
    ctxp = jnp.asarray(rng.standard_normal((3 * kf, 7, ctx_dim)), jnp.float32)
    edit_p = editctx.UNetEdit(
        mode=editctx.EditMode.PIVOTAL,
        n_frames=kf,
        pnp=True,
        qk_gate=jnp.asarray(True),
        conv_gate=jnp.asarray(True),
    )
    eps_p, cache = model.apply(params, xp, jnp.asarray(5), ctxp, edit=edit_p)
    # tiny config: attn sites are down_0_0, mid, up_1_0, up_1_1
    assert set(cache) == {"down_0_0", "mid", "up_1_0", "up_1_1"}
    for site, entry in cache.items():
        assert entry["pivot_h"].shape[0] == kf
        assert entry["kf_attn"].shape[:2] == (3, kf)

    xq = jnp.asarray(rng.standard_normal((3 * f, 16, 16, 4)), jnp.float32)
    ctxq = jnp.asarray(rng.standard_normal((3 * f, 7, ctx_dim)), jnp.float32)
    from tokenflow_tpu.ops.propagation import propagation_indices

    pa, pb, w1 = (jnp.asarray(a) for a in propagation_indices(f, ws))
    edit_q = editctx.UNetEdit(
        mode=editctx.EditMode.PROPAGATE,
        n_frames=f,
        pnp=True,
        qk_gate=jnp.asarray(False),
        conv_gate=jnp.asarray(True),
        cache=cache,
        prop_pa=pa,
        prop_pb=pb,
        prop_w1=w1,
    )
    eps_q, cache_q = model.apply(params, xq, jnp.asarray(5), ctxq, edit=edit_q)
    assert eps_q.shape == (3 * f, 16, 16, 4)
    assert cache_q == {}
    assert np.isfinite(np.asarray(eps_q)).all()


def test_unet_conv_injection_makes_streams_equal(tiny_unet):
    """With qk+conv injection gates on and identical cross-attn context, a
    pivotal pass must produce identical uncond/cond outputs only if their
    inputs match; here we check the injection gate actually changes the
    output (sanity that the gate is plumbed through)."""
    model, params, cfg = tiny_unet
    kf = 2
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3 * kf, 16, 16, 4)), jnp.float32)
    ctx = jnp.asarray(
        rng.standard_normal((3 * kf, 7, cfg.cross_attention_dim)), jnp.float32
    )

    def run(gate):
        edit = editctx.UNetEdit(
            mode=editctx.EditMode.PIVOTAL,
            n_frames=kf,
            pnp=True,
            qk_gate=jnp.asarray(gate),
            conv_gate=jnp.asarray(gate),
        )
        eps, _ = model.apply(params, x, jnp.asarray(5), ctx, edit=edit)
        return np.asarray(eps)

    assert not np.allclose(run(True), run(False))


def test_sd21_unet_structure():
    """Full-size SD-2.1 UNet: parameter count and edit-site inventory."""
    cfg = UNet2DConfig.sd21_base()
    model = UNet2DConditionModel(cfg)
    x = jax.ShapeDtypeStruct((3, 64, 64, 4), jnp.float32)
    t = jax.ShapeDtypeStruct((), jnp.int32)
    ctx = jax.ShapeDtypeStruct((3, 77, 1024), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t, ctx)
    n_params = sum(
        np.prod(l.shape) for l in jax.tree.leaves(shapes)
    )
    # diffusers SD-2.1-base UNet has ~865.9M parameters
    assert 860e6 < n_params < 872e6, n_params

    edit = editctx.UNetEdit(
        mode=editctx.EditMode.PIVOTAL, n_frames=1,
        qk_gate=jnp.asarray(False), conv_gate=jnp.asarray(False),
    )
    _, cache_shapes = jax.eval_shape(
        lambda p, a, b, c: model.apply(p, a, b, c, edit=edit),
        shapes, x, t, ctx,
    )
    assert set(cache_shapes) == set(editctx.SELF_ATTN_SITES)


def test_unet_conv_projection_path():
    """SD-1.5-style config: conv proj_in/out (use_linear_projection=False)
    and d_head = C/heads with non-64 head dims."""
    cfg = UNet2DConfig(
        block_out_channels=(32, 64),
        layers_per_block=1,
        cross_attention_dim=32,
        num_heads=(8, 8),  # d_head 4, 8 — the SD-1.5 C/8 convention
        use_linear_projection=False,
        attn_down=(True, False),
        attn_up=(False, True),
    )
    model = UNet2DConditionModel(cfg)
    x = jnp.ones((2, 16, 16, 4)) * 0.1
    ctx = jnp.ones((2, 7, 32)) * 0.1
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray(3), ctx)
    # conv projections materialize as (1,1,C,C) kernels
    k = params["params"]["down_0_attn_0"]["proj_in"]["kernel"]
    assert k.shape == (1, 1, 32, 32)
    eps, _ = model.apply(params, x, jnp.asarray(3), ctx)
    assert eps.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(eps)).all()


def test_unet_depth_input_channels():
    cfg = UNet2DConfig.tiny()
    cfg = UNet2DConfig(**{**cfg.__dict__, "in_channels": 5})
    model = UNet2DConditionModel(cfg)
    x = jnp.ones((2, 16, 16, 5)) * 0.1
    ctx = jnp.ones((2, 7, cfg.cross_attention_dim)) * 0.1
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray(3), ctx)
    eps, _ = model.apply(params, x, jnp.asarray(3), ctx)
    assert eps.shape == (2, 16, 16, 4)  # out_channels stays 4


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


def test_vae_roundtrip_shapes():
    cfg = AutoencoderKLConfig.tiny()
    model = AutoencoderKL(cfg)
    x = jnp.ones((2, 32, 32, 3)) * 0.3
    params = model.init(jax.random.PRNGKey(0), x)
    z = model.apply(params, x, method=model.encode)
    assert z.shape == (2, 16, 16, cfg.latent_channels)  # one downsample
    y = model.apply(params, z, method=model.decode)
    assert y.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_vae_sd_latent_shape():
    cfg = AutoencoderKLConfig.sd()
    model = AutoencoderKL(cfg)
    x = jax.ShapeDtypeStruct((1, 512, 512, 3), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    n_params = sum(np.prod(l.shape) for l in jax.tree.leaves(shapes))
    # diffusers SD VAE has ~83.65M parameters
    assert 82e6 < n_params < 85e6, n_params
    z = jax.eval_shape(
        lambda p, a: model.apply(p, a, method=model.encode), shapes, x
    )
    assert z.shape == (1, 64, 64, 4)


# ---------------------------------------------------------------------------
# torch golden: ResnetBlock numerics + weight conversion
# ---------------------------------------------------------------------------


def test_resnet_block_matches_torch_golden():
    import torch
    import torch.nn.functional as F

    c_in, c_out, temb_dim = 8, 16, 12
    rng = np.random.default_rng(2)

    def t(*shape):
        return torch.tensor(
            rng.standard_normal(shape), dtype=torch.float64
        )

    sd = {
        "norm1.weight": t(c_in),
        "norm1.bias": t(c_in),
        "conv1.weight": t(c_out, c_in, 3, 3) * 0.1,
        "conv1.bias": t(c_out),
        "time_emb_proj.weight": t(c_out, temb_dim) * 0.1,
        "time_emb_proj.bias": t(c_out),
        "norm2.weight": t(c_out),
        "norm2.bias": t(c_out),
        "conv2.weight": t(c_out, c_out, 3, 3) * 0.1,
        "conv2.bias": t(c_out),
        "conv_shortcut.weight": t(c_out, c_in, 1, 1),
        "conv_shortcut.bias": t(c_out),
    }

    x = t(2, c_in, 10, 10)
    temb = t(2, temb_dim)

    # torch reference implementing the diffusers ResnetBlock2D formula
    h = F.group_norm(x, 4, sd["norm1.weight"], sd["norm1.bias"], eps=1e-5)
    h = F.silu(h)
    h = F.conv2d(h, sd["conv1.weight"], sd["conv1.bias"], padding=1)
    emb = F.linear(F.silu(temb), sd["time_emb_proj.weight"], sd["time_emb_proj.bias"])
    h = h + emb[:, :, None, None]
    h = F.group_norm(h, 4, sd["norm2.weight"], sd["norm2.bias"], eps=1e-5)
    h = F.silu(h)
    h = F.conv2d(h, sd["conv2.weight"], sd["conv2.bias"], padding=1)
    xs = F.conv2d(x, sd["conv_shortcut.weight"], sd["conv_shortcut.bias"])
    ref = (xs + h).numpy().transpose(0, 2, 3, 1)

    # flax params via the converter rules
    np_sd = {k: v.numpy().astype(np.float32) for k, v in sd.items()}
    flat = {}
    for key, w in np_sd.items():
        parts = key.split(".")
        leaf_name, leaf = W._leaf(parts[-1], w)
        W._insert(flat, parts[:-1] + [leaf_name], leaf)

    model = ResnetBlock2D(out_channels=c_out, groups=4)
    out = model.apply(
        {"params": flat},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1), jnp.float32),
        jnp.asarray(temb.numpy(), jnp.float32),
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# torch golden: CLIP text encoder + converter vs transformers
# ---------------------------------------------------------------------------


def test_clip_text_matches_transformers_golden():
    import torch
    import transformers

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=1000,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=77,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf_model = transformers.CLIPTextModel(hf_cfg).eval()

    ids = torch.randint(0, 1000, (2, 77))
    with torch.no_grad():
        ref = hf_model(ids).last_hidden_state.numpy()

    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = W.convert_clip_text_state_dict(sd)

    cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, hidden_act="gelu",
    )
    model = CLIPTextModel(cfg)
    expected = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
        )
    )
    W.assert_params_match(params, expected["params"])
    out = model.apply({"params": params}, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)
