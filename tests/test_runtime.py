"""Runtime stack assembly tests (tiny weightless stack)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tokenflow_tpu import runtime


@pytest.fixture(scope="module")
def stack():
    return runtime.load_stack("tiny", init="random", dtype=jnp.float32,
                              param_dtype=jnp.float32)


def test_encode_prompt_order(stack):
    out = stack.encode_prompt("a cat", "ugly")
    assert out.shape == (2, 77, stack.text_encoder.config.hidden_size)
    # uncond (negative) first, cond second — reference embedding order
    out2 = stack.encode_prompt("a cat", "a cat")
    np.testing.assert_allclose(
        np.asarray(out2[0]), np.asarray(out2[1]), rtol=1e-5, atol=1e-6
    )


def test_vae_roundtrip_runs(stack):
    rng = np.random.default_rng(0)
    frames = rng.random((3, 32, 32, 3)).astype(np.float32)
    lat = stack.encode_frames(frames, batch=2)
    assert lat.shape == (3, 16, 16, 4)
    img = stack.decode_latents(lat, batch=2)
    assert img.shape == (3, 32, 32, 3)
    assert float(jnp.min(img)) >= 0.0 and float(jnp.max(img)) <= 1.0


def test_unknown_sd_version():
    with pytest.raises(ValueError, match="not supported"):
        runtime.configs_for("9.9")


def test_pretrained_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="checkpoint"):
        runtime.load_stack(
            "2.1", model_dir=str(tmp_path / "nope"), init="pretrained"
        )


def test_sd15_configs():
    unet_cfg, vae_cfg, clip_cfg = runtime.configs_for("1.5")
    assert unet_cfg.cross_attention_dim == 768
    assert not unet_cfg.use_linear_projection
    assert clip_cfg.hidden_act == "quick_gelu"
    unet_cfg, _, _ = runtime.configs_for("depth")
    assert unet_cfg.in_channels == 5


def test_vae_mapped_chunking_matches_host_loop(stack):
    """The single-dispatch lax.map chunking (SDStack._vae_mapped) must be
    numerically identical to the round-1 host loop, including a ragged
    final chunk (7 frames, batch 2)."""
    rng = np.random.default_rng(1)
    frames = rng.random((7, 32, 32, 3)).astype(np.float32)

    x = jnp.asarray(frames) * 2.0 - 1.0
    ref = runtime._batched(
        lambda xb: stack.vae.apply(
            stack.vae_params, xb, method=stack.vae.encode
        ),
        x,
        2,
    )
    out = stack._vae_mapped("encode")(stack.vae_params, x, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    lat = stack.encode_frames(frames, batch=2)
    ref_dec = runtime._batched(
        lambda zb: stack.vae.apply(
            stack.vae_params, zb, method=stack.vae.decode
        ),
        jnp.asarray(lat) / stack.vae.config.scaling_factor,
        3,
    )
    out_dec = stack._vae_mapped("decode")(
        stack.vae_params,
        jnp.asarray(lat) / stack.vae.config.scaling_factor,
        3,
    )
    np.testing.assert_allclose(np.asarray(out_dec), np.asarray(ref_dec),
                               rtol=1e-5, atol=1e-5)


def test_load_stack_process_cache():
    """Chained stages in one process share one stack (HBM: two full param
    sets at 768p crashed the TPU worker — PERF.md round 3); cache=False
    opts out."""
    a = runtime.load_stack("tiny", init="random", dtype=jnp.float32,
                           param_dtype=jnp.float32, seed=7)
    b = runtime.load_stack("tiny", init="random", dtype=jnp.float32,
                           param_dtype=jnp.float32, seed=7)
    assert a is b
    c = runtime.load_stack("tiny", init="random", dtype=jnp.float32,
                           param_dtype=jnp.float32, seed=8)
    assert c is not a  # different seed -> different params
    d = runtime.load_stack("tiny", init="random", dtype=jnp.float32,
                           param_dtype=jnp.float32, seed=7, cache=False)
    assert d is not a


def test_vae_segmented_dispatch_matches_single(stack):
    """frames_per_dispatch segments the frame axis into several device
    programs (axon relay watchdog — PERF.md round 3); math must be
    identical to the one-dispatch path, including a ragged tail
    (7 frames, segments of 3)."""
    rng = np.random.default_rng(2)
    frames = rng.random((7, 32, 32, 3)).astype(np.float32)

    lat_one = stack.encode_frames(frames, batch=2)
    lat_seg = stack.encode_frames(frames, batch=2, frames_per_dispatch=3)
    np.testing.assert_allclose(
        np.asarray(lat_seg), np.asarray(lat_one), rtol=1e-6, atol=1e-6
    )

    img_one = stack.decode_latents(lat_one, batch=2)
    img_seg = stack.decode_latents(lat_one, batch=2, frames_per_dispatch=3)
    np.testing.assert_allclose(
        np.asarray(img_seg), np.asarray(img_one), rtol=1e-6, atol=1e-6
    )


def test_decode_dtype_canonicalized_one_program(stack):
    """decode_latents upcasts the latent input to fp32 so the fp32
    encode_frames output and the bf16 edit-loop carry decode through ONE
    compiled program per shape (PERF.md round 5: the second program
    otherwise lands cold mid-run — a ~530 s remote-compile wall inside
    decode_and_save at config-5 scale). bf16->fp32 is exact, so outputs
    are bitwise identical across caller dtypes."""
    rng = np.random.default_rng(3)
    lat32 = jnp.asarray(rng.standard_normal((3, 16, 16, 4)), jnp.float32)
    lat16 = lat32.astype(jnp.bfloat16)

    img_from_bf16 = stack.decode_latents(lat16, batch=2)
    img_from_fp32 = stack.decode_latents(lat16.astype(jnp.float32), batch=2)
    np.testing.assert_array_equal(
        np.asarray(img_from_bf16), np.asarray(img_from_fp32)
    )


def test_decode_prewarm_specs_match_dispatch(stack):
    """decode_prewarm_specs must lower the EXACT programs decode_latents
    dispatches: same jitted callable (jit cache hit, not a second
    compile), fp32 input spec, and the planner's segment lengths."""
    specs = stack.decode_prewarm_specs(7, (16, 16), batch=2,
                                       frames_per_dispatch=3)
    # 7 frames at cap 3 -> segments of 3+3+1 -> distinct lengths {1, 3}
    lengths = sorted(s[1][1].shape[0] for s in specs)
    assert lengths == [1, 3]
    for fn, args, kwargs in specs:
        assert fn is stack._vae_mapped("decode")  # shared jit cache
        assert args[1].dtype == jnp.float32
        lowered = fn.lower(*args, **kwargs)
        assert lowered is not None
    # unsegmented: one program at the full frame count
    (one,) = stack.decode_prewarm_specs(5, (16, 16), batch=2)
    assert one[1][1].shape == (5, 16, 16, 4)
