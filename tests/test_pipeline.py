"""Inversion + editing pipeline tests on a tiny UNet (SURVEY.md §4:
tiny-UNet fixture for fast pipeline tests; DDIM round-trip property)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenflow_tpu.diffusion import ddim, inversion
from tokenflow_tpu.editing import pipeline
from tokenflow_tpu.models.unet2d import UNet2DConfig, UNet2DConditionModel


@pytest.fixture(scope="module")
def tiny():
    cfg = UNet2DConfig.tiny()
    model = UNet2DConditionModel(cfg)
    hw = 16
    x = jnp.zeros((2, hw, hw, 4))
    ctx = jnp.zeros((2, 7, cfg.cross_attention_dim))
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray(0), ctx)
    return model, params, cfg, hw


def test_inversion_trajectory_and_roundtrip(tiny):
    model, params, cfg, hw = tiny
    f = 2
    sched = ddim.make_schedule(20)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((f, hw, hw, 4)) * 0.3, jnp.float32)
    cond = jnp.asarray(rng.standard_normal((1, 7, cfg.cross_attention_dim)), jnp.float32)

    def eps_fn(x, t):
        ctx = jnp.broadcast_to(cond, (x.shape[0], *cond.shape[1:]))
        # damp the random-weight UNet output so inversion<->sampling stays
        # in the well-conditioned regime for the round-trip property (a
        # trained UNet is smooth across adjacent noise levels; a
        # random-weight one is not)
        return 0.02 * model.apply(params, x, t, ctx)[0]

    x_T, traj, save_ts = inversion.ddim_inversion(eps_fn, x0, sched, 10)
    assert x_T.shape == x0.shape
    assert traj.shape == (10, f, hw, hw, 4)
    assert len(save_ts) == 10
    assert np.isfinite(np.asarray(traj)).all()
    # every save slot written (non-zero with overwhelming probability)
    assert (np.abs(np.asarray(traj)).reshape(10, -1).max(1) > 0).all()

    x_rec = inversion.ddim_reconstruction(eps_fn, x_T, sched)
    err = np.abs(np.asarray(x_rec) - np.asarray(x0)).max()
    scale = np.abs(np.asarray(x0)).max()
    assert err < 0.05 * scale, (err, scale)


def test_inversion_frame_chunking_matches(tiny):
    model, params, cfg, hw = tiny
    f = 4
    sched = ddim.make_schedule(5)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal((f, hw, hw, 4)) * 0.3, jnp.float32)
    cond = jnp.asarray(
        rng.standard_normal((1, 7, cfg.cross_attention_dim)), jnp.float32
    )

    def eps_fn(x, t):
        ctx = jnp.broadcast_to(cond, (x.shape[0], *cond.shape[1:]))
        return model.apply(params, x, t, ctx)[0]

    a, _, _ = inversion.ddim_inversion(eps_fn, x0, sched, 5)
    b, _, _ = inversion.ddim_inversion(eps_fn, x0, sched, 5, frame_chunk=2)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def _edit_setup(tiny, f, ws, steps, save_steps=None):
    model, params, cfg, hw = tiny
    save_steps = save_steps or steps
    sched = ddim.make_schedule(steps)
    rng = np.random.default_rng(2)
    x_init = jnp.asarray(rng.standard_normal((f, hw, hw, 4)), jnp.float32)
    traj = jnp.asarray(
        rng.standard_normal((save_steps, f, hw, hw, 4)), jnp.float32
    )
    save_ts = ddim.make_schedule(save_steps).timesteps[::-1].copy()
    embeds3 = jnp.asarray(
        rng.standard_normal((3, 7, cfg.cross_attention_dim)), jnp.float32
    )
    schedule = pipeline.make_edit_schedule(
        sched, save_ts, pnp_attn_t=0.5, pnp_f_t=0.8
    )

    def unet_apply(p, sample, t, ctx, edit):
        return model.apply(p, sample, t, ctx, edit=edit)

    return model, params, x_init, traj, embeds3, schedule, unet_apply


def test_tokenflow_sample_loop_runs(tiny):
    f, ws, steps = 4, 2, 3
    (model, params, x_init, traj, embeds3, schedule, unet_apply) = _edit_setup(
        tiny, f, ws, steps
    )
    out = pipeline.tokenflow_sample_loop(
        unet_apply, params, x_init, traj, embeds3, schedule,
        window_size=ws, guidance_scale=7.5, pnp=True,
        rng=jax.random.PRNGKey(1),
    )
    assert out.shape == x_init.shape
    assert np.isfinite(np.asarray(out)).all()
    # editing must actually change the latents
    assert not np.allclose(out, x_init)


def test_tokenflow_chunked_propagation_matches(tiny):
    f, ws, steps = 4, 2, 2
    (model, params, x_init, traj, embeds3, schedule, unet_apply) = _edit_setup(
        tiny, f, ws, steps
    )
    kwargs = dict(
        window_size=ws, guidance_scale=7.5, pnp=True,
        rng=jax.random.PRNGKey(1),
    )
    full = pipeline.tokenflow_sample_loop(
        unet_apply, params, x_init, traj, embeds3, schedule, **kwargs
    )
    chunked = pipeline.tokenflow_sample_loop(
        unet_apply, params, x_init, traj, embeds3, schedule,
        propagate_chunk=2, **kwargs,
    )
    np.testing.assert_allclose(full, chunked, rtol=2e-4, atol=2e-5)


def test_edit_schedule_rejects_off_grid_timesteps(tiny):
    sched = ddim.make_schedule(10)
    save_ts = ddim.make_schedule(5).timesteps[::-1].copy()
    with pytest.raises(ValueError, match="save grid"):
        pipeline.make_edit_schedule(sched, save_ts)


def test_vanilla_sample_loop_runs(tiny):
    model, params, cfg, hw = tiny
    f, steps = 2, 2
    sched = ddim.make_schedule(steps)
    rng = np.random.default_rng(3)
    x_init = jnp.asarray(rng.standard_normal((f, hw, hw, 4)), jnp.float32)
    embeds2 = jnp.asarray(
        rng.standard_normal((2, 7, cfg.cross_attention_dim)), jnp.float32
    )
    save_ts = sched.timesteps[::-1].copy()
    schedule = pipeline.make_edit_schedule(sched, save_ts)

    def unet_apply(p, sample, t, ctx, edit):
        return model.apply(p, sample, t, ctx, edit=edit)

    out = pipeline.vanilla_sample_loop(
        unet_apply, params, x_init, embeds2, schedule, guidance_scale=7.5
    )
    assert out.shape == x_init.shape
    assert np.isfinite(np.asarray(out)).all()


def test_edit_loop_deterministic(tiny):
    """Same seed -> bitwise-identical outputs (the seed-1 reproducibility
    contract, reference util.py:99-103 / config seed)."""
    f, ws, steps = 4, 2, 2
    (model, params, x_init, traj, embeds3, schedule, unet_apply) = _edit_setup(
        tiny, f, ws, steps
    )
    kwargs = dict(
        window_size=ws, guidance_scale=7.5, pnp=True,
        rng=jax.random.PRNGKey(42),
    )
    a = pipeline.tokenflow_sample_loop(
        unet_apply, params, x_init, traj, embeds3, schedule, **kwargs
    )
    b = pipeline.tokenflow_sample_loop(
        unet_apply, params, x_init, traj, embeds3, schedule, **kwargs
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # different seed -> different pivots -> different output
    c = pipeline.tokenflow_sample_loop(
        unet_apply, params, x_init, traj, embeds3, schedule,
        window_size=ws, guidance_scale=7.5, pnp=True,
        rng=jax.random.PRNGKey(43),
    )
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_fused_step_matches_two_pass(tiny):
    """EditMode.FUSED (single-pass pivotal+propagation) must reproduce the
    two-pass loop exactly — same pivots (same rng), same math."""
    f, ws, steps = 4, 2, 2
    (model, params, x_init, traj, embeds3, schedule, unet_apply) = _edit_setup(
        tiny, f, ws, steps
    )
    kwargs = dict(
        window_size=ws, guidance_scale=7.5, pnp=True,
        rng=jax.random.PRNGKey(5),
    )
    two_pass = pipeline.tokenflow_sample_loop(
        unet_apply, params, x_init, traj, embeds3, schedule, **kwargs
    )
    fused = pipeline.tokenflow_sample_loop(
        unet_apply, params, x_init, traj, embeds3, schedule,
        fused=True, **kwargs,
    )
    np.testing.assert_allclose(
        np.asarray(two_pass), np.asarray(fused), rtol=2e-4, atol=2e-5
    )


def test_pinned_pivots_reproduce_rng_run(tiny):
    """pivot_indices pins the keyframe choices: passing the exact table
    choose_pivots would draw must reproduce the rng-driven run bitwise
    (the replay/A/B contract — VERDICT round-2 missing #3; the reference
    draws pivots from the torch global RNG, run_tokenflow_pnp.py:224)."""
    f, ws, steps = 4, 2, 2
    (model, params, x_init, traj, embeds3, schedule, unet_apply) = _edit_setup(
        tiny, f, ws, steps
    )
    rng = jax.random.PRNGKey(7)
    kwargs = dict(window_size=ws, guidance_scale=7.5, pnp=True, rng=rng)
    a = pipeline.tokenflow_sample_loop(
        unet_apply, params, x_init, traj, embeds3, schedule, **kwargs
    )
    pivots = np.asarray(pipeline.choose_pivots(rng, steps, f // ws, ws))
    pipeline.validate_pivot_indices(pivots, steps, f // ws, ws)
    b = pipeline.tokenflow_sample_loop(
        unet_apply, params, x_init, traj, embeds3, schedule,
        pivot_indices=pivots, **kwargs,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a different pinned table changes the output
    other = np.asarray([[0, 2], [1, 3]], np.int32)
    if not np.array_equal(other, pivots):
        c = pipeline.tokenflow_sample_loop(
            unet_apply, params, x_init, traj, embeds3, schedule,
            pivot_indices=other, **kwargs,
        )
        assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_validate_pivot_indices_rejects_bad_tables():
    import pytest as _pytest

    ok = np.asarray([[1, 2], [0, 3]], np.int32)  # ws=2, windows at [0,2)+[2,4)
    pipeline.validate_pivot_indices(ok, 2, 2, 2)
    with _pytest.raises(ValueError, match="shape"):
        pipeline.validate_pivot_indices(ok, 3, 2, 2)
    with _pytest.raises(ValueError, match="out of window"):
        pipeline.validate_pivot_indices(
            np.asarray([[2, 2], [0, 3]], np.int32), 2, 2, 2
        )


def test_segmented_dispatch_matches_single(tiny):
    """split_schedule segments with the carry threaded == one scan
    (the segmented-dispatch form bounding per-program execution time;
    PERF.md round 3). Pivots pinned so both forms draw identically."""
    f, ws, steps = 4, 2, 5
    (model, params, x_init, traj, embeds3, schedule, unet_apply) = _edit_setup(
        tiny, f, ws, steps
    )
    pivots = np.asarray(
        pipeline.choose_pivots(jax.random.PRNGKey(3), steps, f // ws, ws)
    )
    kw = dict(
        window_size=ws, guidance_scale=7.5, pnp=True,
        rng=jax.random.PRNGKey(1),
    )
    single = pipeline.tokenflow_sample_loop(
        unet_apply, params, x_init, traj, embeds3, schedule,
        pivot_indices=pivots, **kw,
    )
    x = x_init
    for s, sched_seg in zip(
        range(0, steps, 2), pipeline.split_schedule(schedule, 2)
    ):
        x = pipeline.tokenflow_sample_loop(
            unet_apply, params, x, traj, embeds3, sched_seg,
            pivot_indices=pivots[s : s + 2], **kw,
        )
    np.testing.assert_allclose(np.asarray(single), np.asarray(x),
                               rtol=1e-5, atol=1e-6)


def test_segmented_inversion_matches_single(tiny):
    model, params, cfg, hw = tiny
    f, steps, save_steps = 2, 6, 3
    sched = ddim.make_schedule(steps)
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.standard_normal((f, hw, hw, 4)) * 0.3, jnp.float32)
    cond = jnp.asarray(
        rng.standard_normal((1, 7, cfg.cross_attention_dim)), jnp.float32
    )

    def eps_fn(x, t):
        ctx = jnp.broadcast_to(cond, (x.shape[0], *cond.shape[1:]))
        return model.apply(params, x, t, ctx)[0]

    x_T, traj, save_ts = inversion.ddim_inversion(eps_fn, x0, sched, save_steps)

    xs, save_ts2 = inversion.inversion_xs(sched, save_steps)
    np.testing.assert_array_equal(save_ts, save_ts2)
    x_seg = x0
    traj_seg = jnp.zeros((save_steps, *x0.shape), x0.dtype)
    for s in range(0, steps, 4):  # uneven tail (4 + 2)
        x_seg, traj_seg = inversion.invert_scan(
            eps_fn, x_seg, traj_seg, tuple(a[s : s + 4] for a in xs)
        )
    np.testing.assert_allclose(np.asarray(x_T), np.asarray(x_seg),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(traj_seg),
                               rtol=1e-6, atol=1e-7)

    # reconstruction: segmented == single
    rec = inversion.ddim_reconstruction(eps_fn, x_T, sched)
    rxs = inversion.reconstruction_xs(sched)
    r_seg = x_seg
    for s in range(0, steps, 4):
        r_seg = inversion.recon_scan(
            eps_fn, r_seg, tuple(a[s : s + 4] for a in rxs)
        )
    np.testing.assert_allclose(np.asarray(rec), np.asarray(r_seg),
                               rtol=1e-6, atol=1e-7)
