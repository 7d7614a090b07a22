"""Multi-device SPMD tests on the 8-virtual-device CPU mesh (SURVEY.md §4:
sharded vs single-device outputs must match)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenflow_tpu.diffusion import ddim
from tokenflow_tpu.editing import pipeline
from tokenflow_tpu.models.unet2d import UNet2DConfig, UNet2DConditionModel
from tokenflow_tpu.sharding import mesh as mesh_lib


@pytest.fixture(scope="module")
def tiny():
    cfg = UNet2DConfig.tiny()
    model = UNet2DConditionModel(cfg)
    hw = 16
    x = jnp.zeros((2, hw, hw, 4))
    ctx = jnp.zeros((2, 7, cfg.cross_attention_dim))
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray(0), ctx)
    return model, params, cfg, hw


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_edit_loop_matches_single_device(tiny):
    model, params, cfg, hw = tiny
    n_dev = 8
    ws = 2
    f_total = n_dev * ws  # one window per device
    steps = 2

    sched = ddim.make_schedule(steps)
    save_ts = sched.timesteps[::-1].copy()
    schedule = pipeline.make_edit_schedule(
        sched, save_ts, pnp_attn_t=0.5, pnp_f_t=0.8
    )
    rng = np.random.default_rng(0)
    x_init = jnp.asarray(
        rng.standard_normal((f_total, hw, hw, 4)), jnp.float32
    )
    traj = jnp.asarray(
        rng.standard_normal((steps, f_total, hw, hw, 4)), jnp.float32
    )
    embeds3 = jnp.asarray(
        rng.standard_normal((3, 7, cfg.cross_attention_dim)), jnp.float32
    )
    key = jax.random.PRNGKey(7)

    def unet_apply(p, sample, t, ctx, edit, **kw):
        return model.apply(p, sample, t, ctx, edit=edit, **kw)

    # single device
    single = pipeline.tokenflow_sample_loop(
        unet_apply, params, x_init, traj, embeds3, schedule,
        window_size=ws, guidance_scale=7.5, pnp=True, rng=key,
    )

    # 8-device frames mesh
    m = mesh_lib.make_frames_mesh(n_dev)
    mesh_lib.check_divisible(f_total, m, ws)
    loop = mesh_lib.sharded_edit_loop(
        unet_apply, params, schedule, m,
        window_size=ws, guidance_scale=7.5, pnp=True,
    )
    sharded = loop(params, x_init, traj, embeds3, key)

    assert sharded.sharding.is_equivalent_to(
        mesh_lib.frames_sharding(m), sharded.ndim
    )
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), rtol=5e-5, atol=5e-5
    )


def test_sharded_vanilla_loop_matches_single_device(tiny):
    """The per-frame SDEdit baseline is embarrassingly frame-parallel:
    sharded over the frames mesh (frame_chunk=None, the run_sdedit
    --vanilla mesh path) it must match the single-device chunked loop —
    the last loop family without a sharding parity test."""
    model, params, cfg, hw = tiny
    n_dev = 8
    f_total = 2 * n_dev
    steps = 2

    sched = ddim.make_schedule(steps)
    schedule = pipeline.make_edit_schedule(
        sched, sched.timesteps[::-1].copy()
    )
    rng = np.random.default_rng(1)
    x_init = jnp.asarray(
        rng.standard_normal((f_total, hw, hw, 4)), jnp.float32
    )
    embeds2 = jnp.asarray(
        rng.standard_normal((2, 7, cfg.cross_attention_dim)), jnp.float32
    )

    def unet_apply(p, sample, t, ctx, edit, **kw):
        return model.apply(p, sample, t, ctx, edit=edit, **kw)

    single = pipeline.vanilla_sample_loop(
        unet_apply, params, x_init, embeds2, schedule,
        guidance_scale=7.5, frame_chunk=2,
    )

    m = mesh_lib.make_frames_mesh(n_dev)
    fsh = mesh_lib.frames_sharding(m)
    repl = mesh_lib.replicated(m)
    vloop = jax.jit(
        lambda p, x0, e2, sch: pipeline.vanilla_sample_loop(
            unet_apply, p, x0, e2, sch,
            guidance_scale=7.5, frame_chunk=None,
        ),
        in_shardings=(
            jax.tree.map(lambda _: repl, params), fsh, repl,
            jax.tree.map(lambda _: repl, schedule),
        ),
        out_shardings=fsh,
    )
    sharded = vloop(params, x_init, embeds2, schedule)
    assert sharded.sharding.is_equivalent_to(fsh, sharded.ndim)
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), rtol=5e-5, atol=5e-5
    )


def test_sharded_loop_window_straddling_shards(tiny):
    """BASELINE config-5 geometry class: frames/device NOT a multiple of
    window_size (120/8 dev = 15, window 8). Windows straddling shard
    boundaries must still match the single-device loop (GSPMD boundary
    gathers) — check_divisible warns instead of raising for this."""
    model, params, cfg, hw = tiny
    n_dev, ws, steps = 8, 4, 2
    f_total = 16  # 2 frames/device < window 4 -> every window straddles

    sched = ddim.make_schedule(steps)
    save_ts = sched.timesteps[::-1].copy()
    schedule = pipeline.make_edit_schedule(
        sched, save_ts, pnp_attn_t=0.5, pnp_f_t=0.8
    )
    rng = np.random.default_rng(3)
    x_init = jnp.asarray(
        rng.standard_normal((f_total, hw, hw, 4)), jnp.float32
    )
    traj = jnp.asarray(
        rng.standard_normal((steps, f_total, hw, hw, 4)), jnp.float32
    )
    embeds3 = jnp.asarray(
        rng.standard_normal((3, 7, cfg.cross_attention_dim)), jnp.float32
    )
    key = jax.random.PRNGKey(11)

    def unet_apply(p, sample, t, ctx, edit, **kw):
        return model.apply(p, sample, t, ctx, edit=edit, **kw)

    single = pipeline.tokenflow_sample_loop(
        unet_apply, params, x_init, traj, embeds3, schedule,
        window_size=ws, guidance_scale=7.5, pnp=True, rng=key,
    )
    m = mesh_lib.make_frames_mesh(n_dev)
    assert mesh_lib.check_divisible(f_total, m, ws) is False  # straddles
    loop = mesh_lib.sharded_edit_loop(
        unet_apply, params, schedule, m,
        window_size=ws, guidance_scale=7.5, pnp=True,
    )
    sharded = loop(params, x_init, traj, embeds3, key)
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), rtol=5e-5, atol=5e-5
    )


@pytest.mark.parametrize("ws", [2, 4])
def test_sharded_pivotal_pass_matches_single_device(tiny, ws):
    """shard_pivotal=True must not change outputs. ws=2 gives 8 pivots
    (even over 8 devices); ws=4 gives 4 pivots (batch 12 over 8 devices —
    GSPMD's internal padding path, the default config's 15-over-8 case)."""
    model, params, cfg, hw = tiny
    f_total, steps = 16, 2

    sched = ddim.make_schedule(steps)
    save_ts = sched.timesteps[::-1].copy()
    schedule = pipeline.make_edit_schedule(
        sched, save_ts, pnp_attn_t=0.5, pnp_f_t=0.8
    )
    rng = np.random.default_rng(3)
    x_init = jnp.asarray(
        rng.standard_normal((f_total, hw, hw, 4)), jnp.float32
    )
    traj = jnp.asarray(
        rng.standard_normal((steps, f_total, hw, hw, 4)), jnp.float32
    )
    embeds3 = jnp.asarray(
        rng.standard_normal((3, 7, cfg.cross_attention_dim)), jnp.float32
    )
    key = jax.random.PRNGKey(11)

    def unet_apply(p, sample, t, ctx, edit, **kw):
        return model.apply(p, sample, t, ctx, edit=edit, **kw)

    single = pipeline.tokenflow_sample_loop(
        unet_apply, params, x_init, traj, embeds3, schedule,
        window_size=ws, guidance_scale=7.5, pnp=True, rng=key,
    )

    m = mesh_lib.make_frames_mesh(8)
    loop = mesh_lib.sharded_edit_loop(
        unet_apply, params, schedule, m,
        window_size=ws, guidance_scale=7.5, pnp=True, shard_pivotal=True,
    )
    sharded = loop(params, x_init, traj, embeds3, key)
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), rtol=5e-5, atol=5e-5
    )


def test_sharded_pivotal_prop_approx_matches_single_device(tiny):
    """mesh + shard_pivotal + prop_approx + PnP: the approximate
    (source-free) propagation pass adds cache leaves (pivot_h_uncond and
    the rank-4 conv source features) that pipeline constrains under the
    pivotal shardings — the one sharded path no other test executed
    (the dryrun runs approx WITHOUT pivotal shardings). Sharded must
    match single-device."""
    model, params, cfg, hw = tiny
    f_total, steps, ws = 16, 2, 2

    sched = ddim.make_schedule(steps)
    save_ts = sched.timesteps[::-1].copy()
    schedule = pipeline.make_edit_schedule(
        sched, save_ts, pnp_attn_t=0.5, pnp_f_t=0.8
    )
    rng = np.random.default_rng(5)
    x_init = jnp.asarray(
        rng.standard_normal((f_total, hw, hw, 4)), jnp.float32
    )
    traj = jnp.asarray(
        rng.standard_normal((steps, f_total, hw, hw, 4)), jnp.float32
    )
    embeds3 = jnp.asarray(
        rng.standard_normal((3, 7, cfg.cross_attention_dim)), jnp.float32
    )
    key = jax.random.PRNGKey(13)

    def unet_apply(p, sample, t, ctx, edit, **kw):
        return model.apply(p, sample, t, ctx, edit=edit, **kw)

    single = pipeline.tokenflow_sample_loop(
        unet_apply, params, x_init, traj, embeds3, schedule,
        window_size=ws, guidance_scale=7.5, pnp=True, rng=key,
        prop_approx=True,
    )

    m = mesh_lib.make_frames_mesh(8)
    loop = mesh_lib.sharded_edit_loop(
        unet_apply, params, schedule, m,
        window_size=ws, guidance_scale=7.5, pnp=True, shard_pivotal=True,
        prop_approx=True,
    )
    sharded = loop(params, x_init, traj, embeds3, key)
    assert sharded.sharding.is_equivalent_to(
        mesh_lib.frames_sharding(m), sharded.ndim
    )
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), rtol=5e-5, atol=5e-5
    )


def test_sharded_inversion_matches_single_device(tiny):
    model, params, cfg, hw = tiny
    f_total, steps = 8, 4
    sched = ddim.make_schedule(steps)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(
        rng.standard_normal((f_total, hw, hw, 4)) * 0.3, jnp.float32
    )
    cond = jnp.asarray(
        rng.standard_normal((1, 7, cfg.cross_attention_dim)), jnp.float32
    )

    def eps_builder(p):
        def eps_fn(x, t):
            ctx = jnp.broadcast_to(cond, (x.shape[0], *cond.shape[1:]))
            return model.apply(p, x, t, ctx)[0]

        return eps_fn

    from tokenflow_tpu.diffusion import inversion

    xT_single, traj_single, _ = inversion.ddim_inversion(
        eps_builder(params), x0, sched, steps
    )

    m = mesh_lib.make_frames_mesh(8)
    fn = mesh_lib.sharded_inversion(eps_builder, params, sched, steps, m)
    xT_sh, traj_sh, _ = fn(x0)

    np.testing.assert_allclose(
        np.asarray(xT_single), np.asarray(xT_sh), rtol=5e-5, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(traj_single), np.asarray(traj_sh), rtol=5e-5, atol=5e-5
    )


def test_check_divisible_errors():
    m = mesh_lib.make_frames_mesh(8)
    with pytest.raises(ValueError, match="divide"):
        mesh_lib.check_divisible(12, m)
    # window misalignment is a perf warning, not an error (BASELINE
    # config 5: 120 frames / 8 devices / window 8 straddles shards)
    assert mesh_lib.check_divisible(8, m, window_size=2) is False
    assert mesh_lib.check_divisible(16, m, window_size=2) is True


def test_sharded_vae_decode_matches_single_device():
    """decode_latents(mesh=...) — frames-DP VAE (SURVEY §2.12) — must
    match the chunked single-device path."""
    import jax.numpy as jnp

    from tokenflow_tpu import runtime

    stack = runtime.load_stack(
        "tiny", init="random", dtype=jnp.float32, param_dtype=jnp.float32
    )
    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.standard_normal((8, 8, 8, 4)), jnp.float32)
    single = stack.decode_latents(z, batch=3)
    m = mesh_lib.make_frames_mesh(8)
    sharded = stack.decode_latents(z, mesh=m)
    assert sharded.sharding.is_equivalent_to(
        mesh_lib.frames_sharding(m), sharded.ndim
    )
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), rtol=2e-5, atol=2e-5
    )
    # encode path shares the machinery
    frames = jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 3)), jnp.float32)
    e_single = stack.encode_frames(frames, batch=3)
    e_sharded = stack.encode_frames(frames, mesh=m)
    np.testing.assert_allclose(
        np.asarray(e_single), np.asarray(e_sharded), rtol=2e-5, atol=2e-5
    )


def test_segmented_checkpoint_resume_on_mesh(tiny, tmp_path):
    """Round-4 features under a mesh (VERDICT r04 weak #5): a segmented,
    CHECKPOINTED edit on the 8-device harness, killed between dispatches
    and resumed — the restored host-round-tripped carry must re-shard
    through the in_shardings-pinned loop and land bitwise on the
    uninterrupted run."""
    import types

    from tokenflow_tpu.cli import common

    model, params, cfg, hw = tiny
    n_dev, ws, steps = 8, 2, 2
    f_total = n_dev * ws

    sched = ddim.make_schedule(steps)
    schedule = pipeline.make_edit_schedule(
        sched, sched.timesteps[::-1].copy(), pnp_attn_t=0.5, pnp_f_t=0.8
    )
    rng = np.random.default_rng(3)
    x_init = np.asarray(
        rng.standard_normal((f_total, hw, hw, 4)), np.float32
    )
    traj = jnp.asarray(
        rng.standard_normal((steps, f_total, hw, hw, 4)), jnp.float32
    )
    embeds3 = jnp.asarray(
        rng.standard_normal((3, 7, cfg.cross_attention_dim)), jnp.float32
    )
    key = jax.random.PRNGKey(11)
    pivots = np.asarray(
        pipeline.choose_pivots(key, steps, f_total // ws, ws)
    )

    def unet_apply(p, sample, t, ctx, edit, **kw):
        return model.apply(p, sample, t, ctx, edit=edit, **kw)

    stack = types.SimpleNamespace(unet_apply=unet_apply, unet_params=params)
    config = {
        "batch_size": ws,
        "guidance_scale": 7.5,
        "steps_per_dispatch": 1,  # 2 dispatches of 1 step
        "checkpoint_edit": True,
        "output_path": str(tmp_path),
        "n_frames": f_total,
        "n_timesteps": steps,
        "seed": 1,
        "prompt": "mesh resume",
    }
    m = mesh_lib.make_frames_mesh(n_dev)
    loop = common.build_edit_loop(
        stack, config, pnp=True, rng=key, mesh=m, schedule=schedule
    )
    segments = common.schedule_segments(config, schedule, pivots)
    assert len(segments) == 2

    def step_fn(x, sched_seg, piv_seg):
        return loop(
            params, x, traj, embeds3, jnp.asarray(piv_seg), sched_seg, None
        )

    # uninterrupted segmented run (no checkpointing side effects)
    cfg_plain = dict(config, checkpoint_edit=False)
    expected = np.asarray(
        common.run_segmented_edit(
            cfg_plain, segments, step_fn, jnp.asarray(x_init)
        )
    )

    # killed run: dispatch 0 completes (checkpoint written), then die
    calls = {"n": 0}

    def killing_step(x, sched_seg, piv_seg):
        if calls["n"] == 1:
            raise RuntimeError("simulated kill between dispatches")
        calls["n"] += 1
        return step_fn(x, sched_seg, piv_seg)

    with pytest.raises(RuntimeError, match="simulated kill"):
        common.run_segmented_edit(
            config, segments, killing_step, jnp.asarray(x_init)
        )
    ckpt = tmp_path / "edit_checkpoint.npz"
    assert ckpt.exists()

    # resumed run: must restore the carry, re-shard it over the mesh,
    # and finish from dispatch 2/2
    resumed = common.run_segmented_edit(
        config, segments, step_fn, jnp.asarray(x_init)
    )
    assert resumed.sharding.is_equivalent_to(
        mesh_lib.frames_sharding(m), resumed.ndim
    )
    np.testing.assert_array_equal(expected, np.asarray(resumed))
    assert not ckpt.exists()  # consumed on completion
