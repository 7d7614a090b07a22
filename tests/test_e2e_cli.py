"""End-to-end CLI tests on the weightless tiny stack: preprocess ->
PnP edit -> SDEdit edit, exercising the full two-stage filesystem contract
(SURVEY.md §1 L5->L1 interface) without pretrained weights."""

import os

import numpy as np
import pytest
from PIL import Image

from tokenflow_tpu.cli import preprocess as preprocess_cli
from tokenflow_tpu.cli import run_pnp, run_sdedit
from tokenflow_tpu.cli.common import load_config

F, HW, STEPS, SAVE_STEPS, N_TIMESTEPS = 4, 64, 8, 4, 4


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data = root / "data" / "clip"
    data.mkdir(parents=True)
    rng = np.random.default_rng(0)
    base = rng.integers(40, 210, (HW, HW, 3), dtype=np.uint8)
    for i in range(F):
        img = np.roll(base, shift=2 * i, axis=1)  # gentle horizontal motion
        Image.fromarray(img).save(data / f"{i:05d}.png")
    return root


@pytest.fixture(scope="module")
def inverted(workdir):
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        opt = preprocess_cli.build_parser().parse_args(
            [
                "--data_path", "data/clip",
                "--H", str(HW), "--W", str(HW),
                "--sd_version", "tiny",
                "--steps", str(STEPS),
                "--save_steps", str(SAVE_STEPS),
                "--n_frames", str(F),
                "--batch_size", str(F),
                "--inversion_prompt", "a test clip",
                "--export_pt",
                # segmented dispatch (planner picks the divisor: 8 @ <=3
                # -> 4x2, one shared program); identical math to one
                # dispatch — tests/test_pipeline.py proves the parity,
                # this exercises the CLI wiring
                "--steps_per_dispatch", "3",
                # segmented VAE dispatch (4 frames @ <=3 -> 2x2): CLI
                # wiring of SDStack frames_per_dispatch (parity proven in
                # tests/test_runtime.py)
                "--frames_per_dispatch", "3",
            ]
        )
        result = preprocess_cli.run(opt)
    finally:
        os.chdir(cwd)
    return workdir, result


@pytest.mark.slow
def test_preprocess_artifacts(inverted):
    workdir, result = inverted
    sp = workdir / result["save_path"]
    assert (sp / "latents" / "trajectory.npz").exists()
    # reference-compat export
    pts = list((sp / "latents").glob("noisy_latents_*.pt"))
    assert len(pts) == SAVE_STEPS + 1  # save grid + final endpoint
    assert (sp / "inversion_prompt.txt").read_text() == "a test clip"
    assert (sp / "inverted.mp4").exists()
    assert (sp / "frames" / "00000.png").exists()
    assert (workdir / "latents" / "inversion_prompts.yaml").exists()
    z = np.load(sp / "latents" / "trajectory.npz")
    assert z["traj"].shape[0] == SAVE_STEPS
    assert z["traj"].shape[1] == F


@pytest.mark.slow
def test_pnp_edit_e2e(inverted, tmp_path):
    workdir, _ = inverted
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        config = {
            "seed": 1,
            "device": "cpu",
            "output_path": "results",
            "data_path": "data/clip",
            "latents_path": "latents",
            "n_inversion_steps": STEPS,
            "n_frames": F,
            "sd_version": "tiny",
            "guidance_scale": 7.5,
            "n_timesteps": N_TIMESTEPS,
            "prompt": "a stylized test clip",
            "negative_prompt": "ugly",
            "batch_size": 2,
            "pnp_attn_t": 0.5,
            "pnp_f_t": 0.8,
            "image_size": HW,
            # 4 steps @ <=3/dispatch (planner -> 2x2) — CLI wiring of
            # pipeline.split_schedule + utils.plan_seg_len
            "steps_per_dispatch": 3,
            # VAE decode in 2x2-frame dispatches — CLI wiring of
            # frames_per_dispatch
            "frames_per_dispatch": 3,
        }
        config = run_pnp.resolve_output_path(config)
        os.makedirs(config["output_path"], exist_ok=True)
        from tokenflow_tpu.cli.common import dump_config

        dump_config(config)
        decoded = run_pnp.edit_video(config)
        out = config["output_path"]
        assert decoded.shape == (F, HW, HW, 3)
        assert np.isfinite(decoded).all()
        for name in (
            "img_ode/00000.png",
            "tokenflow_PnP_fps_10.mp4",
            "vae_recon_10.mp4",
            "input_fps10.mp4",
            "config.yaml",
        ):
            assert os.path.exists(os.path.join(out, name)), name
    finally:
        os.chdir(cwd)


@pytest.mark.slow
def test_pnp_edit_e2e_data_parallel(inverted):
    """Same edit through the CLI with the frames mesh engaged
    (data_parallel: 2 -> 2 frames/device incl. the sharded pivotal pass);
    must produce identical artifacts to a single-device run."""
    workdir, _ = inverted
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        config = {
            "seed": 1,
            "device": "cpu",
            "output_path": "results_dp",
            "data_path": "data/clip",
            "latents_path": "latents",
            "n_inversion_steps": STEPS,
            "n_frames": F,
            "sd_version": "tiny",
            "guidance_scale": 7.5,
            "n_timesteps": N_TIMESTEPS,
            "prompt": "a stylized test clip",
            "negative_prompt": "ugly",
            "batch_size": 2,
            "pnp_attn_t": 0.5,
            "pnp_f_t": 0.8,
            "image_size": HW,
            "data_parallel": 2,
        }
        config = run_pnp.resolve_output_path(config)
        os.makedirs(config["output_path"], exist_ok=True)
        from tokenflow_tpu.cli.common import dump_config

        dump_config(config)
        from tokenflow_tpu.cli.common import DISPATCH_FLAGS

        env_before = {k: os.environ.get(k) for k in DISPATCH_FLAGS}
        decoded_dp = run_pnp.edit_video(config)
        assert decoded_dp.shape == (F, HW, HW, 3)
        assert np.isfinite(decoded_dp).all()
        # the mesh-tuned kernel-dispatch env flags must not leak into
        # later runs in this process (ADVICE round-2: the single-device
        # run below used to inherit them)
        env_after = {k: os.environ.get(k) for k in DISPATCH_FLAGS}
        assert env_after == env_before, (env_before, env_after)

        single = dict(config, data_parallel="off", output_path="results_1dev")
        single = run_pnp.resolve_output_path(single)
        os.makedirs(single["output_path"], exist_ok=True)
        dump_config(single)
        decoded_1 = run_pnp.edit_video(single)
        np.testing.assert_allclose(
            decoded_dp, decoded_1, rtol=2e-4, atol=2e-4
        )
    finally:
        os.chdir(cwd)


@pytest.mark.slow
def test_sdedit_edit_e2e(inverted):
    workdir, _ = inverted
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        config = {
            "seed": 1,
            "device": "cpu",
            "output_path": "results",
            "data_path": "data/clip",
            "latents_path": "latents",
            "n_inversion_steps": STEPS,
            "n_frames": F,
            "sd_version": "tiny",
            "guidance_scale": 7.5,
            "n_timesteps": N_TIMESTEPS,
            "prompt": "a stylized test clip",
            "negative_prompt": "ugly",
            "batch_size": 2,
            "start": 0.9,
            "use_ddim_noise": True,
            "image_size": HW,
        }
        config = run_sdedit.resolve_output_path(config)
        # exact reference output-dir encoding, including the unformatted
        # float in `start_{start}` (run_tokenflow_sdedit.py:274-278)
        assert config["output_path"] == os.path.join(
            "results_sdedit", "clip", "a stylized test clip",
            "batch_size_2", f"{N_TIMESTEPS}start_0.9",
        )
        os.makedirs(config["output_path"], exist_ok=True)
        from tokenflow_tpu.cli import common as cli_common

        cli_common.dump_config(config)
        import yaml

        with open(os.path.join(config["output_path"], "config.yaml")) as f:
            echoed = yaml.safe_load(f)
        assert echoed["start"] == 0.9 and echoed["prompt"] == config["prompt"]
        decoded = run_sdedit.edit_video(config)
        assert decoded.shape == (F, HW, HW, 3)
        assert np.isfinite(decoded).all()
        assert os.path.exists(
            os.path.join(config["output_path"], "tokenflow_SDEdit_fps_10.mp4")
        )
    finally:
        os.chdir(cwd)


def test_validate_config_errors():
    from tokenflow_tpu.cli.common import validate_config

    import pytest as _pytest

    with _pytest.raises(KeyError, match="missing required"):
        validate_config({"seed": 1}, "pnp")
    base = {
        k: 1
        for k in (
            "seed output_path data_path latents_path n_frames sd_version "
            "guidance_scale n_timesteps prompt negative_prompt batch_size "
            "n_inversion_steps pnp_attn_t pnp_f_t"
        ).split()
    }
    validate_config(dict(base), "pnp")  # ok
    with _pytest.raises(ValueError, match="propagate_chunk"):
        validate_config({**base, "batch_size": 2, "propagate_chunk": 3}, "pnp")


def test_run_segmented_edit_checkpoint_resume(tmp_path):
    """Helper-level contract: an interrupted checkpointed edit resumes at
    the completed-dispatch boundary and equals the uninterrupted run; the
    checkpoint never survives completion and never seeds a different
    config (fingerprint guard)."""
    import types

    import jax.numpy as jnp

    from tokenflow_tpu.cli import common

    config = {
        "seed": 1, "sd_version": "tiny", "prompt": "p",
        "negative_prompt": "n", "n_frames": 2, "n_timesteps": 4,
        "batch_size": 2, "guidance_scale": 7.5,
        "output_path": str(tmp_path), "checkpoint_edit": True,
    }
    segments = [
        (types.SimpleNamespace(timesteps=np.arange(1)), None)
        for _ in range(4)
    ]
    x0 = jnp.arange(4.0)
    calls = []

    def step_fn(x, sched_seg, piv):
        calls.append(1)
        return x * 2 + 1

    expected = np.asarray(
        common.run_segmented_edit(
            {**config, "checkpoint_edit": False}, segments, step_fn, x0
        )
    )
    ckpt = tmp_path / "edit_checkpoint.npz"

    def failing_step_fn(x, sched_seg, piv):
        if len(calls) == 2:
            raise RuntimeError("simulated kill")
        return step_fn(x, sched_seg, piv)

    calls.clear()
    with pytest.raises(RuntimeError, match="simulated kill"):
        common.run_segmented_edit(config, segments, failing_step_fn, x0)
    assert ckpt.exists()  # 2 dispatches done, carry saved

    calls.clear()
    out = np.asarray(
        common.run_segmented_edit(config, segments, step_fn, x0)
    )
    assert len(calls) == 2  # resumed: only the 2 remaining dispatches ran
    np.testing.assert_array_equal(out, expected)
    assert not ckpt.exists()  # removed on completion

    # a checkpoint from a DIFFERENT config must be ignored, not consumed
    calls.clear()
    with pytest.raises(RuntimeError):
        common.run_segmented_edit(
            config, segments, failing_step_fn, x0
        )
    assert ckpt.exists()
    calls.clear()
    common.run_segmented_edit(
        {**config, "prompt": "different"}, segments, step_fn, x0
    )
    assert len(calls) == 4  # fingerprint mismatch -> started from scratch


def test_edit_checkpoint_input_data_identity(tmp_path):
    """A checkpoint must never seed a rerun against a DIFFERENT source
    video/latents dir or start-latent geometry even when every config
    hyperparameter matches (ADVICE r03: _edit_fingerprint previously
    omitted the input-data identity)."""
    import types

    import jax.numpy as jnp

    from tokenflow_tpu.cli import common

    config = {
        "seed": 1, "sd_version": "tiny", "prompt": "p",
        "negative_prompt": "n", "n_frames": 2, "n_timesteps": 4,
        "batch_size": 2, "guidance_scale": 7.5,
        "data_path": "data/video_a", "latents_path": "latents",
        "output_path": str(tmp_path), "checkpoint_edit": True,
    }
    segments = [
        (types.SimpleNamespace(timesteps=np.arange(1)), None)
        for _ in range(3)
    ]
    x0 = jnp.arange(4.0)
    calls = []

    def failing_step_fn(x, sched_seg, piv):
        calls.append(1)
        if len(calls) == 2:
            raise RuntimeError("simulated kill")
        return x + 1

    def step_fn(x, sched_seg, piv):
        calls.append(1)
        return x + 1

    with pytest.raises(RuntimeError):
        common.run_segmented_edit(config, segments, failing_step_fn, x0)
    assert (tmp_path / "edit_checkpoint.npz").exists()

    # same prompt/seed/schedule, different source video: must NOT resume
    calls.clear()
    common.run_segmented_edit(
        {**config, "data_path": "data/video_b"}, segments, step_fn, x0
    )
    assert len(calls) == 3

    # different start-latent geometry: must NOT resume either
    with pytest.raises(RuntimeError):
        calls.clear()
        common.run_segmented_edit(config, segments, failing_step_fn, x0)
    calls.clear()
    common.run_segmented_edit(
        config, segments, step_fn, jnp.arange(8.0)
    )
    assert len(calls) == 3


def test_segment_checkpointer_unreadable_file(tmp_path, capsys):
    """A truncated/corrupt checkpoint (kill mid-write before the atomic
    rename existed, disk corruption) degrades to a restart from step 0
    instead of crashing inside np.load (ADVICE r03)."""
    import jax.numpy as jnp

    from tokenflow_tpu.cli import common

    path = tmp_path / "ck.npz"
    path.write_bytes(b"PK\x03\x04 this is not a real npz")
    ck = common.SegmentCheckpointer(str(path), "fp", True)
    carry = (jnp.arange(3.0),)
    done, restored = ck.resume(carry, 4)
    assert done == 0
    assert restored is carry
    assert "unreadable" in capsys.readouterr().out

    # saves go through a tmp file + atomic rename; the final path is
    # always a loadable npz afterwards
    ck.save(0, 4, carry)
    assert not list(tmp_path.glob("*.tmp.npz"))
    done, (r,) = ck.resume(carry, 4)
    assert done == 1
    np.testing.assert_array_equal(np.asarray(r), np.arange(3.0))


def test_segment_checkpointer_save_cadence(tmp_path):
    """checkpoint_every=N persists only every Nth dispatch boundary (each
    write is a host sync + a potentially multi-GB npz); resume restarts
    from the last SAVED boundary."""
    import jax.numpy as jnp

    from tokenflow_tpu.cli import common

    path = tmp_path / "ck.npz"
    ck = common.SegmentCheckpointer(str(path), "fp", True, every=2)
    carry = (jnp.arange(2.0),)
    ck.save(0, 5, carry)  # boundary 1: skipped
    assert not path.exists()
    ck.save(1, 5, carry)  # boundary 2: saved
    assert ck.resume(carry, 5)[0] == 2
    ck.save(2, 5, carry)  # boundary 3: skipped — checkpoint stays at 2
    assert ck.resume(carry, 5)[0] == 2
    ck.save(4, 5, carry)  # final segment: never persisted
    assert ck.resume(carry, 5)[0] == 2


def test_segment_checkpointer_appended_delta(tmp_path, monkeypatch):
    """Append-tracked carries (round 5, SegmentCheckpointer.save
    ``appended``): the checkpointer pulls from the device ONLY the
    trajectory rows added since its last transfer, yet writes an npz
    bitwise-identical to the full-pull path — across plain saves, cadence
    skips, and a mid-run resume (the config-5 finding this fixes: a full
    ~0.44 GB carry pull per dispatch made the checkpointed inversion 5x
    slower than the un-checkpointed reconstruction, PERF.md round 5)."""
    import jax
    import jax.numpy as jnp

    from tokenflow_tpu.cli import common

    rng = np.random.default_rng(0)
    vals = rng.standard_normal((6, 4)).astype(np.float32)

    def carry_at(i):  # after segment i: save-grid rows [0, i+2) filled
        hi = i + 2
        t = np.zeros_like(vals)
        t[:hi] = vals[:hi]
        return (jnp.asarray([float(i)]), jnp.asarray(t)), hi

    pulled = []
    orig = jax.device_get

    def spy(a):
        out = orig(a)
        pulled.append(int(np.asarray(out).size))
        return out

    monkeypatch.setattr(jax, "device_get", spy)

    pa, pb = tmp_path / "full.npz", tmp_path / "delta.npz"
    ck_full = common.SegmentCheckpointer(str(pa), "fp", True)
    ck_delta = common.SegmentCheckpointer(str(pb), "fp", True)
    for i in range(3):
        carry, hi = carry_at(i)
        ck_full.save(i, 9, carry)
        pulled.clear()
        ck_delta.save(i, 9, carry, appended={1: hi})
        # carry 0 (1 elem, untracked) fully + ONLY the new rows of carry 1
        new_rows = hi - (i + 1 if i else 0)
        assert sorted(pulled) == sorted([1, new_rows * vals.shape[1]])
        with np.load(pa) as fa, np.load(pb) as fb:
            assert set(fa.files) == set(fb.files)
            for k in fa.files:
                np.testing.assert_array_equal(fa[k], fb[k])

    # resume into a FRESH checkpointer (empty mirror): the first delta
    # save must rebuild the full valid prefix once, then go incremental
    ck2 = common.SegmentCheckpointer(str(pb), "fp", True)
    done, _ = ck2.resume(carry_at(2)[0], 9)
    assert done == 3
    carry, hi = carry_at(3)
    pulled.clear()
    ck2.save(3, 9, carry, appended={1: hi})
    assert max(pulled) == hi * vals.shape[1]  # full prefix, once
    carry, hi = carry_at(4)
    pulled.clear()
    ck2.save(4, 9, carry, appended={1: hi})
    assert max(pulled) == vals.shape[1]  # back to one-row deltas
    ck_full.save(3, 9, carry_at(3)[0])
    ck_full.save(4, 9, carry_at(4)[0])
    with np.load(pa) as fa, np.load(pb) as fb:
        for k in fa.files:
            np.testing.assert_array_equal(fa[k], fb[k])

    # cadence skip: nothing transfers on the skipped boundary; the next
    # save pulls the union of the skipped rows
    pc = tmp_path / "cad.npz"
    ck3 = common.SegmentCheckpointer(str(pc), "fp", True, every=2)
    carry, hi = carry_at(0)
    pulled.clear()
    ck3.save(0, 9, carry, appended={1: hi})  # boundary 1: skipped
    assert not pulled and not pc.exists()
    carry, hi = carry_at(1)
    ck3.save(1, 9, carry, appended={1: hi})  # saved: rows [0, 3) at once
    assert max(pulled) == hi * vals.shape[1]
    with np.load(pc) as fc:
        np.testing.assert_array_equal(fc["carry_1"], carry_at(1)[0][1])

    # done(): removes the checkpoint AND releases the delta-save host
    # mirrors (~0.9 GB at config-5 scale — the checkpointer object
    # outlives the loop it guarded)
    ck3.done()
    assert not pc.exists()
    assert not ck3._mirror and not ck3._synced


@pytest.mark.slow
def test_preprocess_inversion_checkpoint_resume(inverted, monkeypatch):
    """--checkpoint_inversion: kill preprocess mid-inversion, rerun, and
    get the exact trajectory of the uninterrupted run (the fixture's)."""
    workdir, result = inverted
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        from tokenflow_tpu.cli import common

        args = [
            "--data_path", "data/clip",
            "--H", str(HW), "--W", str(HW),
            "--sd_version", "tiny",
            "--steps", str(STEPS),
            "--save_steps", str(SAVE_STEPS),
            "--n_frames", str(F),
            "--batch_size", str(F),
            "--inversion_prompt", "a test clip",
            "--steps_per_dispatch", "3",
            "--save_dir", "latents_ckpt",
            "--checkpoint_inversion",
            "--skip_reconstruction",
        ]
        orig_save = common.SegmentCheckpointer.save

        def bombed_save(self, i, n, carry, **kw):
            orig_save(self, i, n, carry, **kw)
            if i == 0:
                raise RuntimeError("simulated kill")

        monkeypatch.setattr(common.SegmentCheckpointer, "save", bombed_save)
        opt = preprocess_cli.build_parser().parse_args(args)
        with pytest.raises(RuntimeError, match="simulated kill"):
            preprocess_cli.run(opt)
        sp = None
        ckpts = list(
            (workdir / "latents_ckpt").rglob("inversion_checkpoint.npz")
        )
        assert len(ckpts) == 1  # dispatch 1 of 4 done, carry saved

        monkeypatch.setattr(common.SegmentCheckpointer, "save", orig_save)
        result2 = preprocess_cli.run(
            preprocess_cli.build_parser().parse_args(args)
        )
        sp = workdir / result2["save_path"]
        assert not (sp / "inversion_checkpoint.npz").exists()

        base = np.load(
            workdir / result["save_path"] / "latents" / "trajectory.npz"
        )
        resumed = np.load(sp / "latents" / "trajectory.npz")
        np.testing.assert_array_equal(resumed["traj"], base["traj"])
        np.testing.assert_array_equal(resumed["final"], base["final"])
    finally:
        os.chdir(cwd)


@pytest.mark.slow
def test_inversion_checkpoint_resume_save_grid_holes(inverted, monkeypatch):
    """Delta checkpointing with a save grid that is NOT a subset of the
    inversion grid: steps=10/save_steps=4 fills slots {0, 2} and leaves
    slot 1 a permanent hole (ddim.save_grid), so the valid-prefix length
    is max(slot)+1, not the mask count — counting mask hits undercounts
    past the hole, drops the written row above it from the checkpoint,
    and the resumed trajectory silently loses it. Kill right after the
    dispatch that wrote slot 2, resume, and demand the uninterrupted
    run's exact trajectory."""
    workdir, _ = inverted
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        from tokenflow_tpu.cli import common

        def args(save_dir, *extra):
            return [
                "--data_path", "data/clip",
                "--H", str(HW), "--W", str(HW),
                "--sd_version", "tiny",
                "--steps", "10",
                "--save_steps", "4",
                "--n_frames", str(F),
                "--batch_size", str(F),
                "--inversion_prompt", "a test clip",
                # 10 steps @ <=3/dispatch -> 5x2; the slot-2 save (step
                # index 5) lands in dispatch 2 with the hole below it
                "--steps_per_dispatch", "3",
                "--save_dir", save_dir,
                "--skip_reconstruction",
                *extra,
            ]

        base = preprocess_cli.run(
            preprocess_cli.build_parser().parse_args(args("latents_hole"))
        )

        orig_save = common.SegmentCheckpointer.save

        def bombed_save(self, i, n, carry, **kw):
            orig_save(self, i, n, carry, **kw)
            if i == 2:  # right after the dispatch that wrote slot 2
                raise RuntimeError("simulated kill")

        monkeypatch.setattr(common.SegmentCheckpointer, "save", bombed_save)
        ckpt_args = args("latents_hole_ck", "--checkpoint_inversion")
        with pytest.raises(RuntimeError, match="simulated kill"):
            preprocess_cli.run(preprocess_cli.build_parser().parse_args(ckpt_args))
        monkeypatch.setattr(common.SegmentCheckpointer, "save", orig_save)
        resumed = preprocess_cli.run(
            preprocess_cli.build_parser().parse_args(ckpt_args)
        )

        a = np.load(workdir / base["save_path"] / "latents" / "trajectory.npz")
        b = np.load(
            workdir / resumed["save_path"] / "latents" / "trajectory.npz"
        )
        np.testing.assert_array_equal(b["traj"], a["traj"])
        np.testing.assert_array_equal(b["final"], a["final"])
        # the written-above-a-hole row is real data, the hole stays zero
        assert np.abs(b["traj"][2]).sum() > 0
        assert np.abs(b["traj"][1]).sum() == 0
    finally:
        os.chdir(cwd)


@pytest.mark.slow
def test_pnp_edit_checkpoint_resume_e2e(inverted, monkeypatch):
    """CLI-level resume: kill the edit mid-dispatch-plan, rerun the same
    config, and get the exact output of an uninterrupted run (the carry
    round-trips through edit_checkpoint.npz bitwise)."""
    workdir, _ = inverted
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        from tokenflow_tpu.cli import common

        config = {
            "seed": 1,
            "device": "cpu",
            "output_path": "results_ckpt",
            "data_path": "data/clip",
            "latents_path": "latents",
            "n_inversion_steps": STEPS,
            "n_frames": F,
            "sd_version": "tiny",
            "guidance_scale": 7.5,
            "n_timesteps": N_TIMESTEPS,
            "prompt": "a stylized test clip",
            "negative_prompt": "ugly",
            "batch_size": 2,
            "pnp_attn_t": 0.5,
            "pnp_f_t": 0.8,
            "image_size": HW,
            "steps_per_dispatch": 1,  # 4 dispatches
            "checkpoint_edit": True,
        }
        config = run_pnp.resolve_output_path(config)
        os.makedirs(config["output_path"], exist_ok=True)
        baseline = run_pnp.edit_video(
            {**config, "checkpoint_edit": False}
        )

        orig = common.run_segmented_edit
        state = {"calls": 0}

        def interrupted(cfg, segments, step_fn, x_init):
            def wrapped(x, s, p):
                state["calls"] += 1
                if state["calls"] == 3:
                    raise RuntimeError("simulated kill")
                return step_fn(x, s, p)

            return orig(cfg, segments, wrapped, x_init)

        monkeypatch.setattr(common, "run_segmented_edit", interrupted)
        with pytest.raises(RuntimeError, match="simulated kill"):
            run_pnp.edit_video(config)
        ckpt = os.path.join(config["output_path"], "edit_checkpoint.npz")
        assert os.path.exists(ckpt)
        monkeypatch.setattr(common, "run_segmented_edit", orig)

        decoded = run_pnp.edit_video(config)
        assert not os.path.exists(ckpt)
        np.testing.assert_array_equal(decoded, baseline)
    finally:
        os.chdir(cwd)


@pytest.mark.slow
def test_preprocess_then_edit_one_process(tmp_path, monkeypatch):
    """``preprocess --then_edit <pnp yaml>`` runs the full two-stage
    pipeline in ONE process: the editor reuses the preprocess stack
    (runtime.load_stack cache — exactly one stack build) and the edit
    program is prewarmed during the inversion (--then_edit implies
    --prewarm_edit_config). On the real runtime this saves a TPU-claim
    handshake (16 s–10 min) vs the reference's two-process workflow."""
    import yaml

    from tokenflow_tpu import runtime

    data = tmp_path / "data" / "clip"
    data.mkdir(parents=True)
    rng = np.random.default_rng(3)
    base = rng.integers(40, 210, (HW, HW, 3), dtype=np.uint8)
    for i in range(F):
        Image.fromarray(np.roll(base, 2 * i, axis=1)).save(
            data / f"{i:05d}.png"
        )
    cfg = {
        "seed": 1,
        "output_path": "results_chain",
        "data_path": "data/clip",
        "latents_path": "latents",
        "n_inversion_steps": STEPS,
        "n_frames": F,
        "sd_version": "tiny",
        "guidance_scale": 7.5,
        "n_timesteps": N_TIMESTEPS,
        "prompt": "a stylized test clip",
        "negative_prompt": "ugly",
        "batch_size": 2,
        "pnp_attn_t": 0.5,
        "pnp_f_t": 0.8,
        "image_size": HW,
    }
    (tmp_path / "config_chain.yaml").write_text(yaml.safe_dump(cfg))

    runtime.clear_stack_cache()
    builds = []
    orig_build = runtime._build_stack

    def counting_build(*a, **kw):
        builds.append(a[0] if a else kw.get("sd_version"))
        return orig_build(*a, **kw)

    monkeypatch.setattr(runtime, "_build_stack", counting_build)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        preprocess_cli.main(
            [
                "--data_path", "data/clip",
                "--H", str(HW), "--W", str(HW),
                "--sd_version", "tiny",
                "--steps", str(STEPS),
                "--save_steps", str(SAVE_STEPS),
                "--n_frames", str(F),
                "--batch_size", str(F),
                "--inversion_prompt", "a test clip",
                "--skip_reconstruction",
                "--then_edit", "config_chain.yaml",
            ]
        )
        # the editor ran, resolved its hyperparameter output dir, and
        # produced the full artifact tree
        out = os.path.join(
            "results_chain_pnp_SD_tiny", "clip",
            "a stylized test clip", "attn_0.5_f_0.8", "batch_size_2",
            str(N_TIMESTEPS),
        )
        for name in (
            "img_ode/00000.png",
            "tokenflow_PnP_fps_10.mp4",
            "config.yaml",
            "metrics.json",
        ):
            assert os.path.exists(os.path.join(out, name)), name
        # one process, one stack: the editor hit the cache
        assert builds == ["tiny"]
    finally:
        os.chdir(cwd)
        runtime.clear_stack_cache()


def test_then_edit_wrong_family_fails_at_parse_time(tmp_path):
    """A --then_edit config whose editor family cannot be inferred must
    fail BEFORE the inversion runs (at parse time), not after a
    multi-minute stage 1 — main() runs the same three-way inference
    run_then_edit uses (infer_editor_family)."""
    import yaml

    bad = tmp_path / "config_bad.yaml"
    # neither pnp_attn_t, nor start, nor a ControlNet sd_version
    bad.write_text(yaml.safe_dump({"sd_version": "tiny", "pnp_attn": 0.5}))
    with pytest.raises(ValueError, match="cannot infer the editor family"):
        preprocess_cli.main(
            [
                "--data_path", str(tmp_path / "missing"),
                "--sd_version", "tiny",
                "--then_edit", str(bad),
            ]
        )

    # the three families resolve without touching any editor module
    assert preprocess_cli.infer_editor_family({"pnp_attn_t": 0.5}, "p") == "pnp"
    assert preprocess_cli.infer_editor_family({"start": 0.9}, "s") == "sdedit"
    assert (
        preprocess_cli.infer_editor_family({"sd_version": "ControlNet"}, "c")
        == "controlnet"
    )


def test_then_edit_family_dispatch(tmp_path, monkeypatch):
    """run_then_edit routes each inferred family to its editor CLI with
    --config_path (the PnP chain is exercised end-to-end by
    test_preprocess_then_edit_one_process; here the SDEdit and ControlNet
    routes are asserted with mocked editor mains)."""
    import yaml

    from tokenflow_tpu.cli import run_controlnet, run_sdedit

    calls = []
    monkeypatch.setattr(
        run_sdedit, "main", lambda argv: calls.append(("sdedit", argv))
    )
    monkeypatch.setattr(
        run_controlnet, "main", lambda argv: calls.append(("controlnet", argv))
    )

    sd = tmp_path / "sdedit.yaml"
    sd.write_text(yaml.safe_dump({"start": 0.9}))
    preprocess_cli.run_then_edit(str(sd))
    cn = tmp_path / "controlnet.yaml"
    cn.write_text(yaml.safe_dump({"sd_version": "tiny-controlnet"}))
    preprocess_cli.run_then_edit(str(cn))
    assert calls == [
        ("sdedit", ["--config_path", str(sd)]),
        ("controlnet", ["--config_path", str(cn)]),
    ]


@pytest.mark.slow
def test_setup_editor_defaults_missing_image_size(inverted, monkeypatch):
    """Reference-parity editor configs carry NO image_size key (the
    reference hardcodes 512 in its frame loader, preprocess.py:191-192;
    its run configs never set it). setup_editor must default to 512
    end-to-end — round-5 regression: the decode compile-ahead geometry
    read config["image_size"] unconditionally and KeyError'd on every
    shipped config before reaching the (backend-gated) prewarm call."""
    from tokenflow_tpu.cli import common as cli_common

    workdir, _ = inverted
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        seen = {}
        real_load = cli_common.video_io.load_frames

        def spy_load(frames_dir, n_frames, resize_square=512):
            # record the requested default, keep the tiny fixture
            # geometry so the trajectory/eps shapes still line up
            seen["resize_square"] = resize_square
            return real_load(frames_dir, n_frames, resize_square=HW)

        monkeypatch.setattr(cli_common.video_io, "load_frames", spy_load)
        config = {
            "seed": 1,
            "output_path": "results_no_imgsize",
            "data_path": "data/clip",
            "latents_path": "latents",
            "n_inversion_steps": STEPS,
            "n_frames": F,
            "sd_version": "tiny",
            "guidance_scale": 7.5,
            "n_timesteps": N_TIMESTEPS,
            "prompt": "a stylized test clip",
            "negative_prompt": "ugly",
            "batch_size": 2,
            # deliberately no "image_size"
        }
        os.makedirs(config["output_path"], exist_ok=True)
        data = cli_common.setup_editor(config)
        assert seen["resize_square"] == 512
        # geometry must still line up with the inverted trajectory
        assert data.latents.shape == data.trajectory.final.shape
        assert np.isfinite(np.asarray(data.eps, np.float32)).all()
    finally:
        os.chdir(cwd)


@pytest.mark.slow
def test_python_api_edit(inverted):
    """High-level api.edit_pnp on the already-inverted fixture."""
    workdir, _ = inverted
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        from tokenflow_tpu import api

        config = {
            "seed": 1,
            "output_path": "results_api",
            "data_path": "data/clip",
            "latents_path": "latents",
            "n_inversion_steps": STEPS,
            "n_frames": F,
            "sd_version": "tiny",
            "guidance_scale": 7.5,
            "n_timesteps": N_TIMESTEPS,
            "prompt": "another test edit",
            "negative_prompt": "ugly",
            "batch_size": 2,
            "pnp_attn_t": 0.5,
            "pnp_f_t": 0.8,
            "image_size": HW,
        }
        decoded = api.edit_pnp(config)
        assert decoded.shape == (F, HW, HW, 3)
        assert os.path.exists("results_api/metrics.json")
    finally:
        os.chdir(cwd)


@pytest.mark.slow
def test_controlnet_edit_e2e(workdir):
    """Full two-stage ControlNet flow on the tiny stack (VERDICT r1 #5):
    preprocess with the ControlNet residual branch (reference
    preprocess.py:60-68,129-149 contract) -> run_controlnet edit with canny
    conditioning on every pass (BASELINE config 4 shape)."""
    from tokenflow_tpu.cli import run_controlnet

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        opt = preprocess_cli.build_parser().parse_args(
            [
                "--data_path", "data/clip",
                "--H", str(HW), "--W", str(HW),
                "--sd_version", "tiny-controlnet",
                "--steps", str(STEPS),
                "--save_steps", str(SAVE_STEPS),
                "--n_frames", str(F),
                "--batch_size", str(F),
                "--inversion_prompt", "a test clip",
            ]
        )
        result = preprocess_cli.run(opt)
        assert os.path.exists(
            os.path.join(result["save_path"], "latents", "trajectory.npz")
        )

        config = {
            "seed": 1,
            "device": "cpu",
            "output_path": "results",
            "data_path": "data/clip",
            "latents_path": "latents",
            "n_inversion_steps": STEPS,
            "n_frames": F,
            "sd_version": "tiny-controlnet",
            "guidance_scale": 7.5,
            "n_timesteps": N_TIMESTEPS,
            "prompt": "a stylized test clip",
            "negative_prompt": "ugly",
            "batch_size": 2,
            "image_size": HW,
        }
        config = run_controlnet.resolve_output_path(config)
        os.makedirs(config["output_path"], exist_ok=True)
        from tokenflow_tpu.cli.common import dump_config

        dump_config(config)
        decoded = run_controlnet.edit_video(config)
        assert decoded.shape == (F, HW, HW, 3)
        assert np.isfinite(decoded).all()
        out = config["output_path"]
        for name in (
            "img_ode/00000.png",
            "tokenflow_ControlNet_fps_10.mp4",
            "config.yaml",
        ):
            assert os.path.exists(os.path.join(out, name)), name
    finally:
        os.chdir(cwd)


@pytest.mark.slow
def test_depth_edit_e2e(workdir):
    """5-channel depth-conditioned flow on the tiny stack (VERDICT r1 #5):
    synthetic depth/%05d.npy maps (the precomputed path of io/depth.py) ->
    preprocess with sd_version tiny-depth -> PnP edit (reference
    run_tokenflow_pnp.py:63-64,70-105,200-201 contract)."""
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        depth_dir = workdir / "data" / "clip" / "depth"
        depth_dir.mkdir(exist_ok=True)
        rng = np.random.default_rng(7)
        for i in range(F):
            # plausible raw MiDaS-like map: smooth gradient + noise, any HxW
            yy, xx = np.mgrid[0:37, 0:41]
            np.save(
                depth_dir / f"{i:05d}.npy",
                (yy * 10.0 + xx + rng.random((37, 41)) * 5 + i).astype(
                    np.float32
                ),
            )

        opt = preprocess_cli.build_parser().parse_args(
            [
                "--data_path", "data/clip",
                "--H", str(HW), "--W", str(HW),
                "--sd_version", "tiny-depth",
                "--steps", str(STEPS),
                "--save_steps", str(SAVE_STEPS),
                "--n_frames", str(F),
                "--batch_size", str(F),
                "--inversion_prompt", "a test clip",
            ]
        )
        result = preprocess_cli.run(opt)
        assert os.path.exists(
            os.path.join(result["save_path"], "latents", "trajectory.npz")
        )

        config = {
            "seed": 1,
            "device": "cpu",
            "output_path": "results",
            "data_path": "data/clip",
            "latents_path": "latents",
            "n_inversion_steps": STEPS,
            "n_frames": F,
            "sd_version": "tiny-depth",
            "guidance_scale": 7.5,
            "n_timesteps": N_TIMESTEPS,
            "prompt": "a stylized test clip",
            "negative_prompt": "ugly",
            "batch_size": 2,
            "pnp_attn_t": 0.5,
            "pnp_f_t": 0.8,
            "image_size": HW,
        }
        config = run_pnp.resolve_output_path(config)
        os.makedirs(config["output_path"], exist_ok=True)
        from tokenflow_tpu.cli.common import dump_config

        dump_config(config)
        decoded = run_pnp.edit_video(config)
        assert decoded.shape == (F, HW, HW, 3)
        assert np.isfinite(decoded).all()
        assert os.path.exists(
            os.path.join(config["output_path"], "tokenflow_PnP_fps_10.mp4")
        )
    finally:
        os.chdir(cwd)


def test_save_video_encoder_fallback(tmp_path):
    """save_video prefers libx264 (reference util.py:88-96) and falls back
    to mp4v; the choice is recorded for metrics.json."""
    from tokenflow_tpu.io import video as video_io

    frames = np.random.default_rng(0).random((3, 16, 16, 3)).astype(
        np.float32
    )
    out = tmp_path / "v.mp4"
    video_io.save_video(frames, str(out), fps=10)
    assert out.exists() and out.stat().st_size > 0
    assert video_io.LAST_ENCODER in (
        "libx264-av-crf18-slow",
        "libx264-ffmpeg-crf18-slow",
        "mp4v-opencv",
    )


@pytest.mark.slow
def test_preprocess_data_parallel_matches(workdir):
    """Stage-1 CLI with the frames mesh engaged (--data_parallel): the
    stored latent trajectory must match the single-device run (inversion
    is embarrassingly frame-parallel, SURVEY §2.12)."""
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        def invert(dp, save_dir):
            opt = preprocess_cli.build_parser().parse_args(
                [
                    "--data_path", "data/clip",
                    "--H", str(HW), "--W", str(HW),
                    "--save_dir", save_dir,
                    "--sd_version", "tiny",
                    "--steps", str(STEPS),
                    "--save_steps", str(SAVE_STEPS),
                    "--n_frames", str(F),
                    "--batch_size", str(F),
                    "--inversion_prompt", "a test clip",
                    "--skip_reconstruction",
                    "--data_parallel", dp,
                ]
            )
            result = preprocess_cli.run(opt)
            return np.load(
                os.path.join(result["save_path"], "latents", "trajectory.npz")
            )

        # F=4 over 4 devices (8 would not divide F in this fixture)
        dp = invert("4", "latents_dp")
        single = invert("off", "latents_1dev")
        np.testing.assert_allclose(
            dp["traj"], single["traj"], rtol=5e-5, atol=5e-5
        )
        np.testing.assert_array_equal(dp["save_ts"], single["save_ts"])
    finally:
        os.chdir(cwd)


@pytest.mark.slow
@pytest.mark.parametrize("sd_version", ["tiny-controlnet", "tiny-depth"])
def test_preprocess_data_parallel_conditioned_variants(workdir, sd_version):
    """DP preprocess parity for the conditioned model families: the
    ControlNet residual branch and the 5-channel depth UNet must produce
    the same trajectory sharded as single-device (their aux inputs —
    canny frames / depth maps — enter the sharded inversion jit)."""
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        if sd_version == "tiny-depth":
            depth_dir = workdir / "data" / "clip" / "depth"
            depth_dir.mkdir(exist_ok=True)
            rng = np.random.default_rng(7)
            for i in range(F):
                yy, xx = np.mgrid[0:37, 0:41]
                np.save(
                    depth_dir / f"{i:05d}.npy",
                    (yy * 10.0 + xx + rng.random((37, 41)) * 5 + i).astype(
                        np.float32
                    ),
                )

        def invert(dp, save_dir):
            opt = preprocess_cli.build_parser().parse_args(
                [
                    "--data_path", "data/clip",
                    "--H", str(HW), "--W", str(HW),
                    "--save_dir", save_dir,
                    "--sd_version", sd_version,
                    "--steps", str(STEPS),
                    "--save_steps", str(SAVE_STEPS),
                    "--n_frames", str(F),
                    "--batch_size", str(F),
                    "--inversion_prompt", "a test clip",
                    "--skip_reconstruction",
                    "--data_parallel", dp,
                ]
            )
            result = preprocess_cli.run(opt)
            return np.load(
                os.path.join(result["save_path"], "latents", "trajectory.npz")
            )

        dp = invert("4", f"latents_dp_{sd_version}")
        single = invert("off", f"latents_1dev_{sd_version}")
        np.testing.assert_allclose(
            dp["traj"], single["traj"], rtol=5e-5, atol=5e-5
        )
    finally:
        os.chdir(cwd)


@pytest.mark.slow
def test_controlnet_edit_e2e_data_parallel(workdir):
    """ControlNet editor with the frames mesh engaged (incl. the sharded
    pivotal pass and frame-sharded canny conditioning): identical output
    to the single-device run."""
    from tokenflow_tpu.cli import run_controlnet

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        opt = preprocess_cli.build_parser().parse_args(
            [
                "--data_path", "data/clip",
                "--H", str(HW), "--W", str(HW),
                "--save_dir", "latents_cnedit",
                "--sd_version", "tiny-controlnet",
                "--steps", str(STEPS),
                "--save_steps", str(SAVE_STEPS),
                "--n_frames", str(F),
                "--batch_size", str(F),
                "--inversion_prompt", "a test clip",
                "--skip_reconstruction",
            ]
        )
        preprocess_cli.run(opt)
        base = {
            "seed": 1,
            "device": "cpu",
            "output_path": "results_cn_dp",
            "data_path": "data/clip",
            "latents_path": "latents_cnedit",
            "n_inversion_steps": STEPS,
            "n_frames": F,
            "sd_version": "tiny-controlnet",
            "guidance_scale": 7.5,
            "n_timesteps": N_TIMESTEPS,
            "prompt": "a stylized test clip",
            "negative_prompt": "ugly",
            "batch_size": 2,
            "image_size": HW,
            "data_parallel": 2,
        }
        from tokenflow_tpu.cli.common import dump_config

        config = run_controlnet.resolve_output_path(dict(base))
        os.makedirs(config["output_path"], exist_ok=True)
        dump_config(config)
        decoded_dp = run_controlnet.edit_video(config)

        single = dict(
            base, data_parallel="off", output_path="results_cn_1dev"
        )
        single = run_controlnet.resolve_output_path(single)
        os.makedirs(single["output_path"], exist_ok=True)
        dump_config(single)
        decoded_1 = run_controlnet.edit_video(single)
        np.testing.assert_allclose(
            decoded_dp, decoded_1, rtol=5e-5, atol=5e-5
        )
    finally:
        os.chdir(cwd)
