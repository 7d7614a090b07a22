"""Compile prewarming (cold-start reduction, VERDICT r03 #4).

The reference workflow is a cold two-process sequence (preprocess.py then
run_tokenflow_pnp.py), so the editor's remote compile always lands on the
critical path. common.build_edit_loop + common.edit_prewarm_args let the
preprocess stage (or the editor itself, before its VAE round-trip)
AOT-compile the edit-scan program into the persistent compile cache. The
whole mechanism rests on ONE invariant: the prewarmed program must be
trace-identical to what the editor jits — these tests pin that invariant
at the StableHLO level, plus the CLI wiring.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenflow_tpu import runtime, utils
from tokenflow_tpu.cli import common
from tokenflow_tpu.diffusion import ddim
from tokenflow_tpu.editing import pipeline

F, HW, N_TIMESTEPS, WS = 4, 8, 4, 2


@pytest.fixture(scope="module")
def stack():
    return runtime.load_stack(
        "tiny", init="random", dtype=jnp.bfloat16, param_dtype=jnp.bfloat16
    )


def _pnp_config():
    return {
        "seed": 1, "sd_version": "tiny", "prompt": "a cat",
        "negative_prompt": "ugly", "n_frames": F, "n_timesteps": N_TIMESTEPS,
        "batch_size": WS, "guidance_scale": 7.5, "pnp_attn_t": 0.5,
        "pnp_f_t": 0.8, "steps_per_dispatch": 3,
    }


def _schedule_and_segments(config):
    sched = ddim.make_schedule(config["n_timesteps"])
    save_ts = sched.timesteps[::-1].copy()
    schedule = pipeline.make_edit_schedule(
        sched, save_ts,
        pnp_attn_t=config["pnp_attn_t"], pnp_f_t=config["pnp_f_t"],
    )
    n_steps = len(schedule.timesteps)
    pivots = np.asarray(
        pipeline.choose_pivots(jax.random.PRNGKey(3), n_steps, F // WS, WS)
    )
    return save_ts, schedule, common.schedule_segments(
        config, schedule, pivots
    )


def test_prewarm_lowering_matches_editor_program(stack):
    """The program lowered from abstract prewarm args must equal, text for
    text, the program the editor lowers from its concrete run-time args —
    including with a DIFFERENT rng key (dead when pivots are pinned).
    Equal StableHLO + equal compile options = a persistent-cache hit."""
    config = _pnp_config()
    save_ts, schedule, segments = _schedule_and_segments(config)
    seg0_sched, seg0_piv = segments[0]

    embeds3 = jnp.concatenate(
        [
            stack.encode_prompt("inv prompt", "inv prompt")[0:1],
            stack.encode_prompt(config["prompt"], config["negative_prompt"]),
        ],
        axis=0,
    )
    # editor side: concrete arguments exactly as run_pnp passes them
    rng_editor = utils.seed_everything(config["seed"])
    loop_editor = common.build_edit_loop(
        stack, config, pnp=True, rng=rng_editor
    )
    x = jnp.zeros((F, HW, HW, 4), stack.dtype)
    traj = jnp.zeros((len(save_ts), F, HW, HW, 4), stack.dtype)
    text_editor = loop_editor.lower(
        stack.unet_params, x, traj, embeds3, jnp.asarray(seg0_piv),
        seg0_sched, None,
    ).as_text()

    # prewarm side: abstract specs + an unrelated rng key
    loop_prewarm = common.build_edit_loop(
        stack, config, pnp=True, rng=jax.random.PRNGKey(999)
    )
    args_list = common.edit_prewarm_args(
        stack, config, segments, F, (HW, HW), len(save_ts), embeds3, None
    )
    assert len(args_list) == 1  # planner: 4 steps @ <=3 -> 2x2, one program
    text_prewarm = loop_prewarm.lower(*args_list[0]).as_text()
    assert text_editor == text_prewarm


def test_prewarm_distinct_segment_shapes(stack):
    """An uneven tail (planner rejects tiny divisors: 5 @ <=3 -> 3+2)
    yields one prewarm arg tuple per DISTINCT segment length."""
    config = {**_pnp_config(), "n_timesteps": 5, "steps_per_dispatch": 3}
    save_ts, schedule, segments = _schedule_and_segments(config)
    embeds3 = jnp.zeros((3, 77, 32), stack.dtype)
    args_list = common.edit_prewarm_args(
        stack, config, segments, F, (HW, HW), len(save_ts), embeds3, None
    )
    assert [len(a[5].timesteps) for a in args_list] == [3, 2]
    piv_specs = [a[4] for a in args_list]
    assert [p.shape for p in piv_specs] == [(3, F // WS), (2, F // WS)]
    assert all(p.dtype == jnp.int32 for p in piv_specs)


def test_edit_loop_donates_carry(stack):
    """The x0 carry is donated through build_edit_loop: a segmented chain
    (dispatch output re-fed as next input) works, and the consumed input
    buffer is deleted — so the old and new carries alias instead of
    coexisting in HBM (TOKENFLOW_DONATE=0 disables)."""
    config = _pnp_config()
    save_ts, schedule, segments = _schedule_and_segments(config)
    loop = common.build_edit_loop(
        stack, config, pnp=True, rng=jax.random.PRNGKey(0)
    )
    embeds3 = jnp.zeros((3, 77, stack.unet.config.cross_attention_dim),
                        stack.dtype)
    traj = jnp.zeros((len(save_ts), F, HW, HW, 4), stack.dtype)
    x = jnp.zeros((F, HW, HW, 4), stack.dtype)
    x_prev = x
    for sched_seg, piv_seg in segments:
        piv = jnp.zeros((len(sched_seg.timesteps), F // WS), jnp.int32)
        x = loop(stack.unet_params, x, traj, embeds3, piv, sched_seg, None)
    assert x.shape == (F, HW, HW, 4)
    assert x_prev.is_deleted()  # first carry was consumed by donation
    assert not traj.is_deleted()  # the trajectory is re-fed, NEVER donated


def test_preprocess_prewarm_cli_wiring(tmp_path, capsys):
    """--prewarm_edit_config end-to-end on the tiny stack: the prewarm
    thread compiles the edit program during preprocess (message printed),
    mismatched configs are skipped, and the preprocess outputs are
    untouched."""
    import yaml

    from tokenflow_tpu.cli import preprocess as preprocess_cli

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        frames_dir = tmp_path / "data" / "clip"
        frames_dir.mkdir(parents=True)
        rng = np.random.default_rng(0)
        from PIL import Image

        for i in range(F):
            Image.fromarray(
                rng.integers(0, 255, (HW * 8, HW * 8, 3), np.uint8)
            ).save(frames_dir / f"{i:05d}.png")

        edit_cfg = {
            **_pnp_config(),
            "output_path": "results",
            "data_path": "data/clip",
            "latents_path": "latents",
            "n_inversion_steps": 4,
            "image_size": HW * 8,
            # the 8-virtual-device CPU harness would otherwise trigger the
            # "edit will use a mesh" skip (prewarm is single-device only)
            "data_parallel": "off",
        }
        cfg_path = tmp_path / "config_pnp.yaml"
        cfg_path.write_text(yaml.safe_dump(edit_cfg))

        args = [
            "--data_path", "data/clip",
            "--H", str(HW * 8), "--W", str(HW * 8),
            "--sd_version", "tiny",
            "--steps", "4", "--save_steps", "4",
            "--n_frames", str(F), "--batch_size", str(F),
            "--inversion_prompt", "a test clip",
            "--skip_reconstruction",
            "--prewarm_edit_config", str(cfg_path),
        ]
        result = preprocess_cli.run(preprocess_cli.build_parser().parse_args(args))
        out = capsys.readouterr().out
        assert "compile-ahead [edit-prewarm/0]" in out
        assert "prewarm failed" not in out
        assert os.path.exists(
            os.path.join(result["save_path"], "latents")
        )

        # sd_version mismatch: skipped with a message, run unaffected
        bad_cfg = {**edit_cfg, "sd_version": "2.1"}
        cfg_path.write_text(yaml.safe_dump(bad_cfg))
        preprocess_cli.run(preprocess_cli.build_parser().parse_args(args))
        out = capsys.readouterr().out
        assert "prewarm skipped" in out
    finally:
        os.chdir(cwd)
