"""TokenFlow-PnP editor CLI (stage 2): keyframe extended attention +
Plug-and-Play feature/attention injection + NN token propagation.

Config/output parity with the reference runner (run_tokenflow_pnp.py:283-300:
same YAML keys, same output-path encoding of hyperparameters, config.yaml
dump). The editing loop itself is the jit-scanned
editing.pipeline.tokenflow_sample_loop.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tokenflow_tpu import runtime, utils
from tokenflow_tpu.cli import common
from tokenflow_tpu.diffusion import ddim
from tokenflow_tpu.editing import pipeline


def edit_video(config: dict) -> np.ndarray:
    # scope the mesh kernel-dispatch env flags (set by maybe_frames_mesh
    # inside setup_editor) to this run
    with common.dispatch_env_scope():
        return _edit_video(config)


def _edit_video(config: dict) -> np.ndarray:
    rng = utils.seed_everything(config["seed"])
    data = common.setup_editor(config, use_steps_dir=True)

    sched = ddim.make_schedule(config["n_timesteps"])
    schedule = pipeline.make_edit_schedule(
        sched,
        data.trajectory.save_ts,
        pnp_attn_t=config["pnp_attn_t"],
        pnp_f_t=config["pnp_f_t"],
    )

    alpha_0 = sched.alphas_cumprod[sched.timesteps[0]]
    x_init = ddim.add_noise(
        data.latents.astype(jnp.float32), data.eps, alpha_0
    )

    depth = None
    if runtime.is_depth(config["sd_version"]):
        from tokenflow_tpu.cli.preprocess import load_depth_maps

        depth = jnp.asarray(
            load_depth_maps(
                config["data_path"],
                config["n_frames"],
                data.latents.shape[1:3],
            )
        )

    mesh = data.mesh

    pivots = common.resolve_pivots(
        config, rng, len(schedule.timesteps), config["n_frames"]
    )

    from tokenflow_tpu import profiling

    metrics = profiling.PhaseMetrics()
    loop = common.build_edit_loop(
        data.stack, config, pnp=True, rng=rng, mesh=mesh,
        schedule=schedule, has_depth=depth is not None,
    )
    segments = common.schedule_segments(config, schedule, pivots)

    # kick the edit-scan remote compile off NOW, before the VAE
    # round-trip below — the compile service is independent of device
    # execution, so the ~2-min 768p edit compile rides the vae_recon
    # decode wall instead of serializing after it (cold-start reduction,
    # PERF.md round 4; config key compile_ahead overrides the default)
    prewarm = None
    if mesh is None and common.compile_ahead_enabled(config):
        with metrics.phase("compile_ahead_launch"):
            depth_spec = None
            if depth is not None:
                depth_spec = jax.ShapeDtypeStruct(depth.shape, depth.dtype)
            prewarm = [
                common.start_compile_ahead(loop, args, f"edit-scan/{i}")
                for i, args in enumerate(
                    common.edit_prewarm_args(
                        data.stack, config, segments,
                        config["n_frames"], x_init.shape[1:3],
                        data.trajectory.traj.shape[0], data.embeds3,
                        depth_spec,
                    )
                )
            ]
    with metrics.phase("vae_recon"):
        common.save_vae_recon(data)
    if prewarm is not None:
        for th in prewarm:
            th.join()
    with profiling.trace(os.environ.get("TOKENFLOW_TRACE_DIR")):
        with metrics.phase("edit_loop"), utils.Timer() as t_edit:
            traj_dev = jnp.asarray(data.trajectory.traj, data.stack.dtype)

            def step_fn(x, sched_seg, piv_seg):
                return loop(
                    data.stack.unet_params,
                    x,
                    traj_dev,
                    data.embeds3,
                    jnp.asarray(piv_seg),
                    sched_seg,
                    depth,
                )

            latents_out = common.run_segmented_edit(
                config, segments, step_fn, x_init.astype(data.stack.dtype)
            )
            utils.force_completion(latents_out)
    n_steps = len(schedule.timesteps)
    fps = config["n_frames"] / t_edit.seconds
    print(
        f"[tokenflow-tpu] edit loop ({n_steps} steps, "
        f"{config['n_frames']} frames): {t_edit.seconds:.1f}s "
        f"({fps:.2f} edited frames/s)"
    )

    with metrics.phase("decode_and_save"):
        decoded = common.save_outputs(data, latents_out, "PnP")
    metrics.add("edited_frames_per_sec", round(fps, 3))
    metrics.add("n_steps", n_steps)
    # record the chosen keyframes so the run can be replayed pinned
    # (config key pivot_indices; VERDICT round-2 missing #3)
    metrics.add("pivot_indices", pivots.tolist())
    from tokenflow_tpu.io import video as video_io

    metrics.add("video_encoder", video_io.LAST_ENCODER)
    metrics.dump(os.path.join(config["output_path"], "metrics.json"))
    print("Done!")
    return decoded


def resolve_output_path(config: dict) -> dict:
    """Reference output-dir encoding (run_tokenflow_pnp.py:289-295)."""
    config["output_path"] = os.path.join(
        config["output_path"] + f"_pnp_SD_{config['sd_version']}",
        Path(config["data_path"]).stem,
        config["prompt"][:240],
        f"attn_{config['pnp_attn_t']}_f_{config['pnp_f_t']}",
        f"batch_size_{str(config['batch_size'])}",
        str(config["n_timesteps"]),
    )
    return config


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--config_path", type=str, default="configs/config_pnp.yaml"
    )
    opt = parser.parse_args(argv)
    config = common.load_config(opt.config_path)
    common.validate_config(config, "pnp")
    config = resolve_output_path(config)
    os.makedirs(config["output_path"], exist_ok=True)
    assert os.path.exists(config["data_path"]), "Data path does not exist"
    common.dump_config(config)
    print(config)
    edit_video(config)


if __name__ == "__main__":
    main()
