"""TokenFlow-SDEdit editor CLI (stage 2, no PnP injection): truncated
denoising schedule + keyframe extended attention + NN token propagation.

Config/output parity with the reference runner
(run_tokenflow_sdedit.py:267-285), including the schedule-truncation
precedence (diffusion.ddim.truncate_schedule) and the use_ddim_noise
switch. ``--vanilla`` additionally runs the per-frame SDEdit baseline the
reference carries but never calls (run_tokenflow_sdedit.py:218-257).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tokenflow_tpu import utils
from tokenflow_tpu.cli import common
from tokenflow_tpu.diffusion import ddim
from tokenflow_tpu.editing import pipeline
from tokenflow_tpu.io import video as video_io


def edit_video(config: dict, vanilla: bool = False) -> np.ndarray:
    # scope the mesh kernel-dispatch env flags (set by maybe_frames_mesh
    # inside setup_editor) to this run
    with common.dispatch_env_scope():
        return _edit_video(config, vanilla)


def _edit_video(config: dict, vanilla: bool = False) -> np.ndarray:
    from tokenflow_tpu import runtime

    if runtime.is_depth(config["sd_version"]):
        # the reference SDEdit editor has no depth plumbing either (its
        # run_tokenflow_sdedit.py never concatenates depth channels); fail
        # fast instead of a UNet channel-shape error mid-trace
        raise ValueError(
            "SDEdit does not support depth-conditioned models "
            f"(sd_version={config['sd_version']!r}); use the PnP editor "
            "(run_tokenflow_pnp.py) for sd_version='depth'"
        )
    rng = utils.seed_everything(config["seed"])
    # SDEdit resolves latents across all steps_* dirs
    # (run_tokenflow_sdedit.py:81-92)
    data = common.setup_editor(config, use_steps_dir=False)

    sched = ddim.truncate_schedule(
        ddim.make_schedule(config["n_timesteps"]), config["start"]
    )
    schedule = pipeline.make_edit_schedule(sched, data.trajectory.save_ts)

    if config.get("use_ddim_noise", True):
        noise = data.eps
    else:
        # fresh per-video noise; the reference's non-default branch has a
        # shape bug (randn_like(eps[[0]]).repeat(F) on a 4-D tensor,
        # run_tokenflow_sdedit.py:198) — the working intent (one shared
        # noise map repeated across frames) is implemented here.
        n1 = jax.random.normal(
            jax.random.fold_in(rng, 1), data.eps[:1].shape, jnp.float32
        )
        noise = jnp.broadcast_to(n1, data.eps.shape)

    alpha_0 = sched.alphas_cumprod[sched.timesteps[0]]
    x_init = ddim.add_noise(
        data.latents.astype(jnp.float32), noise, alpha_0
    )

    if vanilla:
        vmesh = data.mesh

        def vloop_fn(params, x0, embeds2, sched_seg):
            return pipeline.vanilla_sample_loop(
                data.stack.unet_apply, params, x0, embeds2, schedule=sched_seg,
                guidance_scale=config["guidance_scale"],
                # frames are per-frame independent here, so under a mesh
                # the frame axis shards instead of lax.map-chunking (the
                # reshape would fight GSPMD, same rule as preprocess)
                frame_chunk=(
                    None if vmesh is not None else config["batch_size"]
                ),
            )

        donate = (1,) if common.donate_enabled() else ()
        if vmesh is None:
            vloop = jax.jit(vloop_fn, donate_argnums=donate)
        else:
            from tokenflow_tpu.sharding import mesh as mesh_lib

            fsh = mesh_lib.frames_sharding(vmesh)
            repl = mesh_lib.replicated(vmesh)
            vloop = jax.jit(
                vloop_fn,
                in_shardings=(
                    jax.tree.map(lambda _: repl, data.stack.unet_params),
                    fsh,
                    repl,
                    jax.tree.map(lambda _: repl, schedule),
                ),
                out_shardings=fsh,
                donate_argnums=donate,
            )

        def vstep_fn(x, sched_seg, _piv):
            return vloop(
                data.stack.unet_params,
                x,
                data.embeds3[1:],  # [uncond, cond]
                sched_seg,
            )

        out_lat = common.run_segmented_edit(
            config,
            common.schedule_segments(config, schedule),
            vstep_fn,
            x_init.astype(data.stack.dtype),
        )
        for th in data.decode_prewarm:  # don't race the compile-ahead
            th.join()
        decoded = np.asarray(
            data.stack.decode_latents(
                out_lat, batch=common.VAE_BATCH_SIZE, mesh=vmesh,
                frames_per_dispatch=common.frames_per_dispatch_of(
                    config
                ),
            )
        )
        out = config["output_path"]
        video_io.save_frames(decoded, os.path.join(out, "img_ode_vanilla_sde"))
        for fps, name in ((10, "vanilla_sde.mp4"), (20, "vanilla_sde_fps20.mp4"), (30, "vanilla_sde_fps30.mp4")):
            video_io.save_video(decoded, os.path.join(out, name), fps=fps)
        print("Done!")
        return decoded

    mesh = data.mesh  # built in setup_editor (after the frame clamp)

    pivots = common.resolve_pivots(
        config, rng, len(schedule.timesteps), config["n_frames"]
    )

    # one shared builder with the PnP editor (pnp=False = extended
    # attention only, no injection); the unified 7-arg signature takes
    # depth=None here (an empty pytree — never enters the trace)
    loop = common.build_edit_loop(
        data.stack, config, pnp=False, rng=rng, mesh=mesh,
        schedule=schedule, has_depth=False,
    )
    with utils.Timer() as t_edit:
        traj_dev = jnp.asarray(data.trajectory.traj, data.stack.dtype)

        def step_fn(x, sched_seg, piv_seg):
            return loop(
                data.stack.unet_params,
                x,
                traj_dev,
                data.embeds3,
                jnp.asarray(piv_seg),
                sched_seg,
                None,
            )

        latents_out = common.run_segmented_edit(
            config,
            common.schedule_segments(config, schedule, pivots),
            step_fn,
            x_init.astype(data.stack.dtype),
        )
        utils.force_completion(latents_out)
    print(
        f"[tokenflow-tpu] SDEdit loop ({len(schedule.timesteps)} steps): "
        f"{t_edit.seconds:.1f}s "
        f"({config['n_frames'] / t_edit.seconds:.2f} edited frames/s)"
    )

    decoded = common.save_outputs(data, latents_out, "SDEdit")
    print("Done!")
    return decoded


def resolve_output_path(config: dict) -> dict:
    """Reference output-dir encoding (run_tokenflow_sdedit.py:274-278)."""
    config["output_path"] = os.path.join(
        config["output_path"] + "_sdedit",
        Path(config["data_path"]).stem,
        config["prompt"][:240],
        f"batch_size_{str(config['batch_size'])}",
        str(config["n_timesteps"]) + f"start_{config['start']}",
    )
    return config


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--config_path", type=str, default="configs/config_sdedit.yaml"
    )
    parser.add_argument(
        "--vanilla",
        action="store_true",
        help="run the per-frame SDEdit baseline (no TokenFlow)",
    )
    opt = parser.parse_args(argv)
    config = common.load_config(opt.config_path)
    common.validate_config(config, "sdedit")
    config = resolve_output_path(config)
    os.makedirs(config["output_path"], exist_ok=True)
    common.dump_config(config)
    assert os.path.exists(config["data_path"]), "Data path does not exist"
    print(config)
    edit_video(config, vanilla=opt.vanilla)


if __name__ == "__main__":
    main()
