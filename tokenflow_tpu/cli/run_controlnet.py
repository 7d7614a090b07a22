"""TokenFlow-ControlNet editor CLI: keyframe extended attention + NN token
propagation with ControlNet (canny) structural conditioning on every pass.

The reference README advertises this runner (README.md:75
``run_tokenflow_controlnet.py`` + ``configs/config_controlnet.yaml``) but
the files are absent from its repo (SURVEY.md §0); the reference's
ControlNet contract exists only in preprocess (preprocess.py:60-68,129-149).
This implementation follows that contract: SD-1.5 base UNet, canny
conditioning (thresholds 100/200) computed from the input frames, ControlNet
residuals added to every UNet call of the TokenFlow loop (all 3 streams),
no PnP injection (structure preservation comes from the ControlNet branch).
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
from tokenflow_tpu.cli.controlnet_utils import build_controlnet
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
    common.save_vae_recon(data)

    cn_model, cn_params, canny = build_controlnet(
        data.stack,
        data.frames,
        argparse.Namespace(
            controlnet_dir=config.get("controlnet_dir"),
            init=config.get("init", "auto"),
        ),
    )

    sched = ddim.make_schedule(config["n_timesteps"])
    schedule = pipeline.make_edit_schedule(sched, data.trajectory.save_ts)

    alpha_0 = sched.alphas_cumprod[sched.timesteps[0]]
    x_init = ddim.add_noise(
        data.latents.astype(jnp.float32), data.eps, alpha_0
    )

    pivotal_shardings = None
    if data.mesh is not None and config.get("shard_pivotal", True):
        from tokenflow_tpu.sharding import mesh as mesh_lib

        pivotal_shardings = mesh_lib.pivotal_shardings(data.mesh)

    pivots = common.resolve_pivots(
        config, rng, len(schedule.timesteps), config["n_frames"]
    )

    # same resolution as common.build_edit_loop (config key wins, env
    # TOKENFLOW_PROP_APPROX is the default) — the pipeline supports
    # ControlNet + approx (see __graft_entry__ dryrun), so the ControlNet
    # editor must honor the documented switch like PnP/SDEdit do
    approx = common.prop_approx_enabled(config)
    if approx:
        print(
            "[tokenflow-tpu] prop_approx ON: source-free propagation "
            "pass (NON-PARITY fast mode — outputs deviate from exact; "
            "bound with scripts/compare_outputs.py)"
        )

    def loop_fn(params, cn_p, x0, traj, embeds3, pivots, canny, sched_seg):
        # the ControlNet apply closure is built INSIDE the traced function
        # so cn_p stays a traced argument (see build_controlnet docstring)
        def cn_fn(sample, t, ctx, cond):
            return cn_model.apply(cn_p, sample, t, ctx, cond)

        return pipeline.tokenflow_sample_loop(
            data.stack.unet_apply,
            params,
            x0,
            traj,
            embeds3,
            sched_seg,
            window_size=config["batch_size"],
            guidance_scale=config["guidance_scale"],
            pnp=False,
            rng=rng,
            propagate_chunk=config.get("propagate_chunk"),
            controlnet_fn=cn_fn,
            cond_image=canny,
            pivotal_shardings=pivotal_shardings,
            pivot_indices=pivots,
            prop_approx=approx,
        )

    # donate the x0 carry across segmented dispatches (common.build_edit_loop
    # does the same for the PnP/SDEdit loops)
    donate = (2,) if common.donate_enabled() else ()
    if data.mesh is None:
        loop = jax.jit(loop_fn, donate_argnums=donate)
    else:
        from tokenflow_tpu.sharding import mesh as mesh_lib

        fsh = mesh_lib.frames_sharding(data.mesh)
        repl = mesh_lib.replicated(data.mesh)
        loop = jax.jit(
            loop_fn,
            in_shardings=(
                jax.tree.map(lambda _: repl, data.stack.unet_params),
                jax.tree.map(lambda _: repl, cn_params),
                fsh,
                mesh_lib.frames_sharding(data.mesh, frame_axis=1),
                repl,
                repl,
                fsh,  # canny conditioning frames shard with their frames
                jax.tree.map(lambda _: repl, schedule),
            ),
            out_shardings=fsh,
            donate_argnums=donate,
        )
    with utils.Timer() as t_edit:
        traj_dev = jnp.asarray(data.trajectory.traj, data.stack.dtype)

        def step_fn(x, sched_seg, piv_seg):
            return loop(
                data.stack.unet_params,
                cn_params,
                x,
                traj_dev,
                data.embeds3,
                jnp.asarray(piv_seg),
                canny,
                sched_seg,
            )

        latents_out = common.run_segmented_edit(
            config,
            common.schedule_segments(config, schedule, pivots),
            step_fn,
            x_init.astype(data.stack.dtype),
        )
        utils.force_completion(latents_out)
    print(
        f"[tokenflow-tpu] ControlNet edit loop "
        f"({len(schedule.timesteps)} steps): {t_edit.seconds:.1f}s "
        f"({config['n_frames'] / t_edit.seconds:.2f} edited frames/s)"
    )

    decoded = common.save_outputs(data, latents_out, "ControlNet")
    print("Done!")
    return decoded


def resolve_output_path(config: dict) -> dict:
    config["output_path"] = os.path.join(
        config["output_path"] + "_controlnet",
        Path(config["data_path"]).stem,
        config["prompt"][:240],
        f"batch_size_{str(config['batch_size'])}",
        str(config["n_timesteps"]),
    )
    return config


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--config_path", type=str, default="configs/config_controlnet.yaml"
    )
    opt = parser.parse_args(argv)
    config = common.load_config(opt.config_path)
    common.validate_config(config, "controlnet")
    config = resolve_output_path(config)
    os.makedirs(config["output_path"], exist_ok=True)
    common.dump_config(config)
    assert os.path.exists(config["data_path"]), "Data path does not exist"
    print(config)
    edit_video(config)


if __name__ == "__main__":
    main()
