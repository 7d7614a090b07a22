"""Preprocess CLI: DDIM-invert a video's frames and store the latent
trajectory (stage 1 of the two-stage pipeline).

CLI parity with the reference entry point (preprocess.py:333-354): same
flags, same save layout, same defaults (500 steps, save grid 50, 40 frames,
512x512, SD-2.1, inversion prompt registry + txt). TPU-native internals:
one jit-scanned inversion + reconstruction, trajectory kept on device and
written once (io/latents.py).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tokenflow_tpu import runtime, utils
from tokenflow_tpu.diffusion import ddim, inversion
from tokenflow_tpu.io import latents as latents_io
from tokenflow_tpu.io import video as video_io


def build_eps_fn(
    stack: runtime.SDStack,
    cond,
    depth=None,
    cn_model=None,
    canny=None,
    frame_chunk=None,
):
    """Conditional-only eps closure (no CFG during inversion — reference
    preprocess.py:271). Depth maps are concatenated as a 5th latent channel
    (preprocess.py:207-209); ControlNet residuals are added when a
    cn_model is supplied (preprocess.py:129-149). Frame chunking (the
    reference's frame micro-batching, preprocess.py:203) happens here so
    per-frame aux inputs chunk together with x.

    ``params`` is a pytree {"unet": ..., "cn": ...} passed as a traced jit
    argument (closure-captured params become HLO literal constants and the
    multi-GB program breaks the remote-compile transport)."""

    def single(params, x, d, cn, t):
        ctx = jnp.broadcast_to(cond, (x.shape[0], *cond.shape[1:]))
        sample = x
        if d is not None:
            sample = jnp.concatenate([x, d.astype(x.dtype)], axis=-1)
        kw = {}
        if cn_model is not None:
            down_res, mid_res = cn_model.apply(
                params["cn"], sample, t, ctx, cn
            )
            kw = dict(
                down_block_residuals=down_res, mid_block_residual=mid_res
            )
        eps, _ = stack.unet_apply(params["unet"], sample, t, ctx, None, **kw)
        return eps

    def eps_fn(params, x, t):
        # params MUST be a traced argument, not a closure capture: captured
        # device arrays become HLO literal constants and the 1.7GB program
        # breaks the remote-compile transport (observed on the axon tunnel)
        f = x.shape[0]
        if not frame_chunk or f <= frame_chunk or f % frame_chunk:
            return single(params, x, depth, canny, t)
        n = f // frame_chunk

        def view(a):
            return (
                None
                if a is None
                else a.reshape(n, frame_chunk, *a.shape[1:])
            )

        xc, dc, cc = view(x), view(depth), view(canny)
        aux = tuple(a for a in (dc, cc) if a is not None)
        out = jax.lax.map(
            lambda args: single(
                params,
                args[0],
                args[1] if dc is not None else None,
                args[-1] if cc is not None else None,
                t,
            ),
            (xc, *aux),
        )
        return out.reshape(f, *x.shape[1:])

    return eps_fn


def load_depth_maps(data_path: str, n_frames: int, latent_hw) -> np.ndarray:
    """Load per-frame depth maps. Looks for precomputed
    ``{data_path}/depth/%05d.npy`` (as produced by io/depth.py); the
    reference computes them with MiDaS at runtime (preprocess.py:76-111)."""
    from tokenflow_tpu.io.depth import load_or_compute_depth

    return load_or_compute_depth(data_path, n_frames, latent_hw)


def _inversion_fingerprint(opt, segs: list) -> str:
    """Identity of an inversion run for checkpoint/resume (the analog of
    common._edit_fingerprint): a checkpoint must never seed a run whose
    schedule, prompt, or geometry differ."""
    import hashlib
    import json

    ident = {
        k: getattr(opt, k, None)
        for k in (
            "sd_version", "inversion_prompt", "steps", "save_steps",
            "n_frames", "H", "W", "batch_size", "steps_per_dispatch",
            "data_path",
        )
    }
    ident["segment_steps"] = [len(s[0]) for s in segs]
    return hashlib.sha256(
        json.dumps(ident, sort_keys=True).encode()
    ).hexdigest()


def start_edit_prewarm(stack, opt, lat, save_ts) -> list:
    """``--prewarm_edit_config``: AOT-compile the EDIT stage's scan
    program(s) in a daemon thread while preprocess's inversion executes.

    The reference workflow is always a cold two-process sequence
    (preprocess.py:333-354 then run_tokenflow_pnp.py:283-300); the
    editor's remote compile (~2 min per program shape at 768p, PERF.md)
    therefore always lands on the critical path. The remote-compile
    service is independent of device execution, so compiling the edit
    program HERE rides the inversion wall; the editor process then finds
    it in the persistent compile cache (JAX_COMPILATION_CACHE_DIR) —
    common.build_edit_loop guarantees the trace is identical.

    Best-effort by design: any mismatch (different sd_version/dtype, a
    frames mesh in the edit config, depth unavailable) just skips or
    produces an unused cache entry; the edit stage never depends on it.
    """
    from tokenflow_tpu.cli import common as cli_common
    from tokenflow_tpu.editing import pipeline

    path = getattr(opt, "prewarm_edit_config", None)
    if not path:
        return []
    try:
        cfg = cli_common.load_config(path)
        if "pnp_attn_t" in cfg:
            mode = "pnp"
        elif "start" in cfg:
            mode = "sdedit"
        else:
            # the ControlNet editor's loop closes over extra traced args
            # (cn params + canny cond) — not covered by build_edit_loop
            print(
                "[tokenflow-tpu] prewarm skipped: config is neither PnP "
                "nor SDEdit (ControlNet prewarm unsupported)"
            )
            return []
        cli_common.validate_config(cfg, mode)
        if cfg["sd_version"] != opt.sd_version:
            print(
                f"[tokenflow-tpu] prewarm skipped: edit config is "
                f"sd_version={cfg['sd_version']!r}, preprocess is "
                f"{opt.sd_version!r}"
            )
            return []
        if cfg.get("dtype", "bf16") != opt.dtype:
            print("[tokenflow-tpu] prewarm skipped: dtype mismatch")
            return []
        n = min(int(opt.n_frames), int(cfg["n_frames"]))
        n -= n % int(cfg["batch_size"])
        # single-device program only (a frames mesh in the edit stage
        # changes the program; with >1 device the editor compiles its own)
        if len(jax.devices()) > 1 and cfg.get(
            "data_parallel", "auto"
        ) not in ("off", "0", 0, False, None):
            print("[tokenflow-tpu] prewarm skipped: edit will use a mesh")
            return []
        sched = ddim.make_schedule(cfg["n_timesteps"])
        if mode == "sdedit":
            sched = ddim.truncate_schedule(sched, cfg["start"])
            schedule = pipeline.make_edit_schedule(sched, save_ts)
        else:
            schedule = pipeline.make_edit_schedule(
                sched, save_ts,
                pnp_attn_t=cfg["pnp_attn_t"], pnp_f_t=cfg["pnp_f_t"],
            )
        n_steps = len(schedule.timesteps)
        dummy_pivots = np.zeros(
            (n_steps, n // int(cfg["batch_size"])), np.int32
        )
        segments = cli_common.schedule_segments(cfg, schedule, dummy_pivots)
        # real embeds (tiny device work; the text-encoder program is
        # already compiled for preprocess's own prompt) — exact dtype
        uncond_cond = stack.encode_prompt(
            cfg["prompt"], cfg["negative_prompt"]
        )
        inv_embed = stack.encode_prompt(
            opt.inversion_prompt, opt.inversion_prompt
        )[0:1]
        embeds3 = jnp.concatenate([inv_embed, uncond_cond], axis=0)
        depth_spec = None
        if runtime.is_depth(cfg["sd_version"]):
            depth_spec = jax.ShapeDtypeStruct(
                (n, *lat.shape[1:3], 1), jnp.float32
            )
        loop = cli_common.build_edit_loop(
            stack, cfg, pnp=(mode == "pnp"),
            rng=jax.random.PRNGKey(cfg["seed"]),  # dead: pivots are pinned
        )
        return [
            cli_common.start_compile_ahead(loop, args, f"edit-prewarm/{i}")
            for i, args in enumerate(
                cli_common.edit_prewarm_args(
                    stack, cfg, segments, n, lat.shape[1:3],
                    int(opt.save_steps), embeds3, depth_spec,
                )
            )
        ]
    except Exception as e:  # noqa: BLE001 — prewarm must never kill a run
        print(f"[tokenflow-tpu] prewarm failed (ignored): {e!r}")
        return []


def run(opt) -> dict:
    # scope the mesh kernel-dispatch env flags (set by maybe_frames_mesh
    # below) to this run
    from tokenflow_tpu.cli import common as cli_common

    with cli_common.dispatch_env_scope():
        return _run(opt)


def run_then_edit(config_path: str) -> None:
    """``--then_edit``: run the stage-2 editor IN THIS PROCESS after
    preprocess finishes. The reference workflow is always two cold
    processes (preprocess.py:333-354 then run_tokenflow_pnp.py:283-300);
    on this runtime a second process pays another TPU-claim handshake
    (16 s–10 min) and a cold editor start. In-process, the editor reuses
    the already-loaded model stack (runtime.load_stack's cache — same
    sd_version/dtype/init key); PnP/SDEdit configs additionally open on
    the edit-scan programs prewarmed during the inversion (``--then_edit``
    implies ``--prewarm_edit_config`` for those families). ControlNet
    chains get the stack reuse but NOT the prewarm (the ControlNet loop
    closes over extra traced args — see :func:`start_edit_prewarm`).

    Editor family inference: ``pnp_attn_t`` → PnP, ``start`` → SDEdit, a
    ControlNet sd_version → ControlNet."""
    from tokenflow_tpu.cli import common as cli_common

    cfg = cli_common.load_config(config_path)
    family = infer_editor_family(cfg, config_path)
    if family == "pnp":
        from tokenflow_tpu.cli import run_pnp as editor
    elif family == "sdedit":
        from tokenflow_tpu.cli import run_sdedit as editor
    else:
        from tokenflow_tpu.cli import run_controlnet as editor
    print(f"[tokenflow-tpu] --then_edit: running {editor.__name__}")
    editor.main(["--config_path", config_path])


def infer_editor_family(cfg: dict, config_path: str) -> str:
    """Infer the stage-2 editor family from its config: ``pnp_attn_t`` →
    PnP, ``start`` → SDEdit, a ControlNet sd_version → ControlNet.
    Raises ValueError for anything else — callers use this to fail fast
    at parse time instead of after a multi-minute inversion."""
    if "pnp_attn_t" in cfg:
        return "pnp"
    if "start" in cfg:
        return "sdedit"
    if runtime.is_controlnet(cfg.get("sd_version", "")):
        return "controlnet"
    raise ValueError(
        f"--then_edit: cannot infer the editor family from "
        f"{config_path!r} (expected a pnp_attn_t, start, or "
        f"ControlNet sd_version key)"
    )


def _run(opt) -> dict:
    key = utils.seed_everything(1)  # reference seeds 1 (preprocess.py:303)
    del key

    video_stem = Path(opt.data_path).stem
    save_path = latents_io.save_path_for(
        opt.save_dir, opt.sd_version, video_stem, opt.steps, opt.n_frames
    )
    os.makedirs(os.path.join(save_path, "latents"), exist_ok=True)
    latents_io.write_inversion_prompt(
        opt.save_dir, save_path, video_stem, opt.inversion_prompt
    )

    dtype = jnp.bfloat16 if opt.dtype == "bf16" else jnp.float32
    stack = runtime.load_stack(
        opt.sd_version,
        model_dir=opt.model_dir,
        dtype=dtype,
        param_dtype=dtype,
        init=opt.init,
    )

    # multi-chip extension (reference is single-GPU): shard the frame
    # axis over a mesh — inversion is embarrassingly frame-parallel and
    # dominates end-to-end wall-clock (PERF.md: ~87% of the two-stage
    # pipeline on one chip)
    from tokenflow_tpu.cli import common as cli_common

    mesh = cli_common.maybe_frames_mesh(
        {"data_parallel": opt.data_parallel}, opt.n_frames, 1
    )

    frames = video_io.load_frames(
        opt.data_path, opt.n_frames, resize_square=opt.H
    )
    fpd = int(getattr(opt, "frames_per_dispatch", 0) or 0)
    lat = stack.encode_frames(
        frames, mesh=mesh, frames_per_dispatch=fpd
    )  # (F, h, w, 4)

    cond = stack.encode_prompt(opt.inversion_prompt, "")[1:2]  # cond only

    depth = None
    controlnet_fn = None
    canny = None
    if runtime.is_depth(opt.sd_version):
        depth = jnp.asarray(
            load_depth_maps(opt.data_path, opt.n_frames, lat.shape[1:3])
        )
    cn_model = cn_params = None
    if runtime.is_controlnet(opt.sd_version):
        from tokenflow_tpu.cli.controlnet_utils import build_controlnet

        cn_model, cn_params, canny = build_controlnet(stack, frames, opt)

    sched = ddim.make_schedule(opt.steps)
    frame_chunk = (
        opt.batch_size if opt.batch_size < opt.n_frames else None
    )
    if mesh is not None:
        # per-device batch = F / n_devices already bounds memory; lax.map
        # chunking would fight the frame sharding
        frame_chunk = None
    eps_fn = build_eps_fn(
        stack, cond, depth, cn_model, canny, frame_chunk
    )
    all_params = {"unet": stack.unet_params, "cn": cn_params}

    def _jit(fn, n_out_frame_sharded, extra_args=0, donate=()):
        """jit with frames-mesh shardings. Signature convention:
        (params, x[, traj][, xs]) — x frame-sharded, traj sharded on its
        frame axis 1, the per-step xs tables replicated. ``donate``
        aliases the scan carries (x, and for inversion the growing
        trajectory) into their outputs: at config-5 scale the f32
        trajectory is ~0.9 GB, so donation halves the carry footprint
        across segmented dispatches (common.donate_enabled to disable)."""
        if not cli_common.donate_enabled():
            donate = ()
        if mesh is None:
            return jax.jit(fn, donate_argnums=donate)
        from tokenflow_tpu.sharding import mesh as mesh_lib

        fsh = mesh_lib.frames_sharding(mesh)
        f1sh = mesh_lib.frames_sharding(mesh, frame_axis=1)
        repl = mesh_lib.replicated(mesh)
        outs = {1: fsh, 2: (fsh, f1sh)}[n_out_frame_sharded]
        extra = {0: (), 1: (repl,), 2: (f1sh, repl)}[extra_args]
        return jax.jit(
            fn,
            in_shardings=(
                jax.tree.map(lambda _: repl, all_params), fsh, *extra
            ),
            out_shardings=outs,
            donate_argnums=donate,
        )

    # dispatch plan: one jitted scan by default; --steps_per_dispatch N
    # splits it into several executions of one shared program with the
    # (x, traj) carry threaded — identical math, bounded per-program
    # execution time (the axon relay kills ~>60 s single executions —
    # PERF.md round 3; the reference-default 500-step inversion is ~157 s
    # at 512p in one program)
    spd = int(getattr(opt, "steps_per_dispatch", 0) or 0)
    xs_np, save_ts = inversion.inversion_xs(sched, opt.save_steps)

    # --prewarm_edit_config: compile the edit stage's program(s) while
    # the inversion below executes (threads joined before returning)
    prewarm_threads = start_edit_prewarm(stack, opt, lat, save_ts)
    # ... and the decode program the reconstruction/inverted.mp4 needs
    # (same fp32-canonical program a same-geometry editor will reuse via
    # the persistent cache — PERF.md round 5). Kept separate from
    # prewarm_threads: these must be joined BEFORE the reconstruction
    # decode below (don't race the compile-ahead), while the edit
    # prewarms ride until the end of the run.
    # (skipped when --skip_reconstruction makes this process decode
    # nothing: the compile would be pure waste and its daemon thread
    # could die mid-remote-compile at process exit — unless --then_edit
    # follows in-process, where the editor reuses the compiled program)
    decode_prewarm = []
    if mesh is None and (
        not opt.skip_reconstruction or getattr(opt, "then_edit", None)
    ):
        decode_prewarm = cli_common.start_decode_prewarm(
            stack, lat.shape[0], lat.shape[1:3],
            {"frames_per_dispatch": fpd},
        )

    def xs_slices(xs_arrays):
        # prefer a divisor of the step count so all segments share one
        # compiled program (utils.plan_seg_len; remote compile is ~2 min
        # per distinct program shape)
        n = len(xs_arrays[0])
        return utils.segment_slices(n, utils.plan_seg_len(n, spd))

    def xs_segments(xs_arrays):
        return [
            tuple(a[s] for a in xs_arrays) for s in xs_slices(xs_arrays)
        ]

    with utils.Timer() as t_inv:
        invert = _jit(
            lambda params, x, traj, xs: inversion.invert_scan(
                lambda xx, tt: eps_fn(params, xx, tt), x, traj, xs
            ),
            2,
            extra_args=2,
            donate=(1, 2),  # x carry + trajectory carry
        )
        x_T = lat
        traj = jnp.zeros((opt.save_steps, *lat.shape), lat.dtype)
        # ONE segmentation plan drives both the dispatch payloads and the
        # checkpointer's per-segment row counts — deriving them from
        # separate plan_seg_len calls risks a silent drift that would
        # checkpoint the wrong trajectory rows
        slices = xs_slices(xs_np)
        segs = [tuple(a[s] for a in xs_np) for s in slices]
        # cumulative trajectory high-water mark after each segment: lets
        # the checkpointer pull only the rows each dispatch added
        # (SegmentCheckpointer.save ``appended``). Saved slots ascend but
        # may SKIP indices when a save-grid timestep is not on the
        # inversion grid (ddim.save_grid leaves that slot zero-initialized
        # forever), so the valid prefix is max(slot)+1 over saved steps —
        # counting mask hits (cumsum) would undercount past a hole and
        # the resume would restore written rows above it as zeros.
        mask_np = np.asarray(xs_np[3], bool)
        slot_np = np.asarray(xs_np[4], np.int64)
        filled = np.maximum.accumulate(np.where(mask_np, slot_np + 1, 0))
        seg_hi = [int(filled[s.stop - 1]) for s in slices]
        if len(segs) > 1:
            print(
                f"[tokenflow-tpu] inversion in {len(segs)} dispatches "
                f"of <= {spd} steps"
            )
        # --checkpoint_inversion: resume an interrupted inversion at the
        # completed-dispatch boundary (carry = (x, traj); see
        # common.SegmentCheckpointer). The write is sized by the save
        # grid — at config-5 scale (~1.8 GB bf16) pick steps_per_dispatch
        # so the cadence matches the disk budget.
        ck = cli_common.SegmentCheckpointer(
            os.path.join(save_path, "inversion_checkpoint.npz"),
            _inversion_fingerprint(opt, segs),
            bool(getattr(opt, "checkpoint_inversion", False)),
            every=int(getattr(opt, "checkpoint_every", 1) or 1),
        )
        start_seg, (x_T, traj) = ck.resume((x_T, traj), len(segs))
        for i, xs_seg in enumerate(segs):
            if i < start_seg:
                continue
            x_T, traj = invert(all_params, x_T, traj, xs_seg)
            ck.save(i, len(segs), (x_T, traj), appended={1: seg_hi[i]})
        ck.done()
        utils.force_completion(x_T)
    print(f"[tokenflow-tpu] inversion ({opt.steps} steps): {t_inv.seconds:.1f}s")

    latents_io.save_trajectory(
        save_path,
        np.asarray(traj, np.float32),
        save_ts,
        np.asarray(x_T, np.float32),
        int(sched.timesteps[0]),
    )
    if opt.export_pt:
        latents_io.export_reference_layout(save_path)

    if opt.skip_reconstruction:
        # the reconstruction is the reference's inversion-quality sanity
        # check (preprocess.py:280-284); skipping halves preprocess time
        for th in prewarm_threads + decode_prewarm:
            th.join()
        return {
            "save_path": save_path,
            "inversion_seconds": t_inv.seconds,
        }

    with utils.Timer() as t_rec:
        recon = _jit(
            lambda params, x, xs: inversion.recon_scan(
                lambda xx, tt: eps_fn(params, xx, tt), x, xs
            ),
            1,
            extra_args=1,
            donate=(1,),
        )
        lat_rec = x_T
        for xs_seg in xs_segments(inversion.reconstruction_xs(sched)):
            lat_rec = recon(all_params, lat_rec, xs_seg)
        utils.force_completion(lat_rec)
    print(f"[tokenflow-tpu] reconstruction: {t_rec.seconds:.1f}s")

    for th in decode_prewarm:  # don't race the compile-ahead
        th.join()
    rgb = np.asarray(
        stack.decode_latents(lat_rec, mesh=mesh, frames_per_dispatch=fpd)
    )
    video_io.save_frames(rgb, os.path.join(save_path, "frames"))
    video_io.save_video(
        rgb, os.path.join(save_path, "inverted.mp4"), fps=10
    )

    rec_psnr = utils.psnr(rgb, frames)
    print(f"[tokenflow-tpu] reconstruction PSNR vs input: {rec_psnr:.2f} dB")
    for th in prewarm_threads:
        th.join()
    return {
        "save_path": save_path,
        "inversion_seconds": t_inv.seconds,
        "reconstruction_seconds": t_rec.seconds,
        "reconstruction_psnr": rec_psnr,
    }


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_path", type=str, default="data/woman-running.mp4")
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--W", type=int, default=512)
    p.add_argument("--save_dir", type=str, default="latents")
    p.add_argument(
        "--sd_version",
        type=str,
        default="2.1",
        choices=[
            "1.5", "2.0", "2.1", "ControlNet", "depth",
            "tiny", "tiny-depth", "tiny-controlnet",
        ],
    )
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--batch_size", type=int, default=40)
    p.add_argument("--save_steps", type=int, default=50)
    p.add_argument("--n_frames", type=int, default=40)
    p.add_argument(
        "--inversion_prompt", type=str, default="a woman running"
    )
    # tokenflow-tpu extensions
    p.add_argument("--model_dir", type=str, default=None)
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument(
        "--init", choices=["auto", "pretrained", "random"], default="auto"
    )
    p.add_argument(
        "--export_pt",
        action="store_true",
        help="also write reference-compatible noisy_latents_{t}.pt files",
    )
    p.add_argument(
        "--skip_reconstruction",
        action="store_true",
        help="skip the DDIM reconstruction sanity pass (halves preprocess "
        "time; the reference always reconstructs)",
    )
    p.add_argument(
        "--data_parallel",
        type=str,
        default="auto",
        help="shard frames over a device mesh for inversion/VAE "
        "('auto' = all local devices, N = first N, 'off')",
    )
    p.add_argument(
        "--steps_per_dispatch",
        type=int,
        default=0,
        help="split the inversion/reconstruction scans into device "
        "dispatches of N steps (identical math; bounds per-program "
        "execution time — rigs with an execution watchdog need the "
        "longest dispatch under the limit). 0 = one dispatch",
    )
    p.add_argument(
        "--checkpoint_inversion",
        action="store_true",
        help="write the inversion carry to "
        "<save_path>/inversion_checkpoint.npz at dispatch boundaries and "
        "resume a matching interrupted run from it (exact: segments are "
        "scan splits). Sized by the save grid; forces a host sync per "
        "dispatch",
    )
    p.add_argument(
        "--checkpoint_every",
        type=int,
        default=1,
        help="with --checkpoint_inversion, persist the carry only every "
        "Nth dispatch boundary (each write is a host sync + ~0.9 GB npz "
        "at 120-frame 768p scale); resume restarts from the last saved "
        "boundary, bitwise",
    )
    p.add_argument(
        "--prewarm_edit_config",
        type=str,
        default=None,
        help="path to the stage-2 editor YAML (config_pnp.yaml / "
        "config_sdedit.yaml): AOT-compile that editor's scan program(s) "
        "concurrently with the inversion so the editor process hits the "
        "persistent compile cache instead of compiling (~2 min/program "
        "at 768p). Best-effort; mismatches are skipped with a message",
    )
    p.add_argument(
        "--then_edit",
        type=str,
        default=None,
        help="path to a stage-2 editor YAML: run that editor in THIS "
        "process after preprocess completes (one TPU claim instead of "
        "two; the model stack is reused and, for PnP/SDEdit configs, the "
        "edit program is prewarmed during the inversion — implies "
        "--prewarm_edit_config with the same file; ControlNet chains "
        "reuse the stack but are not prewarmed)",
    )
    p.add_argument(
        "--frames_per_dispatch",
        type=int,
        default=0,
        help="split VAE encode/decode into device dispatches of N frames "
        "(identical math; bounds per-program execution time — 120-frame "
        "768p decode is minutes in one program). 0 = one dispatch",
    )
    return p


def main(argv=None):
    opt = build_parser().parse_args(argv)
    video_path = opt.data_path
    if video_path.endswith((".mp4", ".mov", ".avi")):
        video_io.video_to_frames(video_path, img_size=(opt.W, opt.H))
        opt.data_path = os.path.join("data", Path(video_path).stem)
    if opt.then_edit:
        # infer the family NOW so a wrong/malformed stage-2 config fails
        # at parse time, not after the full inversion
        from tokenflow_tpu.cli import common as cli_common

        cfg = cli_common.load_config(opt.then_edit)
        family = infer_editor_family(cfg, opt.then_edit)
        if not opt.prewarm_edit_config:
            # ControlNet chains reuse the loaded stack but are NOT
            # prewarmed (the ControlNet editor's loop closes over extra
            # traced args — see start_edit_prewarm); don't set the key
            # just to have the prewarm print a confusing "skipped" message
            if family in ("pnp", "sdedit"):
                opt.prewarm_edit_config = opt.then_edit
            else:
                print(
                    "[tokenflow-tpu] --then_edit: ControlNet chain reuses "
                    "the stack in-process but is not prewarmed "
                    "(unsupported)"
                )
    run(opt)
    if opt.then_edit:
        run_then_edit(opt.then_edit)


if __name__ == "__main__":
    main()
