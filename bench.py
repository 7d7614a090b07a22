#!/usr/bin/env python
"""Headline benchmark: TokenFlow-PnP editing throughput on one chip.

Workload = the reference's default PnP edit config (SURVEY.md §6 /
BASELINE.md): 40 frames @ 512x512 (64x64 latents), 50 DDIM steps, keyframe
window 8 (5 pivots), 3-stream CFG, PnP injection thresholds 0.5/0.8 —
run as the jit-scanned TokenFlow loop with random-init SD-2.1 weights in
bf16 (SD compute cost is weight-independent).

Prints ONE JSON line (anchor-consistent, VERDICT round-2 #4):
  metric       end_to_end_frames_per_sec_40f_512p_1chip — measured
               40-frame wall-clock INCL. the 500-step inversion +
               reconstruction (the BASELINE.json metric), single chip
  vs_baseline  value / 0.667 — the north-star anchor (40 frames / <60 s
               end-to-end on a v5e-8; the reference publishes no numbers,
               BASELINE.md) — both sides end-to-end f/s
  also at top level: edit_loop_fps_per_chip (the scan-only rate),
               end_to_end_seconds_40f_512p, and the clearly-labeled
               projected_end_to_end_seconds_v5e8 8-chip PROJECTION
               (multi-chip hardware unavailable; shardings CPU-mesh
               validated — PERF.md).

Robustness: a faulty Pallas kernel can crash the TPU worker and take the
whole process down, so the parent orchestrates measurement variants
(kernels on -> jnp fallback) as SUBPROCESSES and reports the first
success. BENCH_WORKER=1 selects the in-process measurement role.

Env knobs: BENCH_FRAMES, BENCH_STEPS, BENCH_LATENT (latent hw),
BENCH_WINDOW, BENCH_CHUNK (propagation chunk), BENCH_TINY=1 (tiny stack
for CPU smoke), TOKENFLOW_PALLAS[_FLASH|_MATCH] (kernel dispatch).
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def progress(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def worker():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tokenflow_tpu import runtime, utils
    from tokenflow_tpu.diffusion import ddim
    from tokenflow_tpu.editing import pipeline

    # --- claim probe: the first device computation pays backend init +
    # the TPU-claim handshake (measured 16 s–10 min on this relay).
    # Decomposing it out of first_call_seconds explains the wild
    # first-call variance across bench artifacts (VERDICT r04 weak #3:
    # 825 s driver-side vs 188 s builder-side the same day).
    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((128, 128), jnp.float32)))
    t_claim = time.perf_counter() - t0
    progress(f"worker: device claimed in {t_claim:.1f}s")

    tiny = os.environ.get("BENCH_TINY", "0") == "1"
    f_total = int(os.environ.get("BENCH_FRAMES", "4" if tiny else "40"))
    steps = int(os.environ.get("BENCH_STEPS", "2" if tiny else "50"))
    hw = int(os.environ.get("BENCH_LATENT", "8" if tiny else "64"))
    window = int(os.environ.get("BENCH_WINDOW", "2" if tiny else "8"))
    chunk_env = os.environ.get("BENCH_CHUNK", "")
    chunk = int(chunk_env) if chunk_env else None
    dtype = jnp.float32 if tiny else jnp.bfloat16

    progress(f"worker: loading stack (tiny={tiny})")
    stack = runtime.load_stack(
        "tiny" if tiny else "2.1", init="random", dtype=dtype,
        param_dtype=dtype,
    )
    ctx_dim = stack.unet.config.cross_attention_dim

    sched = ddim.make_schedule(steps)
    save_ts = sched.timesteps[::-1].copy()
    schedule = pipeline.make_edit_schedule(
        sched, save_ts, pnp_attn_t=0.5, pnp_f_t=0.8
    )

    rng = np.random.default_rng(0)
    x_init = jnp.asarray(rng.standard_normal((f_total, hw, hw, 4)), dtype)
    traj = jnp.asarray(
        rng.standard_normal((steps, f_total, hw, hw, 4)), dtype
    )
    embeds3 = jnp.asarray(rng.standard_normal((3, 77, ctx_dim)), dtype)

    # measured on v5e: two-pass 1.134 s/step vs fused 1.163 — the per-block
    # segment concat/split overhead outweighs the batching win, so
    # two-pass is the default (fused stays available via BENCH_FUSED=1)
    fused = os.environ.get("BENCH_FUSED", "0") == "1"
    # opt-in NON-PARITY fast mode (pipeline prop_approx): source-free
    # propagation pass; measured for the PERF table, never the headline
    prop_approx = os.environ.get("BENCH_PROP_APPROX", "0") == "1"

    # BENCH_SEG=N splits the scan into N-step dispatches (identical math,
    # pipeline.split_schedule) — the safety net on rigs whose runtime
    # kills long single executions (the axon relay kills ~>60 s; the
    # default 50-step 512p dispatch measures 48 s, within margin but
    # close — PERF.md round 3)
    seg = int(os.environ.get("BENCH_SEG", "0"))
    key = jax.random.PRNGKey(0)
    if seg:
        n_steps = len(schedule.timesteps)
        pivots = pipeline.choose_pivots(
            key, n_steps, f_total // window, window
        )
        seg_tables = pipeline.split_schedule(schedule, seg)
        piv_tables = [
            pivots[s] for s in utils.segment_slices(n_steps, seg)
        ]

        def seg_fn(params, x0, tr, e3, piv, sched_seg):
            return pipeline.tokenflow_sample_loop(
                stack.unet_apply, params, x0, tr, e3, sched_seg,
                window_size=window, guidance_scale=7.5, pnp=True,
                rng=key, propagate_chunk=chunk, fused=fused,
                pivot_indices=piv, prop_approx=prop_approx,
            )

        seg_jit = jax.jit(seg_fn)

        def loop(params, x0, tr, e3, _key):
            x = x0
            for ss, pv in zip(seg_tables, piv_tables):
                x = seg_jit(params, x, tr, e3, pv, ss)
            return x

        def lower_edit():
            return seg_jit.lower(
                stack.unet_params, x_init, traj, embeds3,
                piv_tables[0], seg_tables[0],
            )
    else:
        def loop_fn(params, x0, tr, e3, key):
            return pipeline.tokenflow_sample_loop(
                stack.unet_apply, params, x0, tr, e3, schedule,
                window_size=window, guidance_scale=7.5, pnp=True,
                rng=key, propagate_chunk=chunk, fused=fused,
                prop_approx=prop_approx,
            )

        loop = jax.jit(loop_fn)

        def lower_edit():
            return loop.lower(stack.unet_params, x_init, traj, embeds3, key)

    def sync(o):
        # block_until_ready is a no-op under the axon TPU relay; force
        # completion by pulling a device-computed scalar to the host.
        return float(jnp.sum(o.astype(jnp.float32)))

    # AOT-compile first (timed separately — the repo's own cold-start
    # tooling, cli/common.start_compile_ahead's mechanism) so
    # first_call_seconds decomposes into compile vs dispatch+execute;
    # with JAX_COMPILATION_CACHE_DIR warm this is a cache fetch and the
    # number says so.
    progress("worker: AOT compile (edit scan)")
    t0 = time.perf_counter()
    lower_edit().compile()
    t_compile = time.perf_counter() - t0
    progress(f"worker: edit-scan compile {t_compile:.1f}s; first run")
    t0 = time.perf_counter()
    sync(loop(stack.unet_params, x_init, traj, embeds3, key))
    t_first = time.perf_counter() - t0
    progress(f"worker: first call {t_first:.1f}s; steady run")
    t0 = time.perf_counter()
    sync(loop(stack.unet_params, x_init, traj, embeds3, key))
    t_steady = time.perf_counter() - t0

    inv_details = {}
    e2e_sec = None
    if os.environ.get("BENCH_INVERSION", "0" if tiny else "1") == "1":
        # conditional-only inversion + reconstruction, MEASURED wall-clock
        # at the reference's full 500 steps (the other hot loops —
        # preprocess.py:198-261; VERDICT r04 weak #1: no extrapolation).
        # Segmented dispatch (the preprocess CLI's --steps_per_dispatch
        # machinery): the full 500-step scan is ~157 s of compute at 512p
        # — far over the relay's ~60 s execution watchdog — so it runs as
        # equal-length segments sharing ONE compiled program
        # (utils.plan_seg_len), carry threaded through; exact same math
        # (tests/test_pipeline.py::test_segmented_inversion_matches_single).
        from tokenflow_tpu.diffusion import inversion as inversion_lib

        inv_steps = int(
            os.environ.get("BENCH_INVERSION_STEPS", "10" if tiny else "500")
        )
        inv_sched = ddim.make_schedule(inv_steps)
        cond = embeds3[2:3]

        def eps_fn(params, x, t):
            ctx = jnp.broadcast_to(cond, (x.shape[0], *cond.shape[1:]))
            return stack.unet_apply(params, x, t, ctx, None)[0]

        seg_cap = int(os.environ.get("BENCH_INV_SEG", "100"))
        inv_seg = utils.plan_seg_len(inv_steps, min(seg_cap, inv_steps))
        save_steps = min(50, inv_steps)
        xs_full, _save_ts = inversion_lib.inversion_xs(
            inv_sched, save_steps
        )
        slices = utils.segment_slices(inv_steps, inv_seg)
        inv_xs_segs = [tuple(a[s] for a in xs_full) for s in slices]
        rec_full = inversion_lib.reconstruction_xs(inv_sched)
        rec_xs_segs = [tuple(a[s] for a in rec_full) for s in slices]
        traj0 = jnp.zeros((save_steps, *x_init.shape), x_init.dtype)

        # params as traced args (closure capture would inline 1.7GB of HLO
        # constants and break the remote-compile transport)
        inv_seg_jit = jax.jit(
            lambda params, x, tr, xs: inversion_lib.invert_scan(
                lambda xx, tt: eps_fn(params, xx, tt), x, tr, xs
            )
        )
        recon_seg_jit = jax.jit(
            lambda params, x, xs: inversion_lib.recon_scan(
                lambda xx, tt: eps_fn(params, xx, tt), x, xs
            )
        )

        progress(
            f"worker: inversion compile ({inv_steps} steps, "
            f"{len(slices)} dispatches of <= {inv_seg})"
        )
        t0 = time.perf_counter()
        inv_seg_jit.lower(
            stack.unet_params, x_init, traj0, inv_xs_segs[0]
        ).compile()
        recon_seg_jit.lower(
            stack.unet_params, x_init, rec_xs_segs[0]
        ).compile()
        t_inv_compile = time.perf_counter() - t0
        progress(
            f"worker: inversion+recon compile {t_inv_compile:.1f}s; "
            "measuring full walls"
        )
        t0 = time.perf_counter()
        x_T, tr = x_init, traj0
        for xs in inv_xs_segs:
            x_T, tr = inv_seg_jit(stack.unet_params, x_T, tr, xs)
        sync(x_T)
        t_inv = time.perf_counter() - t0
        t0 = time.perf_counter()
        x_rec = x_T
        for xs in rec_xs_segs:
            x_rec = recon_seg_jit(stack.unet_params, x_rec, xs)
        sync(x_rec)
        t_rec = time.perf_counter() - t0
        progress(
            f"worker: inversion {t_inv:.1f}s, reconstruction {t_rec:.1f}s"
        )
        inv_sec = t_inv / inv_steps
        # ==1 on the default full-500-step measurement: e2e is then pure
        # wall-clock; a reduced BENCH_INVERSION_STEPS (CPU smoke) scales
        # and says so in the details
        scale = 500 / inv_steps
        e2e_sec = scale * (t_inv + t_rec) + t_steady
        inv_details = {
            "inversion_steps_measured": inv_steps,
            "inversion_dispatches": len(slices),
            "inversion_sec_per_step": round(inv_sec, 4),
            "inversion_wall_sec": round(t_inv, 1),
            "recon_wall_sec": round(t_rec, 1),
            "inversion_recon_compile_sec": round(t_inv_compile, 1),
            "end_to_end_seconds_40f_512p": round(e2e_sec, 1),
            "end_to_end_skip_recon_seconds_40f_512p": round(
                scale * t_inv + t_steady, 1
            ),
        }
        if inv_steps != 500:
            inv_details["inversion_scaled_to_500"] = True

    fps = f_total / t_steady
    # Headline is ANCHOR-CONSISTENT (VERDICT round-2 #4): the BASELINE.json
    # metric is wall-clock for the 40-frame edit INCL. inversion, and the
    # 0.667 f/s anchor is 40 frames / <60 s END-TO-END (on a v5e-8), so
    # vs_baseline compares measured end-to-end f/s against it — like with
    # like. The edit-loop-only rate and the 8-chip PROJECTION (multi-chip
    # hardware does not exist here; shardings are dryrun/CPU-mesh
    # validated, PERF.md) are separate clearly-named top-level fields.
    if e2e_sec is not None:
        e2e_fps = f_total / e2e_sec
        # projection: inversion+recon shard ~linearly over frames (8x);
        # the edit scan with the sharded pivotal pass projects 5-8x
        # (PERF.md round-2 sharded-pivotal section); use the conservative
        # lower bound 5x. Labeled projected_*, never reported as measured.
        proj_e2e = (e2e_sec - t_steady) / 8 + t_steady / 5.0
        head = {
            "metric": "end_to_end_frames_per_sec_40f_512p_1chip",
            "value": round(e2e_fps, 4),
            "unit": "frames/s (incl. 500-step inversion + recon, 1 chip)",
            "vs_baseline": round(e2e_fps / 0.667, 3),
            "edit_loop_fps_per_chip": round(fps, 3),
            "end_to_end_seconds_40f_512p": round(e2e_sec, 1),
            "projected_end_to_end_seconds_v5e8": round(proj_e2e, 1),
            "projected_vs_baseline_v5e8": round(
                (f_total / proj_e2e) / 0.667, 3
            ),
        }
    else:
        head = {
            "metric": "edited_frames_per_sec_512p",
            "value": round(fps, 3),
            "unit": "frames/s/chip (edit loop only; inversion not measured)",
            "vs_baseline": round(fps / 0.667, 3),
            "edit_loop_fps_per_chip": round(fps, 3),
        }
    result = {
        **head,
        "details": {
            "frames": f_total,
            "steps": steps,
            "latent_hw": hw,
            "window": window,
            "propagate_chunk": chunk,
            "fused": fused,
            "pallas": {
                k: os.environ.get(k, "auto")
                for k in (
                    "TOKENFLOW_PALLAS",
                    "TOKENFLOW_PALLAS_FLASH",
                    "TOKENFLOW_PALLAS_MATCH",
                )
            },
            "edit_loop_seconds": round(t_steady, 2),
            # cold-start decomposition (VERDICT r04 #3): claim = backend
            # init + TPU-claim handshake; compile = AOT lower+compile of
            # the edit scan (a persistent-cache fetch when warm);
            # first_call = dispatch+execute after the AOT compile
            "claim_seconds": round(t_claim, 2),
            "edit_compile_seconds": round(t_compile, 2),
            "first_call_seconds": round(t_first, 2),
            "prop_approx": prop_approx,
            "device": str(jax.devices()[0]),
            "dtype": "bf16" if not tiny else "f32",
            "tiny": tiny,
            **inv_details,
        },
    }
    print(json.dumps(result), flush=True)


VARIANTS = [
    # (label, extra env) — first success wins; the first config is retried
    # once because single-chip HBM sits near the edge and OOM is flaky
    # (compile cache makes the retry cheap)
    ("two-pass-kernels", {}),
    ("two-pass-kernels-retry", {}),
    # segmented dispatch: same math, bounded per-program execution time —
    # survives the relay's ~60 s execution watchdog if the single 48 s
    # dispatch ever drifts over it (PERF.md round 3)
    ("two-pass-kernels-seg25", {"BENCH_SEG": "25"}),
    ("flash-only", {"TOKENFLOW_PALLAS_MATCH": "0"}),
    ("jnp", {"TOKENFLOW_PALLAS": "0"}),
    ("jnp-chunked", {"TOKENFLOW_PALLAS": "0", "BENCH_CHUNK": "8"}),
]

# stderr signatures meaning the TPU relay itself is dead/unreachable —
# no variant can succeed, so stop immediately instead of burning the
# per-variant timeout len(VARIANTS) more times (the round-3 failure mode:
# BENCH_r03.json is rc=124/parsed:null after 2h of exactly that)
RELAY_DOWN_SIGNATURES = (
    "Unable to initialize backend 'axon'",
    "TPU backend setup/compile error",
    "failed to claim",
)


def relay_down(text: str) -> bool:
    return any(sig in text for sig in RELAY_DOWN_SIGNATURES)


def preflight():
    """Tiny device computation proving the relay is alive (subprocess
    role BENCH_PREFLIGHT=1). Costs one TPU-claim handshake (16 s–10 min
    when healthy); a dead relay either raises UNAVAILABLE or hangs in
    the claim until the parent's timeout kills it."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((256, 256), jnp.bfloat16)
    v = float(jnp.sum((x @ x).astype(jnp.float32)))
    print(f"PREFLIGHT_OK {v} {jax.devices()[0]}", flush=True)


def last_good_bench():
    """Most recent driver-recorded bench artifact with a parsed result —
    echoed (clearly marked stale) when the TPU is unavailable."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for p in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                d = json.load(f)
        except Exception:
            continue
        parsed = d.get("parsed")
        # success results carry no "status" field; failure echoes do
        if parsed and "status" not in parsed:
            best = (os.path.basename(p), parsed)
    return best


def emit_unavailable(reason: str, status: str = "tpu_unavailable"):
    """Terminal structured-JSON failure path: the driver must always get
    one parseable line, even with the relay dead (VERDICT r03 #1).
    value=0 is the honest measured number for this round; the last good
    artifact is echoed under stale_last_good, marked stale."""
    result = {
        "metric": "end_to_end_frames_per_sec_40f_512p_1chip",
        "value": 0.0,
        "unit": "frames/s (incl. 500-step inversion + recon, 1 chip)",
        "vs_baseline": 0.0,
        "status": status,
        "reason": reason,
    }
    good = last_good_bench()
    if good:
        src, parsed = good
        result["stale_last_good"] = {
            "stale": True,
            "source": src,
            "metric": parsed.get("metric"),
            "value": parsed.get("value"),
            "unit": parsed.get("unit"),
            "vs_baseline": parsed.get("vs_baseline"),
        }
    print(json.dumps(result), flush=True)
    sys.exit(0)


def run_preflight() -> bool:
    """True iff a tiny device computation completes. ONE attempt with a
    long leash by default: healthy claim handshakes run 16 s–10 min, a
    dead relay surfaces UNAVAILABLE on its own at ~20 min (measured), and
    killing the probe mid-claim can itself wedge the relay for ~30 min —
    so waiting out the error beats kill-and-retry."""
    timeout = int(os.environ.get("BENCH_PREFLIGHT_TIMEOUT", "1500"))
    tries = int(os.environ.get("BENCH_PREFLIGHT_TRIES", "1"))
    env = dict(os.environ, BENCH_PREFLIGHT="1")
    for attempt in range(1, tries + 1):
        progress(f"preflight attempt {attempt}/{tries} (timeout {timeout}s)")
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            progress(f"preflight: timed out after {timeout}s")
            continue
        if proc.returncode == 0 and "PREFLIGHT_OK" in proc.stdout:
            progress(
                f"preflight: ok in {time.time() - t0:.0f}s "
                f"({proc.stdout.strip()})"
            )
            return True
        tail = (proc.stderr or "")[-300:]
        progress(f"preflight: rc={proc.returncode}; stderr tail: {tail}")
        if relay_down(proc.stderr or ""):
            return False  # definitive — no point retrying
    return False


def main():
    if os.environ.get("BENCH_PREFLIGHT") == "1":
        preflight()
        return
    if os.environ.get("BENCH_WORKER") == "1":
        worker()
        return
    # cheap relay-health gate before committing to 45-min variant budgets
    # (skippable for CPU smoke via BENCH_TINY, where there is no relay)
    if os.environ.get("BENCH_TINY", "0") != "1" and not run_preflight():
        emit_unavailable("relay preflight failed (tiny device "
                         "computation did not complete)")
    timeout = int(os.environ.get("BENCH_TIMEOUT", "2700"))
    # total wall budget: even with the preflight, a relay that dies
    # MID-run makes every variant eat its full per-variant timeout, so
    # stop launching variants once the budget is spent
    deadline = time.time() + int(os.environ.get("BENCH_DEADLINE", "7200"))
    consecutive_timeouts = 0
    for label, extra in VARIANTS:
        if time.time() > deadline:
            emit_unavailable(
                f"BENCH_DEADLINE exceeded before variant {label}"
            )
        env = dict(os.environ, BENCH_WORKER="1", **extra)
        progress(f"variant {label}: launching worker")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            progress(f"variant {label}: timeout")
            consecutive_timeouts += 1
            if consecutive_timeouts >= 2:
                # two successive full-budget timeouts = the relay (or its
                # remote-compile service) died mid-run; later variants
                # would only repeat the burn
                emit_unavailable(
                    "two consecutive variant timeouts "
                    f"({timeout}s each) — relay wedged mid-run"
                )
            continue
        consecutive_timeouts = 0
        for line in proc.stderr.splitlines():
            progress(f"[{label}] {line}")
        out = [
            ln
            for ln in proc.stdout.splitlines()
            if ln.startswith("{")
        ]
        if proc.returncode == 0 and out:
            result = json.loads(out[-1])
            result["details"]["variant"] = label
            print(json.dumps(result))
            return
        progress(
            f"variant {label}: failed rc={proc.returncode}; "
            f"stderr tail: {proc.stderr[-300:]}"
        )
        if relay_down(proc.stderr or ""):
            emit_unavailable(
                f"relay went down during variant {label}"
            )
    emit_unavailable(
        "all bench variants failed (relay alive)", status="bench_failed"
    )


if __name__ == "__main__":
    main()
