"""On-chip s/step A/B: exact vs approximate (source-free) propagation
(pipeline prop_approx — VERDICT r04 task #4 / PERF.md known-overhead #3),
one process, both bench geometries:

  S: 512p bench geometry (40 f @ 64x64 latents, window 8)
  L: 768p config-5 slice  (24 f @ 96x96 latents, window 8, chunk 8)

Also times the SDEdit family (pnp=False), where approx additionally
drops the source stream from the PIVOTAL pass (editctx src_free_piv),
and the ControlNet family (pnp=False + residual branch on every pass,
random-init SD-size encoder — same compute shape as pretrained).

Run: PYTHONPATH=/root/repo python scripts/tpu_prop_approx_ab.py
Env: PA_PARTS=SL, PA_REPS (2), PA_STEPS (2),
     PA_FAMS=pnp,sdedit,cn (comma list; default all three).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

PARTS = os.environ.get("PA_PARTS", "SL").upper()
REPS = int(os.environ.get("PA_REPS", "2"))
STEPS = int(os.environ.get("PA_STEPS", "2"))
FAMS = [
    f.strip()
    for f in os.environ.get("PA_FAMS", "pnp,sdedit,cn").split(",")
    if f.strip()
]


def log(*a):
    print(*a, flush=True)


def sync(o):
    return float(jnp.sum(o.astype(jnp.float32)))


def timed(tag, fn, *args, reps=REPS):
    try:
        t0 = time.perf_counter()
        sync(fn(*args))
        log(f"  {tag}: first {time.perf_counter() - t0:.1f}s")
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn(*args))
            times.append(time.perf_counter() - t0)
        best = min(times)
        log(f"  {tag}: steady {[f'{t:.3f}' for t in times]} -> "
            f"{best / STEPS:.3f} s/step")
        return best
    except Exception as e:  # noqa: BLE001 — report and continue
        log(f"  {tag}: FAILED {repr(e)[:200]}")
        return None


def scan_ab(f_total, hw, window, chunk, label, sd_version="2.1"):
    from tokenflow_tpu import runtime
    from tokenflow_tpu.diffusion import ddim
    from tokenflow_tpu.editing import pipeline

    dt = jnp.float32 if sd_version.startswith("tiny") else jnp.bfloat16
    stack = runtime.load_stack(
        sd_version, init="random", dtype=dt, param_dtype=dt
    )
    sched = ddim.make_schedule(STEPS)
    schedule = pipeline.make_edit_schedule(
        sched, sched.timesteps[::-1].copy(), pnp_attn_t=0.5, pnp_f_t=0.8
    )
    rng = np.random.default_rng(0)
    x_init = jnp.asarray(
        rng.standard_normal((f_total, hw, hw, 4)), stack.dtype
    )
    traj = jnp.asarray(
        rng.standard_normal((STEPS, f_total, hw, hw, 4)), stack.dtype
    )
    embeds3 = jnp.asarray(
        rng.standard_normal((3, 77, stack.unet.config.cross_attention_dim)),
        stack.dtype,
    )
    key = jax.random.PRNGKey(0)
    log(f"# {label}: F={f_total} latent {hw}x{hw} window {window} "
        f"chunk {chunk}")

    results = {}
    for fam in [f for f in FAMS if f in ("pnp", "sdedit")]:
        pnp = fam == "pnp"
        for approx in (False, True):
            def loop_fn(params, x0, tr, e3, k, pnp=pnp, approx=approx):
                return pipeline.tokenflow_sample_loop(
                    stack.unet_apply, params, x0, tr, e3, schedule,
                    window_size=window, guidance_scale=7.5, pnp=pnp,
                    rng=k, propagate_chunk=chunk, prop_approx=approx,
                )

            tag = f"{fam}-{'approx' if approx else 'exact'}"
            dt = timed(
                tag, jax.jit(loop_fn),
                stack.unet_params, x_init, traj, embeds3, key,
            )
            if dt:
                results[tag] = dt / STEPS

    if "cn" in FAMS:
        # ControlNet residual branch on every pass (run_controlnet loop
        # shape) — random-init SD-size encoder, same compute as pretrained
        from tokenflow_tpu.cli.controlnet_utils import load_controlnet

        cn_model, cn_params = load_controlnet(stack, None, "random")
        vae_factor = 2 ** (len(stack.vae.config.block_out_channels) - 1)
        canny = jnp.asarray(
            rng.uniform(
                0, 1, (f_total, hw * vae_factor, hw * vae_factor, 3)
            ),
            jnp.float32,
        )
        for approx in (False, True):
            def cn_loop_fn(params, cn_p, x0, tr, e3, k, cn, approx=approx):
                def cn_fn(sample, t, ctx, cond):
                    return cn_model.apply(cn_p, sample, t, ctx, cond)

                return pipeline.tokenflow_sample_loop(
                    stack.unet_apply, params, x0, tr, e3, schedule,
                    window_size=window, guidance_scale=7.5, pnp=False,
                    rng=k, propagate_chunk=chunk,
                    controlnet_fn=cn_fn, cond_image=cn,
                    prop_approx=approx,
                )

            tag = f"cn-{'approx' if approx else 'exact'}"
            dt = timed(
                tag, jax.jit(cn_loop_fn),
                stack.unet_params, cn_params, x_init, traj, embeds3,
                key, canny,
            )
            if dt:
                results[tag] = dt / STEPS

    for fam in ("pnp", "sdedit", "cn"):
        a, b = results.get(f"{fam}-exact"), results.get(f"{fam}-approx")
        if a and b:
            log(f"# {label} {fam}: exact {a:.3f} s/step, approx {b:.3f} "
                f"s/step -> approx/exact = {b / a:.3f}")


def main():
    log("devices:", jax.devices())
    if "T" in PARTS:  # weightless CPU smoke of the harness itself
        scan_ab(4, 16, 2, None, "tiny smoke", sd_version="tiny")
    if "S" in PARTS:
        scan_ab(40, 64, 8, None, "512p bench geometry")
    if "L" in PARTS:
        scan_ab(24, 96, 8, 8, "768p config-5 slice")


if __name__ == "__main__":
    main()
