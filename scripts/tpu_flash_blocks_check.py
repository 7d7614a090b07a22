"""Validate the round-4 shape-dependent flash block table
(kernels/flash_attention.py::default_blocks) on chip, in ONE process.

The round-4 config-5 sweep (scripts/tpu_config5_tune.py parts A/B) found
the round-2 default (bq=1024, bk=2048) is wrong for 768p shapes — but
the new table also reclassifies the 512p PIVOTAL pass (Sq=Skv=20480,
flattened keyframes), which the sweeps never measured. This probe:

  1. micro-times the 512p pivotal-class shapes under the old and new
     block choices (20480x20480 B=2 H=5, 5120x20480 B=2 H=10, and the
     v5e-8 PER-SHARD pivotal shape 2560x20480 B=2 H=5 — the geometry
     flash_attention_sharded's local block classing sees, ADVICE r04 #1);
  2. runs the 2-step 512p bench-geometry edit scan with the NEW table vs
     the OLD blocks forced via env (fresh jit wrappers force retrace);
  3. same at the 768p config-5 geometry (24 frames, chunk 8 — the
     single-chip-HBM-safe slice).

Decision rule: new table must not regress the 512p scan; the 768p scan
should improve (parts A/B project ~10-15%% of its attention time).

Run: PYTHONPATH=/root/repo python scripts/tpu_flash_blocks_check.py
Env: FB_PARTS=MSL (M=micro, S=512p scan, L=768p scan), FB_REPS (2).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

PARTS = os.environ.get("FB_PARTS", "MSL").upper()
REPS = int(os.environ.get("FB_REPS", "2"))


def log(*a):
    print(*a, flush=True)


def sync(o):
    # block_until_ready is a no-op under the axon relay (CLAUDE.md)
    return float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))


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
        log(f"  {tag}: steady {[f'{t:.3f}' for t in times]} -> {best:.3f}s")
        return best
    except Exception as e:  # noqa: BLE001 — report and continue
        log(f"  {tag}: FAILED {repr(e)[:200]}")
        return None


def micro():
    from tokenflow_tpu.kernels.flash_attention import flash_attention_pallas

    rng = np.random.default_rng(0)

    def r(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    # third shape: the PER-SHARD geometry of the 512p sharded pivotal
    # pass on a v5e-8 (global Sq=20480 / 8 shards = 2560 query rows vs
    # the full gathered KV) — flash_attention_sharded now classes blocks
    # on this LOCAL shape (ADVICE r04 #1), so its class must be measured
    for b, h, sq, skv in (
        (2, 5, 20480, 20480),
        (2, 10, 5120, 20480),
        (2, 5, 2560, 20480),
    ):
        q, k, v = r((b, sq, h, 64)), r((b, skv, h, 64)), r((b, skv, h, 64))
        flops = b * h * 4 * sq * skv * 64
        log(f"# micro B={b} H={h} Sq={sq} Skv={skv} ({flops/1e12:.1f} TF)")
        for bq, bk in ((1024, 2048), (2048, 1024), (1024, 1024)):
            fn = jax.jit(
                lambda q, k, v, bq=bq, bk=bk: flash_attention_pallas(
                    q, k, v, bq=bq, bk=bk
                )
            )
            dt = timed(f"bq={bq} bk={bk}", fn, q, k, v)
            if dt:
                log(f"    -> {flops / dt / 1e12:.1f} TF/s")


def scan(f_total, hw, window, chunk, label):
    from tokenflow_tpu import runtime
    from tokenflow_tpu.diffusion import ddim
    from tokenflow_tpu.editing import pipeline

    steps = 2
    stack = runtime.load_stack(
        "2.1", init="random", dtype=jnp.bfloat16, param_dtype=jnp.bfloat16
    )
    sched = ddim.make_schedule(steps)
    schedule = pipeline.make_edit_schedule(
        sched, sched.timesteps[::-1].copy(), pnp_attn_t=0.5, pnp_f_t=0.8
    )
    rng = np.random.default_rng(0)
    x_init = jnp.asarray(
        rng.standard_normal((f_total, hw, hw, 4)), jnp.bfloat16
    )
    traj = jnp.asarray(
        rng.standard_normal((steps, f_total, hw, hw, 4)), jnp.bfloat16
    )
    embeds3 = jnp.asarray(
        rng.standard_normal((3, 77, stack.unet.config.cross_attention_dim)),
        jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    log(f"# scan {label}: F={f_total} latent {hw}x{hw} window {window} "
        f"chunk {chunk}")

    results = {}
    for tag, env in (
        ("old-blocks (1024x2048 forced)",
         {"TOKENFLOW_FLASH_BQ": "1024", "TOKENFLOW_FLASH_BK": "2048"}),
        ("new-table (per-shape defaults)", {}),
    ):
        for k_, v_ in env.items():
            os.environ[k_] = v_

        # fresh lambda per variant: block sizes are read at TRACE time, so
        # a shared jit wrapper would silently reuse the first compilation
        def loop_fn(params, x0, tr, e3, k):
            return pipeline.tokenflow_sample_loop(
                stack.unet_apply, params, x0, tr, e3, schedule,
                window_size=window, guidance_scale=7.5, pnp=True, rng=k,
                propagate_chunk=chunk,
            )

        dt = timed(
            tag, jax.jit(loop_fn),
            stack.unet_params, x_init, traj, embeds3, key,
        )
        for k_ in env:
            os.environ.pop(k_, None)
        if dt:
            results[tag] = dt
            log(f"    -> {dt / steps:.3f} s/step")
    if len(results) == 2:
        old, new = list(results.values())
        log(f"# scan {label}: new/old = {new / old:.3f}")


def main():
    log("devices:", jax.devices())
    if "M" in PARTS:
        micro()
    if "S" in PARTS:
        scan(40, 64, 8, None, "512p bench geometry")
    if "L" in PARTS:
        scan(24, 96, 8, 8, "768p config-5 slice")


if __name__ == "__main__":
    main()
