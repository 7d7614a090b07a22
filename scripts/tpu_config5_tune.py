"""Config-5 (768p latents 96x96, 120 frames, window 8) edit-step tuning
sweep — one process, one TPU claim.

Parts (ordered so a late failure cannot lose earlier results; all output
is printed as it happens):
  A. flash block-size micro-sweep at the 768p SELF-attention shape
     (inversion + source-stream attention: Sq=Skv=9216)
  B. flash block-size micro-sweep at the 768p EXTENDED-attention shape
     (pivotal pass: Sq=9216, Skv=15*9216=138240 — config-5's 138k-token
     long-context case)
  C. 2-step edit-scan sweep over propagate_chunk {8,16,24} at the full
     config-5 geometry (the CLI default is 8; bigger chunks amortize
     per-UNet-call overhead at higher peak memory)
  D. buffer-donation A/B on the 512p bench loop (VERDICT round-2 #8)
     via scripts/tpu_donation_ab.main()

Variants that exceed the v5e 16 MB scoped-VMEM default fail at COMPILE
time (caught and reported) — they are ordered last within their part.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_config5_tune.py
Env: C5T_PARTS=ABCD (subset selects parts), C5T_REPS (3).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

PARTS = os.environ.get("C5T_PARTS", "ABCD").upper()
REPS = int(os.environ.get("C5T_REPS", "3"))


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
    except Exception as e:
        log(f"  {tag}: FAILED {repr(e)[:200]}")
        return None


def flash_sweep(tag, b, h, sq, skv, d=64):
    from tokenflow_tpu.kernels.flash_attention import flash_attention_pallas

    rng = np.random.default_rng(0)

    def r(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    q = r((b, sq, h, d))
    k = r((b, skv, h, d))
    v = r((b, skv, h, d))
    flops = b * h * 4 * sq * skv * d
    log(f"# {tag}: B={b} H={h} Sq={sq} Skv={skv} ({flops/1e12:.1f} TF/call)")

    results = {}
    # default first, exotic/VMEM-risky last
    for bq, bk in (
        (1024, 2048), (512, 2048), (2048, 1024), (1024, 1024),
        (512, 4096), (2048, 2048), (1024, 4096),
    ):
        fn = jax.jit(
            lambda q, k, v, bq=bq, bk=bk: flash_attention_pallas(
                q, k, v, bq=bq, bk=bk
            )
        )
        dt = timed(f"bq={bq} bk={bk}", fn, q, k, v)
        if dt:
            results[(bq, bk)] = dt
            log(f"    -> {flops / dt / 1e12:.1f} TF/s")
    ref = jax.jit(
        lambda q, k, v: jax.nn.dot_product_attention(
            q, k, v, scale=d**-0.5
        )
    )
    dt = timed("jax.nn.dot_product_attention", ref, q, k, v)
    if dt:
        log(f"    -> {flops / dt / 1e12:.1f} TF/s")
    if results:
        (bq, bk), best = min(results.items(), key=lambda kv: kv[1])
        log(f"# {tag} BEST: bq={bq} bk={bk} {flops / best / 1e12:.1f} TF/s")
    return results


def chunk_sweep():
    from tokenflow_tpu import runtime
    from tokenflow_tpu.diffusion import ddim
    from tokenflow_tpu.editing import pipeline

    F, HW, WINDOW, STEPS = 120, 96, 8, 2
    stack = runtime.load_stack(
        "2.1", init="random", dtype=jnp.bfloat16, param_dtype=jnp.bfloat16
    )
    sched = ddim.make_schedule(50)
    schedule = pipeline.split_schedule(
        pipeline.make_edit_schedule(
            sched, sched.timesteps[::-1].copy()[:50],
            pnp_attn_t=0.5, pnp_f_t=0.8,
        ),
        STEPS,
    )[0]
    rng = np.random.default_rng(0)
    x_init = jnp.asarray(
        rng.standard_normal((F, HW, HW, 4)), jnp.bfloat16
    )
    traj = jnp.asarray(
        rng.standard_normal((STEPS, F, HW, HW, 4)), jnp.bfloat16
    )
    embeds3 = jnp.asarray(
        rng.standard_normal((3, 77, stack.unet.config.cross_attention_dim)),
        jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    log(f"# chunk sweep: F={F} latent {HW}x{HW} window {WINDOW} "
        f"steps/dispatch {STEPS}")

    for chunk in (8, 16, 24):
        def loop_fn(params, x0, tr, e3, k, chunk=chunk):
            return pipeline.tokenflow_sample_loop(
                stack.unet_apply, params, x0, tr, e3, schedule,
                window_size=WINDOW, guidance_scale=7.5, pnp=True, rng=k,
                propagate_chunk=chunk,
            )

        dt = timed(
            f"propagate_chunk={chunk}",
            jax.jit(loop_fn),
            stack.unet_params, x_init, traj, embeds3, key,
            reps=2,
        )
        if dt:
            log(f"    -> {dt / STEPS:.2f} s/step, "
                f"{F * STEPS / dt:.3f} edited frames/s")


def main():
    log("devices:", jax.devices())
    if "A" in PARTS:
        # 768p self-attention: source stream + inversion (batch 8 as the
        # config-5 CLI runs it)
        flash_sweep("A self-attn 768p", b=8, h=5, sq=9216, skv=9216)
    if "B" in PARTS:
        # pivotal extended attention: 15 keyframes x 3 streams = 45
        # streams in the real pass; 9 streams keeps the call ~1.5 s
        flash_sweep("B extended 768p (138k KV)", b=9, h=5, sq=9216,
                    skv=138240)
    if "C" in PARTS:
        chunk_sweep()
    if "D" in PARTS:
        from scripts import tpu_donation_ab

        log("# D donation A/B (512p bench loop)")
        tpu_donation_ab.main()


if __name__ == "__main__":
    main()
