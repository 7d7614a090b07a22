#!/usr/bin/env python
"""A/B: buffer donation at the edit-loop jit boundary (VERDICT round-2 #8).

Measures the bench workload's steady edit-loop time (40f @512p latents,
50 steps, SD-2.1-size random weights, bf16) for

  a) the plain ``jax.jit(loop_fn)`` the CLIs use today, and
  b) ``donate_argnums`` on the noisy start latents + inversion
     trajectory (the two per-run tensors; x_init aliases the output
     buffer, src_traj's 65 MB may be reused for intermediates after its
     last scan read).

Inside the scan XLA already updates the carry in place, so the expected
win is bounded by jit-boundary copies/allocations — this pins down
whether the round-2 op profile's "scan plumbing/copies" (7.8% of step)
has any donation-addressable component. Both variants run in ONE process
(one TPU claim); donated calls consume their inputs, so variant (b)
times K pre-staged input copies.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_donation_ab.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from tokenflow_tpu import runtime
from tokenflow_tpu.diffusion import ddim
from tokenflow_tpu.editing import pipeline

F, STEPS, HW, WINDOW = 40, 50, 64, 8
REPS = 3  # timed calls per variant


def sync(o):
    # block_until_ready is a no-op under the axon relay (CLAUDE.md)
    return float(jnp.sum(o.astype(jnp.float32)))


def main():
    dtype = jnp.bfloat16
    stack = runtime.load_stack(
        "2.1", init="random", dtype=dtype, param_dtype=dtype
    )
    ctx_dim = stack.unet.config.cross_attention_dim
    sched = ddim.make_schedule(STEPS)
    schedule = pipeline.make_edit_schedule(
        sched, sched.timesteps[::-1].copy(), pnp_attn_t=0.5, pnp_f_t=0.8
    )
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((F, HW, HW, 4))
    tr_np = rng.standard_normal((STEPS, F, HW, HW, 4))
    embeds3 = jnp.asarray(rng.standard_normal((3, 77, ctx_dim)), dtype)
    key = jax.random.PRNGKey(0)

    def loop_fn(params, x0, tr, e3, k):
        return pipeline.tokenflow_sample_loop(
            stack.unet_apply, params, x0, tr, e3, schedule,
            window_size=WINDOW, guidance_scale=7.5, pnp=True, rng=k,
        )

    results = {}
    for label, jitted in (
        ("plain", jax.jit(loop_fn)),
        ("donate", jax.jit(loop_fn, donate_argnums=(1, 2))),
    ):
        # fresh device inputs per timed call (donation consumes them)
        inputs = [
            (jnp.asarray(x_np, dtype), jnp.asarray(tr_np, dtype))
            for _ in range(REPS + 1)
        ]
        for x0, tr in inputs:
            sync(x0), sync(tr)  # stage on device before timing
        x0, tr = inputs[0]
        print(f"# [{label}] compile + first call", flush=True)
        t0 = time.perf_counter()
        sync(jitted(stack.unet_params, x0, tr, embeds3, key))
        print(
            f"# [{label}] first {time.perf_counter() - t0:.1f}s", flush=True
        )
        times = []
        for x0, tr in inputs[1:]:
            t0 = time.perf_counter()
            sync(jitted(stack.unet_params, x0, tr, embeds3, key))
            times.append(time.perf_counter() - t0)
        results[label] = min(times)
        print(f"# [{label}] steady {times} -> best {min(times):.3f}s",
              flush=True)

    a, b = results["plain"], results["donate"]
    print(
        f"RESULT plain={a:.3f}s donate={b:.3f}s "
        f"delta={100 * (a - b) / a:+.2f}%",
        flush=True,
    )


if __name__ == "__main__":
    main()
