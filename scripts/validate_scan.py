"""Validate the full-size TokenFlow edit scan on TPU under different kernel
dispatch modes, to isolate Pallas kernel faults that only appear inside the
compiled scan (a worker crash kills the process, so each variant runs in a
separate process — drive with scripts/validate_scan.sh or manually):

    TOKENFLOW_PALLAS=0 python scripts/validate_scan.py          # jnp only
    TOKENFLOW_PALLAS_MATCH=0 python scripts/validate_scan.py    # flash only
    TOKENFLOW_PALLAS_FLASH=0 python scripts/validate_scan.py    # match only
    python scripts/validate_scan.py                             # both (auto)

Env: VS_STEPS (default 2), VS_FRAMES (40), VS_LATENT (64), VS_WINDOW (8).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tokenflow_tpu import runtime
    from tokenflow_tpu.diffusion import ddim
    from tokenflow_tpu.editing import pipeline

    steps = int(os.environ.get("VS_STEPS", "2"))
    f_total = int(os.environ.get("VS_FRAMES", "40"))
    hw = int(os.environ.get("VS_LATENT", "64"))
    window = int(os.environ.get("VS_WINDOW", "8"))
    chunk_env = os.environ.get("VS_CHUNK", "")
    chunk = int(chunk_env) if chunk_env else None

    mode = {
        k: os.environ.get(k, "unset")
        for k in ("TOKENFLOW_PALLAS", "TOKENFLOW_PALLAS_FLASH", "TOKENFLOW_PALLAS_MATCH")
    }
    print(f"# mode={mode} steps={steps}", flush=True)

    stack = runtime.load_stack(
        "2.1", init="random", dtype=jnp.bfloat16, param_dtype=jnp.bfloat16
    )
    print("# stack loaded", flush=True)

    sched = ddim.make_schedule(steps)
    save_ts = sched.timesteps[::-1].copy()
    schedule = pipeline.make_edit_schedule(
        sched, save_ts, pnp_attn_t=0.5, pnp_f_t=0.8
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

    fused = os.environ.get("VS_FUSED", "0") == "1"

    def loop_fn(params, x0, tr, e3, key):
        return pipeline.tokenflow_sample_loop(
            stack.unet_apply, params, x0, tr, e3, schedule,
            window_size=window, guidance_scale=7.5, pnp=True, rng=key,
            fused=fused, propagate_chunk=chunk,
        )

    loop = jax.jit(loop_fn)
    t0 = time.perf_counter()
    out = loop(stack.unet_params, x_init, traj, embeds3, jax.random.PRNGKey(0))
    s = float(jnp.sum(out.astype(jnp.float32)))
    t1 = time.perf_counter() - t0
    print(f"# first call: {t1:.1f}s sum={s:.3f}", flush=True)
    t0 = time.perf_counter()
    out = loop(stack.unet_params, x_init, traj, embeds3, jax.random.PRNGKey(0))
    s = float(jnp.sum(out.astype(jnp.float32)))
    t2 = time.perf_counter() - t0
    finite = bool(jnp.isfinite(out.astype(jnp.float32)).all())
    print(
        f"VALIDATE-OK steady={t2:.2f}s per_step={t2 / steps:.3f}s "
        f"finite={finite}", flush=True,
    )


if __name__ == "__main__":
    main()
