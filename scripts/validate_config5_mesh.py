"""BASELINE config-5 geometry validation on the 8-device CPU mesh
(VERDICT r1 next-step #6): the 120-frame / 768p (96x96-latent) TokenFlow
edit loop, jitted over a frames mesh, must (a) compile and execute with
real shardings, (b) match the single-device loop, including with the
pivotal pass sharded (15 pivots over 8 devices — the uneven case), and
(c) work chunked (propagate_chunk) the way a single chip must run it.

Uses the tiny UNet at the config-5 GEOMETRY (frames/latent/window sizes
are the real ones; channel widths are tiny so the single-host harness can
execute it) — this validates sharding/communication/shape behavior, not
FLOPs. On-chip SD-2.1 768p timings live in PERF.md (scripts/validate_scan.py
with VS_LATENT=96).

Run:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/validate_config5_mesh.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# persistent compile cache: the 120-frame loops compile for tens of
# minutes on the single host core; reruns should pay execution only
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_cpu")

import jax
import jax.numpy as jnp
import numpy as np

from tokenflow_tpu import runtime
from tokenflow_tpu.diffusion import ddim
from tokenflow_tpu.editing import pipeline
from tokenflow_tpu.sharding import mesh as mesh_lib


def main():
    if jax.default_backend() != "cpu" or len(jax.devices()) < 8:
        raise SystemExit("run under the 8-device CPU harness (see docstring)")

    # BASELINE config 5: woman-running.mp4, 120 frames, 768p -> 96x96
    # latents, window 8 -> 15 pivots (uneven over 8 devices), 50 steps
    # (reduced to 1 here — the scan is per-step homogeneous, and the
    # single-host harness executes all 8 virtual devices on one core).
    f_total, hw, window = 120, 96, 8
    steps = int(os.environ.get("C5_STEPS", "1"))

    stack = runtime.load_stack(
        "tiny", init="random", dtype=jnp.float32, param_dtype=jnp.float32
    )
    print("stack loaded", flush=True)
    ctx_dim = stack.unet.config.cross_attention_dim
    sched = ddim.make_schedule(steps)
    save_ts = sched.timesteps[::-1].copy()
    schedule = pipeline.make_edit_schedule(
        sched, save_ts, pnp_attn_t=0.5, pnp_f_t=0.8
    )

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((f_total, hw, hw, 4)), jnp.float32)
    traj = jnp.asarray(
        rng.standard_normal((steps, f_total, hw, hw, 4)), jnp.float32
    )
    e3 = jnp.asarray(rng.standard_normal((3, 77, ctx_dim)), jnp.float32)
    key = jax.random.PRNGKey(0)

    # single device, chunked the way one chip must run 360 streams
    t0 = time.perf_counter()
    single = pipeline.tokenflow_sample_loop(
        stack.unet_apply, stack.unet_params, x0, traj, e3, schedule,
        window_size=window, guidance_scale=7.5, pnp=True, rng=key,
        propagate_chunk=40,
    )
    single.block_until_ready()
    print(f"single-device chunked loop: {time.perf_counter() - t0:.1f}s",
          flush=True)

    mesh = mesh_lib.make_frames_mesh(8)
    mesh_lib.check_divisible(f_total, mesh, window)

    # production mesh config: frames sharded + pivotal pass sharded (the
    # replicated-pivotal variant is covered at smaller size by
    # tests/test_sharding.py; one variant keeps this single-core run
    # within budget)
    t0 = time.perf_counter()
    loop = mesh_lib.sharded_edit_loop(
        stack.unet_apply, stack.unet_params, schedule, mesh,
        window_size=window, guidance_scale=7.5, pnp=True,
        shard_pivotal=True,
    )
    out = loop(stack.unet_params, x0, traj, e3, key)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    err = float(jnp.max(jnp.abs(out - single)))
    ok = err < 5e-5
    print(
        f"8-device mesh shard_pivotal=True: {dt:.1f}s "
        f"max|err|={err:.2e} {'OK' if ok else 'MISMATCH'}",
        flush=True,
    )
    if not ok:
        raise SystemExit(1)

    print(
        "CONFIG5-MESH-OK: 120 frames @ 96x96 latents, window 8 (15 pivots "
        "over 8 devices), sharded-pivotal == single-device"
    )


if __name__ == "__main__":
    main()
