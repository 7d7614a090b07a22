"""Inspect the compiled HLO of the 8-device sharded TokenFlow edit step
(VERDICT r1 next-step #7): verify the pivotal-pass cache is computed once
and broadcast (not recomputed per shard), propagation inputs are not
fully replicated, and the collectives are the expected gathers around the
pivot selection / keyframe cache.

Run under the CPU virtual mesh:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/inspect_sharded_hlo.py [--dump out.hlo]

Writes a summary of collective ops (kind, operand shape, bytes) to stdout.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tokenflow_tpu import runtime
from tokenflow_tpu.diffusion import ddim
from tokenflow_tpu.editing import pipeline
from tokenflow_tpu.sharding import mesh as mesh_lib

SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|pred)\[([\d,]*)\]")


def tensor_bytes(sig: str) -> int:
    """Sum the bytes of every tensor shape in sig (handles tuples)."""
    itemsize = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "pred": 1}
    total = 0
    for m in SHAPE_RE.finditer(sig):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * itemsize[dt]
    return total


def summarize(hlo: str) -> dict:
    counts: dict[str, list] = {}
    for line in hlo.splitlines():
        ls = line.strip()
        m = re.match(
            r"(?:ROOT )?%?[\w.\-]+ = (.+?) (all-gather(?:-start)?|"
            r"all-reduce(?:-start)?|collective-permute(?:-start)?|"
            r"all-to-all|reduce-scatter)\(",
            ls,
        )
        if m:
            sig, kind = m.groups()
            counts.setdefault(kind, []).append((sig, tensor_bytes(sig)))
    return counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", default=None, help="write full HLO here")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--window", type=int, default=2)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--hw", type=int, default=16)
    ap.add_argument(
        "--shard-pivotal", action="store_true",
        help="constrain the pivotal pass sharded (pipeline.PivotalShardings)",
    )
    args = ap.parse_args()

    n_dev = len(jax.devices())
    if jax.default_backend() != "cpu" or n_dev < 8:
        raise SystemExit(
            "run under JAX_PLATFORMS=cpu with "
            "--xla_force_host_platform_device_count=8 (see module docstring)"
        )
    mesh = mesh_lib.make_frames_mesh(8)

    stack = runtime.load_stack(
        "tiny", init="random", dtype=jnp.float32, param_dtype=jnp.float32
    )
    ctx_dim = stack.unet.config.cross_attention_dim
    sched = ddim.make_schedule(args.steps)
    save_ts = sched.timesteps[::-1].copy()
    schedule = pipeline.make_edit_schedule(
        sched, save_ts, pnp_attn_t=0.5, pnp_f_t=0.8
    )

    loop = mesh_lib.sharded_edit_loop(
        stack.unet_apply, stack.unet_params, schedule, mesh,
        window_size=args.window, guidance_scale=7.5, pnp=True,
        shard_pivotal=args.shard_pivotal,
    )

    rng = np.random.default_rng(0)
    f, hw = args.frames, args.hw
    x0 = jnp.asarray(rng.standard_normal((f, hw, hw, 4)), jnp.float32)
    traj = jnp.asarray(
        rng.standard_normal((args.steps, f, hw, hw, 4)), jnp.float32
    )
    e3 = jnp.asarray(rng.standard_normal((3, 77, ctx_dim)), jnp.float32)

    lowered = loop.lower(
        stack.unet_params, x0, traj, e3, jax.random.PRNGKey(0)
    )
    compiled = lowered.compile()
    hlo = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as fh:
            fh.write(hlo)
        print(f"full HLO -> {args.dump} ({len(hlo)} chars)")

    counts = summarize(hlo)
    print(f"\n=== collectives in the compiled {n_dev}-device edit loop ===")
    total = 0
    for kind, items in sorted(counts.items()):
        by = sum(b for _, b in items)
        total += by
        print(f"{kind:22s} x{len(items):<4d} total {by/1e6:8.3f} MB")
        # largest 5
        for sig, b in sorted(items, key=lambda t: -t[1])[:5]:
            print(f"    {b/1e6:8.3f} MB  {sig}")
    print(f"TOTAL collective payload: {total/1e6:.3f} MB per loop call")

    # Cross-check against the workload: the per-step semantic minimum is
    # gathering the pivot latents (one frame per window, 3 streams) +
    # broadcasting the keyframe cache (pivot_h + kf_attn per site).
    n_piv = f // args.window
    piv_bytes = args.steps * 3 * n_piv * hw * hw * 4 * 4
    print(
        f"(reference point: pivot latents for the whole loop = "
        f"{piv_bytes/1e6:.3f} MB; cache size scales with sites x seq x dim)"
    )

    # Detect full replication of the sharded propagation inputs: an
    # all-gather of the full (3F, S, D) hidden states would show up as a
    # >= f * hw*hw * dim tensor.
    big = [
        (k, sig, b)
        for k, items in counts.items()
        for sig, b in items
        if b > 3 * f * hw * hw * 64 * 4
    ]
    if big:
        print("\nWARNING: suspiciously large collectives (possible full "
              "replication of propagation inputs):")
        for k, sig, b in big:
            print(f"  {k} {b/1e6:.3f} MB {sig}")
    else:
        print("\nOK: no full-replication-sized collectives detected")


if __name__ == "__main__":
    main()
