"""Device-mesh sharding for the frame axis (SURVEY.md §2.12).

The parallelism model: video frames are the batch dimension, so the mesh
has a single ``frames`` axis. Per pass:

  - VAE encode/decode and DDIM inversion are embarrassingly parallel over
    frames — pure data parallelism, zero communication beyond the initial
    shard placement;
  - propagation passes are frame-parallel given the (small, replicated)
    keyframe cache — window boundaries never cross shard boundaries when
    frames_per_device is a multiple of window_size;
  - the pivotal pass is the coupling point: extended attention flattens
    the keyframe axis into the sequence, so sharding it means sharding the
    query sequence while the K/V sequence is all-gathered over ICI (the
    Ulysses-style analog — SURVEY.md §5 "long-context"). At default sizes
    (5 keyframes) the pass is small and XLA freely replicates it.

Everything uses jit + NamedSharding annotations; XLA inserts the
collectives. No NCCL/MPI analog exists or is needed.

Verified against the compiled 8-device HLO (scripts/inspect_sharded_hlo.py,
round 2): with the FRAME-MAJOR batch layout (ops/editctx.py) the entire
edit step lowers to a single small all-reduce implementing the
``x[piv]`` / ``src[piv]`` pivot gathers (a few hundred KB at 512p); GSPMD
computes the pivotal pass replicated on every device — wall-clock
equivalent to compute-once-plus-broadcast, and the cache is then born
replicated, so the propagation pass runs fully frame-sharded (per-device
batch = 3 * local_frames) with zero further communication. Round 1's
stream-major layout instead forced a full hidden-state all-gather at
every edit site per step (not an expressible sharding), which this layout
eliminates.

``shard_pivotal=True`` additionally shards the keyframe pass itself
(pivotal_shardings / pipeline.PivotalShardings): the replicated pivotal
pass is wall-clock-fine on one chip but Amdahl-limits a mesh (at 8
devices it would be ~70% of the sharded step). Compiled-HLO audit of the
sharded-pivotal loop: all collectives are small all-gathers (the
extended-attention KV flatten and the per-site cache broadcast — the
Ulysses-style pattern of SURVEY.md §2.12) plus the same pivot all-reduce;
no full-replication-sized collectives, and the keyframe count does not
need to divide the mesh (GSPMD pads odd shards; parity tested for both
even and uneven pivot counts, tests/test_sharding.py).

Pallas kernels on a mesh: a plain pallas_call has no SPMD rule, so GSPMD
would compute it replicated on every device. The flash-attention and
token-match kernels therefore carry custom_partitioning rules
(kernels/flash_attention.py::flash_attention_sharded,
kernels/token_match.py::token_match_gather_sharded — queries/frames stay
sharded, K/V and keyframe tables are gathered), engaged via
TOKENFLOW_FLASH_SHARDED / TOKENFLOW_MATCH_SHARDED (the CLI sets both on
TPU meshes, cli/common.py::maybe_frames_mesh); kernels without a rule
(GroupNorm) default to their shardable jnp paths under a mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FRAMES = "frames"


def make_frames_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), axis_names=(FRAMES,))


def frames_sharding(mesh: Mesh, frame_axis: int = 0) -> NamedSharding:
    spec = [None] * frame_axis + [FRAMES]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def check_divisible(n_frames: int, mesh: Mesh, window_size: int = 1) -> bool:
    """Validate the frame axis factors over the mesh.

    Frame-count indivisibility is an error (GSPMD padding of the batch
    axis changes the windows the editing math sees). Window-boundary
    locality is a PERFORMANCE property, not a correctness one — BASELINE
    config 5 itself (120 frames / v5e-8 / window 8 -> 15 frames/device)
    cannot be window-local, and GSPMD simply inserts boundary gathers for
    the straddling windows — so misalignment warns and returns False.
    """
    n_dev = mesh.devices.size
    if n_frames % n_dev:
        raise ValueError(
            f"n_frames={n_frames} must divide over {n_dev} devices"
        )
    per_dev = n_frames // n_dev
    if window_size > 1 and per_dev % window_size:
        print(
            f"[tokenflow-tpu] frames/device={per_dev} is not a multiple of "
            f"window_size={window_size}: propagation windows straddle "
            f"shards (correct, small boundary collectives)",
            flush=True,
        )
        return False
    return True


def pivotal_shardings(mesh: Mesh):
    """Sharding constraints that make the pivotal pass compute sharded over
    keyframes (see pipeline.PivotalShardings). The cache leaves keep the
    keyframe axis sharded; the propagation pass's per-site consumption
    all-gathers them (once per site per step) over ICI."""
    from tokenflow_tpu.editing import pipeline

    return pipeline.PivotalShardings(
        batch=NamedSharding(mesh, P(FRAMES)),
        pivot_h=NamedSharding(mesh, P(FRAMES)),
        kf_attn=NamedSharding(mesh, P(None, FRAMES)),
    )


def sharded_edit_loop(
    unet_apply,
    params,
    schedule,
    mesh: Mesh,
    *,
    window_size: int,
    guidance_scale: float,
    pnp: bool,
    propagate_chunk: Optional[int] = None,
    shard_pivotal: bool = False,
    prop_approx: bool = False,
):
    """jit the TokenFlow edit loop over a frames mesh.

    Returns fn(params, x_init, traj, embeds3, rng) with x/traj sharded on
    the frame axis and params/embeds replicated. ``shard_pivotal`` also
    shards the keyframe pass over the mesh (see pivotal_shardings);
    ``prop_approx`` selects the source-free propagation pass (NON-PARITY
    fast mode — same flag cli/common.build_edit_loop passes)."""
    from tokenflow_tpu.editing import pipeline

    psh = pivotal_shardings(mesh) if shard_pivotal else None

    def loop_fn(p, x0, traj, embeds3, rng):
        return pipeline.tokenflow_sample_loop(
            unet_apply, p, x0, traj, embeds3, schedule,
            window_size=window_size, guidance_scale=guidance_scale,
            pnp=pnp, rng=rng, propagate_chunk=propagate_chunk,
            pivotal_shardings=psh,
            prop_approx=prop_approx,
        )

    fsh = frames_sharding(mesh)
    tsh = frames_sharding(mesh, frame_axis=1)
    repl = replicated(mesh)
    return jax.jit(
        loop_fn,
        in_shardings=(
            jax.tree.map(lambda _: repl, params),
            fsh,
            tsh,
            repl,
            repl,
        ),
        out_shardings=fsh,
    )


def sharded_inversion(
    eps_builder, params, sched, save_steps: int, mesh: Mesh
):
    """jit the inversion scan with latents sharded over frames.

    ``eps_builder(params) -> eps_fn(x, t)``: params enter as a traced,
    replicated jit argument (closure-captured params would be inlined as
    HLO constants — multi-GB programs break the remote-compile transport).
    Returns fn(x0) with params bound.
    """
    from tokenflow_tpu.diffusion import inversion

    fsh = frames_sharding(mesh)
    tsh = frames_sharding(mesh, frame_axis=1)
    repl = replicated(mesh)

    def fn(p, x0):
        return inversion.ddim_inversion(
            eps_builder(p), x0, sched, save_steps
        )

    jitted = jax.jit(
        fn,
        in_shardings=(jax.tree.map(lambda _: repl, params), fsh),
        out_shardings=(fsh, tsh, None),
    )
    return lambda x0: jitted(params, x0)
