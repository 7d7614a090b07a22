"""jit-scanned DDIM inversion / reconstruction with an in-memory latent
trajectory.

Replaces the reference's host-side inversion loop (preprocess.py:198-261):
the 500-step python loop with per-timestep ``torch.save`` becomes a single
``lax.scan`` whose carry holds the stacked save-grid trajectory
``(n_save, F, h, w, 4)`` in device memory (~32 MB fp16 at the default
config — SURVEY.md §5), eliminating both per-step dispatch and the
disk round trips.

The UNet enters as an ``eps_fn(x, t) -> eps`` closure so depth-conditioned
and ControlNet-conditioned variants (reference preprocess.py:129-149,
207-209) compose without touching the sampler.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from tokenflow_tpu.diffusion import ddim

EpsFn = Callable[[jax.Array, jax.Array], jax.Array]


def chunked_eps_fn(eps_fn: EpsFn, frame_chunk: int | None) -> EpsFn:
    """Wrap eps_fn to process frames in fixed-size chunks via lax.map
    (bounds activation memory like the reference's frame micro-batching,
    preprocess.py:203, but inside one jit)."""
    if frame_chunk is None:
        return eps_fn

    def fn(x, t):
        f = x.shape[0]
        if f <= frame_chunk or f % frame_chunk != 0:
            return eps_fn(x, t)
        xc = x.reshape(f // frame_chunk, frame_chunk, *x.shape[1:])
        out = jax.lax.map(lambda xb: eps_fn(xb, t), xc)
        return out.reshape(f, *x.shape[1:])

    return fn


def inversion_xs(
    sched: ddim.DDIMSchedule, save_steps: int
) -> tuple[tuple[np.ndarray, ...], np.ndarray]:
    """Host-side per-step tables for the inversion scan:
    ((alpha_t, alpha_prev, t_asc, save_mask, save_slot), save_ts)."""
    save_ts, save_mask, save_slot = ddim.save_grid(
        sched.num_inference_steps, save_steps, sched.num_train_timesteps
    )
    alpha_t, alpha_prev = sched.inversion_alphas()
    t_asc = np.ascontiguousarray(sched.timesteps[::-1]).astype(np.int32)
    return (alpha_t, alpha_prev, t_asc, save_mask, save_slot), save_ts


def invert_scan(
    eps_fn: EpsFn,
    x: jax.Array,  # (F, h, w, 4)
    traj: jax.Array,  # (n_save, F, h, w, 4) — carried save-grid buffer
    xs: tuple,  # (a_t, a_prev, t, mask, slot), each (T_seg,)
    *,
    frame_chunk: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Jittable inversion scan over an arbitrary CONTIGUOUS slice of the
    per-step tables, carrying (x, traj). Scanning the full tables in one
    call is :func:`ddim_inversion`; scanning slices sequentially with the
    carry threaded is the segmented-dispatch form (exact same math —
    bounds single-program execution time, see pipeline.split_schedule)."""
    eps_fn = chunked_eps_fn(eps_fn, frame_chunk)

    def body(carry, step):
        x, traj = carry
        a_t, a_prev, t, mask, slot = step
        eps = eps_fn(x, t)
        x = ddim.ddim_invert_step(x, eps, a_t, a_prev).astype(x.dtype)
        traj = traj.at[slot].set(jnp.where(mask, x, traj[slot]))
        return (x, traj), None

    (x, traj), _ = jax.lax.scan(
        body, (x, traj), tuple(jnp.asarray(a) for a in xs)
    )
    return x, traj


def ddim_inversion(
    eps_fn: EpsFn,
    latents: jax.Array,
    sched: ddim.DDIMSchedule,
    save_steps: int,
    *,
    frame_chunk: int | None = None,
) -> tuple[jax.Array, jax.Array, np.ndarray]:
    """Invert clean latents to noise, recording the save-grid trajectory.

    Math parity: reference preprocess.py:198-230 (closed-form inversion over
    ascending timesteps with conditional-only embedding — CFG is not used
    during inversion, preprocess.py:271).

    Returns (x_T, trajectory, save_timesteps):
      x_T:            (F, h, w, 4) final inverted latents (reference's
                      trailing ``noisy_latents_{t}.pt`` save,
                      preprocess.py:229).
      trajectory:     (n_save, F, h, w, 4), trajectory[i] = latents at
                      save_timesteps[i] (ascending).
      save_timesteps: (n_save,) host numpy, ascending.
    """
    xs, save_ts = inversion_xs(sched, save_steps)
    traj0 = jnp.zeros((save_steps, *latents.shape), latents.dtype)
    x_final, traj = invert_scan(
        eps_fn, latents, traj0, xs, frame_chunk=frame_chunk
    )
    return x_final, traj, save_ts


def reconstruction_xs(
    sched: ddim.DDIMSchedule,
) -> tuple[np.ndarray, ...]:
    """Host-side per-step tables for the reconstruction scan."""
    alpha_t, alpha_prev = sched.recon_alphas()
    t_desc = sched.timesteps.astype(np.int32)
    return alpha_t, alpha_prev, t_desc


def recon_scan(
    eps_fn: EpsFn,
    x: jax.Array,
    xs: tuple,  # (a_t, a_prev, t), each (T_seg,)
    *,
    frame_chunk: int | None = None,
) -> jax.Array:
    """Jittable reconstruction scan over a contiguous table slice
    (segmented-dispatch form of :func:`ddim_reconstruction`)."""
    eps_fn = chunked_eps_fn(eps_fn, frame_chunk)

    def body(x, step):
        a_t, a_prev, t = step
        eps = eps_fn(x, t)
        x = ddim.ddim_step(x, eps, a_t, a_prev).astype(x.dtype)
        return x, None

    x0, _ = jax.lax.scan(body, x, tuple(jnp.asarray(a) for a in xs))
    return x0


def ddim_reconstruction(
    eps_fn: EpsFn,
    x_T: jax.Array,
    sched: ddim.DDIMSchedule,
    *,
    frame_chunk: int | None = None,
) -> jax.Array:
    """Sample back from inverted noise (the reference's inversion sanity
    check, preprocess.py:232-261 -> inverted.mp4)."""
    return recon_scan(
        eps_fn, x_T, reconstruction_xs(sched), frame_chunk=frame_chunk
    )
