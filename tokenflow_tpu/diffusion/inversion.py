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
                      trailing ``noisy_latents_{t_final}.pt`` save,
                      preprocess.py:229).
      trajectory:     (n_save, F, h, w, 4), trajectory[i] = latents at
                      save_timesteps[i] (ascending).
      save_timesteps: (n_save,) host numpy, ascending.
    """
    save_ts, save_mask, save_slot = ddim.save_grid(
        sched.num_inference_steps, save_steps, sched.num_train_timesteps
    )
    alpha_t, alpha_prev = sched.inversion_alphas()
    t_asc = sched.timesteps[::-1].astype(np.int32)
    eps_fn = chunked_eps_fn(eps_fn, frame_chunk)

    traj0 = jnp.zeros((save_steps, *latents.shape), latents.dtype)

    def body(carry, xs):
        x, traj = carry
        a_t, a_prev, t, mask, slot = xs
        eps = eps_fn(x, t)
        x = ddim.ddim_invert_step(x, eps, a_t, a_prev).astype(x.dtype)
        traj = traj.at[slot].set(jnp.where(mask, x, traj[slot]))
        return (x, traj), None

    xs = (
        jnp.asarray(alpha_t),
        jnp.asarray(alpha_prev),
        jnp.asarray(t_asc),
        jnp.asarray(save_mask),
        jnp.asarray(save_slot),
    )
    (x_final, traj), _ = jax.lax.scan(body, (latents, traj0), xs)
    return x_final, traj, save_ts


def ddim_reconstruction(
    eps_fn: EpsFn,
    x_T: jax.Array,
    sched: ddim.DDIMSchedule,
    *,
    frame_chunk: int | None = None,
) -> jax.Array:
    """Sample back from inverted noise (the reference's inversion sanity
    check, preprocess.py:232-261 -> inverted.mp4)."""
    alpha_t, alpha_prev = sched.recon_alphas()
    t_desc = sched.timesteps.astype(np.int32)
    eps_fn = chunked_eps_fn(eps_fn, frame_chunk)

    def body(x, xs):
        a_t, a_prev, t = xs
        eps = eps_fn(x, t)
        x = ddim.ddim_step(x, eps, a_t, a_prev).astype(x.dtype)
        return x, None

    xs = (
        jnp.asarray(alpha_t),
        jnp.asarray(alpha_prev),
        jnp.asarray(t_desc),
    )
    x0, _ = jax.lax.scan(body, x_T, xs)
    return x0
