"""Pure-function DDIM scheduler (eta = 0) for TPU/JAX.

Replaces the reference's use of ``diffusers.DDIMScheduler`` (created at
/root/reference/preprocess.py:71, /root/reference/run_tokenflow_pnp.py:55-56)
with a stateless design: a small frozen ``DDIMSchedule`` holds the static
(numpy, host-side) schedule tables, and every update rule is a pure jittable
function of scalar alpha values. This lets the sampling loops be expressed as
``lax.scan`` over precomputed per-step alpha arrays instead of stateful
scheduler objects.

Math parity targets (Stable Diffusion scheduler config):
  - scaled-linear betas, beta_start=0.00085, beta_end=0.012, 1000 train steps
  - "leading" timestep spacing with steps_offset=1
    (50 steps -> [981, 961, ..., 21, 1])
  - set_alpha_to_one=False -> final_alpha_cumprod = alphas_cumprod[0]
  - clip_sample=False, prediction_type="epsilon"
  - scheduler.step:     reference run_tokenflow_pnp.py:217
  - add_noise:          reference run_tokenflow_pnp.py:257
  - closed-form inversion update: reference preprocess.py:211-225
  - closed-form sampling update:  reference preprocess.py:245-260
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Static (host-side) DDIM schedule tables.

    All members are numpy; convert slices to jnp at trace time. ``timesteps``
    is the descending inference-time grid (as in diffusers'
    ``scheduler.timesteps`` after ``set_timesteps``).
    """

    num_train_timesteps: int
    num_inference_steps: int
    alphas_cumprod: np.ndarray  # (num_train_timesteps,) float32
    final_alpha_cumprod: float
    timesteps: np.ndarray  # (num_inference_steps,) int32, descending

    # ---- derived per-step tables (descending step order, i.e. sampling order)

    def alpha_at(self, t: np.ndarray | int) -> np.ndarray:
        return self.alphas_cumprod[np.asarray(t)]

    def step_alphas(self) -> tuple[np.ndarray, np.ndarray]:
        """(alpha_t, alpha_prev) per sampling step, via t_prev = t - N/steps.

        Mirrors diffusers DDIMScheduler.step's previous-timestep rule: the
        step *below* on the same grid, with final_alpha_cumprod when it
        falls off the end.
        """
        step = self.num_train_timesteps // self.num_inference_steps
        t = self.timesteps
        t_prev = t - step
        alpha_t = self.alphas_cumprod[t]
        alpha_prev = np.where(
            t_prev >= 0,
            self.alphas_cumprod[np.clip(t_prev, 0, None)],
            self.final_alpha_cumprod,
        )
        return alpha_t.astype(np.float32), alpha_prev.astype(np.float32)

    def inversion_alphas(self) -> tuple[np.ndarray, np.ndarray]:
        """(alpha_t, alpha_prev) per *inversion* step (ascending t order).

        Mirrors the closed-form loop at reference preprocess.py:211-215:
        iterating ascending timesteps, alpha_prev at ascending index i is
        alphas_cumprod[timesteps_asc[i-1]] for i > 0 else final_alpha_cumprod.
        """
        t_asc = self.timesteps[::-1]
        alpha_t = self.alphas_cumprod[t_asc]
        alpha_prev = np.concatenate(
            [
                np.asarray([self.final_alpha_cumprod], dtype=np.float32),
                self.alphas_cumprod[t_asc[:-1]],
            ]
        )
        return alpha_t.astype(np.float32), alpha_prev.astype(np.float32)

    def recon_alphas(self) -> tuple[np.ndarray, np.ndarray]:
        """(alpha_t, alpha_prev) per reconstruction-sampling step (descending).

        Mirrors reference preprocess.py:245-250: iterating descending
        timesteps, alpha_prev at index i is alphas_cumprod[timesteps[i+1]]
        for i < n-1 else final_alpha_cumprod. (Identical to step_alphas()
        whenever the grid is uniform with spacing N/steps; kept separate for
        exact structural parity.)
        """
        t = self.timesteps
        alpha_t = self.alphas_cumprod[t]
        alpha_prev = np.concatenate(
            [
                self.alphas_cumprod[t[1:]],
                np.asarray([self.final_alpha_cumprod], dtype=np.float32),
            ]
        )
        return alpha_t.astype(np.float32), alpha_prev.astype(np.float32)


def _scaled_linear_betas(
    beta_start: float, beta_end: float, n: int
) -> np.ndarray:
    return (
        np.linspace(beta_start**0.5, beta_end**0.5, n, dtype=np.float64) ** 2
    )


def make_schedule(
    num_inference_steps: int,
    *,
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    steps_offset: int = 1,
    set_alpha_to_one: bool = False,
) -> DDIMSchedule:
    """Build the static schedule (diffusers "leading" spacing)."""
    betas = _scaled_linear_betas(beta_start, beta_end, num_train_timesteps)
    alphas_cumprod = np.cumprod(1.0 - betas).astype(np.float32)
    final_alpha = 1.0 if set_alpha_to_one else float(alphas_cumprod[0])

    step_ratio = num_train_timesteps // num_inference_steps
    timesteps = (
        (np.arange(0, num_inference_steps) * step_ratio)
        .round()[::-1]
        .astype(np.int64)
        + steps_offset
    )
    return DDIMSchedule(
        num_train_timesteps=num_train_timesteps,
        num_inference_steps=num_inference_steps,
        alphas_cumprod=alphas_cumprod,
        final_alpha_cumprod=final_alpha,
        timesteps=timesteps.astype(np.int32),
    )


def truncate_schedule(sched: DDIMSchedule, start: float) -> DDIMSchedule:
    """SDEdit-style truncation of the timestep grid.

    Reproduces reference run_tokenflow_sdedit.py:57 exactly, including its
    operator precedence: ``timesteps[int(1 - start * len(timesteps)):]``,
    i.e. for start=0.9 and 50 steps this keeps the last 44 steps (the int()
    of -44 = -44 slice index), NOT timesteps[5:].
    """
    ts = sched.timesteps
    ts = ts[int(1 - start * len(ts)) :]
    # num_inference_steps stays at the set_timesteps value: diffusers'
    # step() keeps using num_train // num_inference_steps as the grid
    # spacing even after the timesteps array is truncated, and the SDEdit
    # runner relies on that (run_tokenflow_sdedit.py:55-57,174).
    return dataclasses.replace(sched, timesteps=ts)


# ---------------------------------------------------------------------------
# Pure update rules. alpha_t / alpha_prev are scalars (python, numpy or
# traced jnp); x and eps are arrays of matching shape.
# ---------------------------------------------------------------------------


def pred_x0_from_eps(x_t, eps, alpha_t):
    """x0 estimate: (x_t - sqrt(1-a_t) eps) / sqrt(a_t)."""
    mu = jnp.sqrt(alpha_t)
    sigma = jnp.sqrt(1.0 - alpha_t)
    return (x_t - sigma * eps) / mu


def ddim_step(x_t, eps, alpha_t, alpha_prev):
    """One deterministic DDIM denoising step (eta=0, epsilon prediction).

    Parity: diffusers DDIMScheduler.step with clip_sample=False, called at
    reference run_tokenflow_pnp.py:217 and the closed form at
    preprocess.py:259-260.
    """
    x0 = pred_x0_from_eps(x_t, eps, alpha_t)
    return jnp.sqrt(alpha_prev) * x0 + jnp.sqrt(1.0 - alpha_prev) * eps


def ddim_invert_step(x_t, eps, alpha_t, alpha_prev):
    """One closed-form DDIM inversion step (ascending in t).

    Parity: reference preprocess.py:217-225 — treat x_t as if it were at the
    *previous* (less-noisy) level, recover x0 with the previous level's
    coefficients, then renoise to level t:
        pred_x0 = (x - sigma_prev * eps) / mu_prev
        x'      = mu * pred_x0 + sigma * eps
    """
    mu = jnp.sqrt(alpha_t)
    mu_prev = jnp.sqrt(alpha_prev)
    sigma = jnp.sqrt(1.0 - alpha_t)
    sigma_prev = jnp.sqrt(1.0 - alpha_prev)
    x0 = (x_t - sigma_prev * eps) / mu_prev
    return mu * x0 + sigma * eps


def add_noise(x0, eps, alpha_t):
    """Forward diffusion: sqrt(a_t) x0 + sqrt(1-a_t) eps.

    Parity: diffusers DDIMScheduler.add_noise, used at reference
    run_tokenflow_pnp.py:257 / run_tokenflow_sdedit.py:199.
    """
    return jnp.sqrt(alpha_t) * x0 + jnp.sqrt(1.0 - alpha_t) * eps


def recover_eps(x_t, x0, alpha_t):
    """Implied Gaussian noise from a noisy/clean latent pair.

    Parity: reference run_tokenflow_pnp.py:186-193 (get_ddim_eps):
        eps = (x_T - mu_T x_0) / sigma_T.
    """
    mu = jnp.sqrt(alpha_t)
    sigma = jnp.sqrt(1.0 - alpha_t)
    return (x_t - mu * x0) / sigma


def classifier_free_guidance(eps_uncond, eps_cond, scale):
    """eps_uncond + scale * (eps_cond - eps_uncond).

    Parity: reference run_tokenflow_pnp.py:214.
    """
    return eps_uncond + scale * (eps_cond - eps_uncond)


def get_timesteps(
    sched: DDIMSchedule, strength: float
) -> tuple[np.ndarray, int]:
    """Strength-truncated timestep grid.

    Parity: reference preprocess.py:17-24 — keep the last
    ``int(steps * strength)`` timesteps (strength=1.0 keeps all; used for
    the save grid at preprocess.py:297-301).
    """
    n = sched.num_inference_steps
    init_timestep = min(int(n * strength), n)
    t_start = max(n - init_timestep, 0)
    ts = sched.timesteps[t_start:]
    return ts, n - t_start


def save_grid(
    inversion_steps: int, save_steps: int, num_train_timesteps: int = 1000
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Map inversion timesteps to trajectory-save slots.

    The reference builds a "toy" save-grid scheduler (preprocess.py:297-301)
    and saves the full latent tensor whenever the current inversion timestep
    is on that grid (preprocess.py:227-229). Returns:

      save_timesteps: ascending timesteps at which to store (len = save_steps)
      save_mask:      per-inversion-step (ascending) bool, True when stored
      save_slot:      per-inversion-step int slot into the trajectory buffer
                      (valid only where save_mask)
    """
    toy = make_schedule(
        save_steps, num_train_timesteps=num_train_timesteps
    ).timesteps[::-1]
    inv = make_schedule(
        inversion_steps, num_train_timesteps=num_train_timesteps
    ).timesteps[::-1]
    save_set = {int(t): i for i, t in enumerate(toy)}
    mask = np.asarray([int(t) in save_set for t in inv])
    slot = np.asarray([save_set.get(int(t), 0) for t in inv], dtype=np.int32)
    return toy.astype(np.int32), mask, slot
