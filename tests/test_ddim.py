"""DDIM scheduler parity and property tests.

Golden values are derived from the diffusers DDIMScheduler semantics the
reference relies on (SD config: scaled-linear betas 0.00085..0.012, leading
spacing, steps_offset=1, set_alpha_to_one=False) — see SURVEY.md §2.1.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tokenflow_tpu.diffusion import ddim


def test_timesteps_50():
    s = ddim.make_schedule(50)
    assert s.timesteps[0] == 981
    assert s.timesteps[-1] == 1
    assert list(s.timesteps[:3]) == [981, 961, 941]
    assert len(s.timesteps) == 50


def test_timesteps_500_superset_of_50():
    s500 = ddim.make_schedule(500)
    s50 = ddim.make_schedule(50)
    assert s500.timesteps[0] == 999 and s500.timesteps[-1] == 1
    # the 50-step save grid is hit exactly by the 500-step inversion grid
    assert set(s50.timesteps.tolist()) <= set(s500.timesteps.tolist())


def test_alphas_cumprod_endpoints():
    s = ddim.make_schedule(50)
    # beta_0 = 0.00085 -> alpha_cumprod[0] = 1 - 0.00085
    np.testing.assert_allclose(s.alphas_cumprod[0], 1 - 0.00085, rtol=1e-6)
    assert s.final_alpha_cumprod == pytest.approx(1 - 0.00085, rel=1e-6)
    # monotonically decreasing, in (0, 1)
    assert np.all(np.diff(s.alphas_cumprod) < 0)
    assert s.alphas_cumprod[-1] > 0


def test_step_zero_eps_scaling():
    s = ddim.make_schedule(50)
    a_t, a_prev = s.step_alphas()
    x = jnp.ones((2, 4))
    out = ddim.ddim_step(x, jnp.zeros_like(x), a_t[0], a_prev[0])
    expected = np.sqrt(a_prev[0] / a_t[0])
    np.testing.assert_allclose(out, expected * np.ones((2, 4)), rtol=1e-5)


def test_add_noise_recover_eps_roundtrip():
    s = ddim.make_schedule(50)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((3, 4, 8, 8)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((3, 4, 8, 8)), jnp.float32)
    a_T = s.alphas_cumprod[s.timesteps[0]]
    x_T = ddim.add_noise(x0, eps, a_T)
    eps_rec = ddim.recover_eps(x_T, x0, a_T)
    np.testing.assert_allclose(eps_rec, eps, rtol=1e-4, atol=1e-5)


def test_invert_then_sample_constant_eps_is_identity():
    """With a constant eps model the closed-form inversion and the sampling
    update are exact inverses step-by-step (the property the reference's
    inverted.mp4 sanity check approximates — SURVEY.md §4)."""
    s = ddim.make_schedule(10)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32) * 0.1

    x_orig = x
    a_t_inv, a_prev_inv = s.inversion_alphas()
    for i in range(len(s.timesteps)):
        x = ddim.ddim_invert_step(x, eps, a_t_inv[i], a_prev_inv[i])

    a_t, a_prev = s.recon_alphas()
    for i in range(len(s.timesteps)):
        x = ddim.ddim_step(x, eps, a_t[i], a_prev[i])

    np.testing.assert_allclose(x, x_orig, rtol=1e-3, atol=1e-4)


def test_recon_alphas_match_step_alphas_on_uniform_grid():
    s = ddim.make_schedule(50)
    np.testing.assert_allclose(s.recon_alphas()[0], s.step_alphas()[0])
    np.testing.assert_allclose(s.recon_alphas()[1], s.step_alphas()[1])


def test_truncate_schedule_sdedit_precedence():
    # start=0.9, 50 steps: int(1 - 0.9*50) = int(-44) = -44 -> last 44 steps
    s = ddim.truncate_schedule(ddim.make_schedule(50), 0.9)
    assert len(s.timesteps) == 44
    assert s.timesteps[0] == 861  # timesteps[6] of the full grid
    # step spacing must still follow the 50-step grid (1000/50 = 20)
    assert s.num_inference_steps == 50
    a_t, a_prev = s.step_alphas()
    assert len(a_t) == 44
    np.testing.assert_allclose(
        a_prev[0], s.alphas_cumprod[861 - 20], rtol=1e-6
    )


def test_save_grid():
    ts, mask, slot = ddim.save_grid(500, 50)
    assert len(ts) == 50
    assert mask.sum() == 50  # every save timestep hit exactly once
    inv_asc = ddim.make_schedule(500).timesteps[::-1]
    saved_ts = inv_asc[mask]
    np.testing.assert_array_equal(np.sort(saved_ts), np.sort(ts))
    # slots cover 0..49 exactly
    assert sorted(slot[mask].tolist()) == list(range(50))


def test_cfg():
    u = jnp.asarray([1.0, 2.0])
    c = jnp.asarray([3.0, 0.0])
    out = ddim.classifier_free_guidance(u, c, 7.5)
    np.testing.assert_allclose(out, [1 + 7.5 * 2, 2 - 7.5 * 2])
