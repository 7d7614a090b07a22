"""ControlNet model + conditioning tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tokenflow_tpu.models.controlnet import ControlNetModel
from tokenflow_tpu.models.unet2d import UNet2DConfig, UNet2DConditionModel


def test_controlnet_shapes_and_zero_init():
    cfg = UNet2DConfig.tiny()
    cn = ControlNetModel(cfg)
    unet = UNet2DConditionModel(cfg)
    b, hw = 2, 16
    sample = jnp.ones((b, hw, hw, 4)) * 0.1
    t = jnp.asarray(3)
    ctx = jnp.ones((b, 7, cfg.cross_attention_dim)) * 0.1
    cond = jnp.ones((b, hw * 2, hw * 2, 3)) * 0.5  # tiny VAE: factor 2

    cn_params = cn.init(jax.random.PRNGKey(0), sample, t, ctx, cond)
    down, mid = cn.apply(cn_params, sample, t, ctx, cond)

    # one residual per skip: conv_in + layers + downsamples
    n_levels = len(cfg.block_out_channels)
    expected = 1 + n_levels * cfg.layers_per_block + (n_levels - 1)
    assert len(down) == expected
    # zero-init projections -> all residuals exactly zero at init
    for r in down:
        assert float(jnp.abs(r).max()) == 0.0
    assert float(jnp.abs(mid).max()) == 0.0

    # UNet consumes the residuals; with zero residuals output is unchanged
    up = unet.init(jax.random.PRNGKey(1), sample, t, ctx)
    eps_plain, _ = unet.apply(up, sample, t, ctx)
    eps_res, _ = unet.apply(
        up, sample, t, ctx,
        down_block_residuals=down, mid_block_residual=mid,
    )
    np.testing.assert_allclose(eps_plain, eps_res, rtol=1e-6, atol=1e-6)


def test_canny_cond():
    from tokenflow_tpu.cli.controlnet_utils import canny_cond

    rng = np.random.default_rng(0)
    frames = rng.random((2, 32, 32, 3)).astype(np.float32)
    c = canny_cond(frames)
    assert c.shape == (2, 32, 32, 3)
    assert c.min() >= 0.0 and c.max() <= 1.0
    # all three channels identical (reference preprocess.py:122-123)
    np.testing.assert_array_equal(c[..., 0], c[..., 1])
    np.testing.assert_array_equal(c[..., 0], c[..., 2])
