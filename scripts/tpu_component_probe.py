"""Attribute UNet time to components: time isolated pieces at the
propagation-pass shapes (batch 120 streams, 512p latents) to find where
the ~35% MFU goes. One process (tunnel handshake)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def timed(tag, fn, *args, reps=4):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / reps
    log(f"  {tag}: {dt * 1e3:.1f} ms")
    return dt


def main():
    from flax import linen as nn

    from tokenflow_tpu.models.layers import (
        Attention,
        GEGLUFeedForward,
        ResnetBlock2D,
        Transformer2DModel,
    )

    log("devices:", jax.devices())
    B = 120
    rng = np.random.default_rng(0)

    def r(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    key = jax.random.PRNGKey(0)

    # --- top-res resnet block (64x64, 320ch): 2x conv3x3 + GN + temb
    x = r((B, 64, 64, 320))
    temb = r((B, 1280))
    res = ResnetBlock2D(out_channels=320, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    p = res.init(key, x, temb)
    t_res = timed("ResnetBlock2D 64x64x320 (B=120)", jax.jit(lambda p, x, t: res.apply(p, x, t)), p, x, temb)
    # flops: 2 convs 3x3 320->320 = 2 * B*4096*320*320*9*2
    fl = 2 * B * 4096 * 320 * 320 * 9 * 2
    log(f"    -> {fl / t_res / 1e12:.1f} TF/s ({fl / 1e9:.0f} GF)")

    # --- bare conv3x3 320->320 at 64x64
    conv = nn.Conv(320, (3, 3), dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    pc = conv.init(key, x)
    t_conv = timed("conv3x3 320->320 64x64 (B=120)", jax.jit(lambda p, x: conv.apply(p, x)), pc, x)
    fl = B * 4096 * 320 * 320 * 9 * 2
    log(f"    -> {fl / t_conv / 1e12:.1f} TF/s")

    # --- GroupNorm alone (fp32 policy)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.bfloat16)
    pg = gn.init(key, x)
    timed("GroupNorm fp32 64x64x320 (B=120)", jax.jit(lambda p, x: gn.apply(p, x).astype(jnp.bfloat16)), pg, x)

    # --- full Transformer2D at top site, standard attention
    tr = Transformer2DModel(channels=320, heads=5, dim_head=64, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    ctx = r((B, 77, 1024))
    pt = tr.init(key, x, ctx)
    timed("Transformer2D 4096tok d320 (B=120)", jax.jit(lambda p, x, c: tr.apply(p, x, c)[0]), pt, x, ctx)

    # --- self-attention alone at top site
    att = Attention(heads=5, dim_head=64, out_dim=320, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    xt = r((B, 4096, 320))
    pa = att.init(key, xt)
    t_att = timed("self-attn 4096tok d320 (B=120)", jax.jit(lambda p, x: att.apply(p, x)), pa, xt)
    fl = B * (4 * 4096 * 320 * 320 + 2 * 2 * 4096 * 4096 * 320)
    log(f"    -> {fl / t_att / 1e12:.1f} TF/s")

    # --- GEGLU FF at top site
    ff = GEGLUFeedForward(dim=320, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    pf = ff.init(key, xt)
    timed("GEGLU FF d320 4096tok (B=120)", jax.jit(lambda p, x: ff.apply(p, x)), pf, xt)

    # --- mid-res resnet (16x16x1280)
    xm = r((B, 16, 16, 1280))
    tm = r((B, 1280))
    resm = ResnetBlock2D(out_channels=1280, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    pm = resm.init(key, xm, tm)
    t_resm = timed("ResnetBlock2D 16x16x1280 (B=120)", jax.jit(lambda p, x, t: resm.apply(p, x, t)), pm, xm, tm)
    fl = 2 * B * 256 * 1280 * 1280 * 9 * 2
    log(f"    -> {fl / t_resm / 1e12:.1f} TF/s")

    log("COMPONENT PROBE DONE")


if __name__ == "__main__":
    main()
