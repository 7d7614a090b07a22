"""One-process TPU probe: timing semantics + per-phase perf breakdown.

Writes incremental results to stdout (flush per line) so a background run
can be monitored. Batched into one process because the axon tunnel
handshake latency is high and variable.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def force(out):
    """block_until_ready is a no-op under the axon relay; force completion
    by pulling a device-computed scalar to the host."""
    s = jax.tree.leaves(out)[0]
    _ = float(jnp.sum(s.astype(jnp.float32)))
    return out


def timed(tag, fn, *args):
    t0 = time.perf_counter()
    out = force(fn(*args))
    dt = time.perf_counter() - t0
    log(f"  {tag}: {dt:.3f}s")
    return out, dt


def main():
    log("devices:", jax.devices())

    # ---- 1. timing semantics: block vs host-transfer on a known matmul
    x = jnp.ones((8192, 8192), jnp.bfloat16)
    f = jax.jit(lambda a: (a @ a) @ a)
    _, t_compile = timed("matmul first (compile+run)", f, x)
    _, t1 = timed("matmul steady x1", f, x)

    f5 = jax.jit(lambda a: ((((a @ a) @ a) @ a) @ a) @ a)
    timed("matmul5 compile+run", f5, x)
    _, t5 = timed("matmul5 steady", f5, x)
    # per-matmul estimate net of sync overhead
    log(f"  => sync-overhead-corrected per-matmul ~{(t5 - t1) / 3:.4f}s (ideal ~0.006s)")

    # ---- 2. one full-size UNet propagate-pass step breakdown
    from tokenflow_tpu import runtime
    from tokenflow_tpu.diffusion import ddim
    from tokenflow_tpu.editing import pipeline
    from tokenflow_tpu.ops import editctx
    from tokenflow_tpu.ops.propagation import propagation_indices

    stack = runtime.load_stack(
        "2.1", init="random", dtype=jnp.bfloat16, param_dtype=jnp.bfloat16
    )
    F, hw, ws = 40, 64, 8
    K = F // ws
    rng = np.random.default_rng(0)
    ctx_dim = stack.unet.config.cross_attention_dim

    def r(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    x_piv = r((3 * K, hw, hw, 4))
    emb_piv = r((3 * K, 77, ctx_dim))
    x_all = r((3 * F, hw, hw, 4))
    emb_all = r((3 * F, 77, ctx_dim))
    t = jnp.asarray(501, jnp.int32)

    @jax.jit
    def pivotal(params, s, e):
        edit = editctx.UNetEdit(
            mode=editctx.EditMode.PIVOTAL, n_frames=K, pnp=True,
            qk_gate=jnp.asarray(True), conv_gate=jnp.asarray(True),
        )
        return stack.unet_apply(params, s, t, e, edit)

    (eps_p, cache), _ = timed(
        "pivotal pass compile+run", pivotal, stack.unet_params, x_piv, emb_piv
    )
    _, t_piv = timed("pivotal pass steady", pivotal, stack.unet_params, x_piv, emb_piv)

    pa, pb, w1 = (jnp.asarray(a) for a in propagation_indices(F, ws))

    @jax.jit
    def propagate(params, s, e, cache):
        edit = editctx.UNetEdit(
            mode=editctx.EditMode.PROPAGATE, n_frames=F, pnp=True,
            qk_gate=jnp.asarray(False), conv_gate=jnp.asarray(True),
            cache=cache, prop_pa=pa, prop_pb=pb, prop_w1=w1,
        )
        return stack.unet_apply(params, s, t, e, edit)

    timed("propagate pass compile+run", propagate, stack.unet_params, x_all, emb_all, cache)
    _, t_prop = timed("propagate pass steady", propagate, stack.unet_params, x_all, emb_all, cache)

    @jax.jit
    def plain_unet(params, s, e):
        return stack.unet_apply(params, s, t, e, None)

    timed("plain UNet 40-stream compile+run", plain_unet, stack.unet_params, x_all[:40], emb_all[:40])
    _, t_plain40 = timed("plain UNet 40-stream steady", plain_unet, stack.unet_params, x_all[:40], emb_all[:40])
    _, t_plain120 = None, None
    try:
        timed("plain UNet 120-stream compile+run", plain_unet, stack.unet_params, x_all, emb_all)
        _, t_plain120 = timed("plain UNet 120-stream steady", plain_unet, stack.unet_params, x_all, emb_all)
    except Exception as e:
        log("  plain 120-stream failed:", e)

    log("summary:")
    log(f"  pivotal={t_piv:.3f}s propagate={t_prop:.3f}s")
    log(f"  per-step = {t_piv + t_prop:.3f}s -> 50 steps = {50 * (t_piv + t_prop):.1f}s")
    log(f"  plain UNet 40 streams = {t_plain40:.3f}s "
        f"(120: {t_plain120 if t_plain120 is None else round(t_plain120,3)})")

    # ---- 3. pallas flash kernel vs jnp flash on extended-attn shapes
    from tokenflow_tpu.kernels.flash_attention import flash_attention_pallas
    from tokenflow_tpu.ops.attention import flash_attention

    for (b, s_q, s_kv, h, d) in [(2, 20480, 20480, 5, 64), (2, 5120, 20480, 10, 64)]:
        q = r((b, s_q, h, d))
        k = r((b, s_kv, h, d))
        v = r((b, s_kv, h, d))
        jn = jax.jit(lambda q, k, v: flash_attention(q, k, v, kv_block=1024))
        pk = jax.jit(lambda q, k, v: flash_attention_pallas(q, k, v))
        try:
            timed(f"jnp flash {s_q}x{s_kv} compile+run", jn, q, k, v)
            _, tj = timed(f"jnp flash {s_q}x{s_kv} steady", jn, q, k, v)
        except Exception as e:
            log("  jnp flash failed:", repr(e)[:200])
            tj = None
        try:
            timed(f"pallas flash {s_q}x{s_kv} compile+run", pk, q, k, v)
            _, tp = timed(f"pallas flash {s_q}x{s_kv} steady", pk, q, k, v)
            out_p = pk(q, k, v)
            out_j = jn(q, k, v)
            err = float(
                jnp.max(jnp.abs(out_p.astype(jnp.float32) - out_j.astype(jnp.float32)))
            )
            log(f"  pallas-vs-jnp max abs err: {err:.4f}")
        except Exception as e:
            log("  pallas flash failed:", repr(e)[:300])

    # ---- 4. token-match: jnp vs pallas at the top UNet site shape
    from tokenflow_tpu.kernels.token_match import (
        fits_vmem,
        token_match_gather_pallas,
    )
    from tokenflow_tpu.ops.propagation import token_propagation

    for (s_site, d_site) in [(4096, 320), (1024, 640), (256, 1280)]:
        xh = r((F, s_site, d_site))
        ph = r((K, s_site, d_site))
        kf = r((3, K, s_site, d_site))
        jn_tm = jax.jit(
            lambda xh, ph, kf: token_propagation(xh, ph, kf, pa, pb, w1)
        )

        def norm(p):
            p32 = p.astype(jnp.float32)
            return (
                p32 / (jnp.linalg.norm(p32, axis=-1, keepdims=True) + 1e-12)
            ).astype(p.dtype)

        pk_tm = jax.jit(
            lambda xh, ph, kf: token_match_gather_pallas(
                xh, norm(ph), kf, pa, pb, w1
            )
        )
        tag = f"S={s_site} D={d_site}"
        try:
            timed(f"jnp token-match {tag} compile+run", jn_tm, xh, ph, kf)
            _, tj = timed(f"jnp token-match {tag} steady", jn_tm, xh, ph, kf)
        except Exception as e:
            log("  jnp token-match failed:", repr(e)[:200])
        log(f"  fits_vmem({s_site},{d_site}) = {fits_vmem(s_site, d_site)}")
        try:
            timed(f"pallas token-match {tag} compile+run", pk_tm, xh, ph, kf)
            _, tp = timed(f"pallas token-match {tag} steady", pk_tm, xh, ph, kf)
            err = float(
                jnp.mean(
                    jnp.abs(
                        pk_tm(xh, ph, kf).astype(jnp.float32)
                        - jn_tm(xh, ph, kf).astype(jnp.float32)
                    )
                )
            )
            log(f"  pallas-vs-jnp mean abs err: {err:.5f}")
        except Exception as e:
            log("  pallas token-match failed:", repr(e)[:300])

    # ---- 5. (optional) BASELINE config-5 scale checks: 768p and 120 frames
    if os.environ.get("PROBE_LARGE", "0") == "1":
        # 768p latent = 96x96 -> top-site seq 9216; token-match at the
        # 768p top site and flash over the 5-keyframe extended KV
        F5, ws5 = 24, 8
        K5 = F5 // ws5
        pa5, pb5, w15 = (
            jnp.asarray(a) for a in propagation_indices(F5, ws5)
        )
        s5, d5 = 9216, 320
        xh = r((F5, s5, d5))
        ph = r((K5, s5, d5))
        kf5 = r((3, K5, s5, d5))

        def norm(p):
            p32 = p.astype(jnp.float32)
            return (
                p32 / (jnp.linalg.norm(p32, axis=-1, keepdims=True) + 1e-12)
            ).astype(p.dtype)

        os.environ["TOKENFLOW_PALLAS"] = "0"  # force the jnp reference path
        jn_tm = jax.jit(
            lambda xh, ph, kf: token_propagation(xh, ph, kf, pa5, pb5, w15)
        )
        pk_tm = jax.jit(
            lambda xh, ph, kf: token_match_gather_pallas(
                xh, norm(ph), kf, pa5, pb5, w15
            )
        )
        try:
            timed("jnp token-match 768p compile+run", jn_tm, xh, ph, kf5)
            timed("jnp token-match 768p steady", jn_tm, xh, ph, kf5)
        except Exception as e:
            log("  jnp token-match 768p failed:", repr(e)[:200])
        del os.environ["TOKENFLOW_PALLAS"]
        try:
            timed("pallas token-match 768p compile+run", pk_tm, xh, ph, kf5)
            timed("pallas token-match 768p steady", pk_tm, xh, ph, kf5)
            err = float(
                jnp.mean(
                    jnp.abs(
                        pk_tm(xh, ph, kf5).astype(jnp.float32)
                        - jn_tm(xh, ph, kf5).astype(jnp.float32)
                    )
                )
            )
            log(f"  768p pallas-vs-jnp mean abs err: {err:.5f}")
        except Exception as e:
            log("  pallas token-match 768p failed:", repr(e)[:300])

        # flash attention at 768p extended shapes: KV = 3 kf * 9216
        q = r((2, 3 * s5, 5, 64))
        kv = r((2, 3 * s5, 5, 64))
        pk = jax.jit(lambda q, k, v: flash_attention_pallas(q, k, v))
        try:
            timed("pallas flash 768p-ext compile+run", pk, q, kv, kv)
            timed("pallas flash 768p-ext steady", pk, q, kv, kv)
        except Exception as e:
            log("  pallas flash 768p failed:", repr(e)[:200])

        # 120-frame propagation-pass UNet (3x120 streams at 512p)
        x120 = r((3 * 120, hw, hw, 4))
        e120 = r((3 * 120, 77, ctx_dim))
        pa120, pb120, w120 = (
            jnp.asarray(a) for a in propagation_indices(120, 8)
        )
        log("  (120-frame propagate needs a 15-pivot cache; running pivotal first)")
        x_piv15 = r((3 * 15, hw, hw, 4))
        e_piv15 = r((3 * 15, 77, ctx_dim))

        @jax.jit
        def pivotal15(params, s, e):
            edit = editctx.UNetEdit(
                mode=editctx.EditMode.PIVOTAL, n_frames=15, pnp=True,
                qk_gate=jnp.asarray(True), conv_gate=jnp.asarray(True),
            )
            return stack.unet_apply(params, s, t, e, edit)

        try:
            (_, cache15), _ = timed(
                "pivotal 15-kf compile+run", pivotal15, stack.unet_params,
                x_piv15, e_piv15,
            )

            @jax.jit
            def propagate120(params, s, e, cache):
                edit = editctx.UNetEdit(
                    mode=editctx.EditMode.PROPAGATE, n_frames=120, pnp=True,
                    qk_gate=jnp.asarray(False), conv_gate=jnp.asarray(True),
                    cache=cache, prop_pa=pa120, prop_pb=pb120, prop_w1=w120,
                )
                return stack.unet_apply(params, s, t, e, edit)

            timed("propagate 120f compile+run", propagate120,
                  stack.unet_params, x120, e120, cache15)
            timed("propagate 120f steady", propagate120,
                  stack.unet_params, x120, e120, cache15)
        except Exception as e:
            log("  120-frame propagate failed:", repr(e)[:300])

    log("PROBE DONE")


if __name__ == "__main__":
    main()
