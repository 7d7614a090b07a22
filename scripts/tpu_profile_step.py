"""Op-level profile of the TokenFlow edit step on TPU.

Captures a jax.profiler device trace of the steady-state 2-step edit scan
(512p / 40 frames / window 8, default kernel dispatch) and prints the
top HLO ops by self time via tensorboard_plugin_profile, to attribute the
~35% MFU gap to specific fusions (PERF.md "known overheads").

Run (one process, tunnel handshake):  python scripts/tpu_profile_step.py
Env: PS_FRAMES (40), PS_LATENT (64), PS_WINDOW (8), PS_STEPS (2),
     PS_CHUNK (0 = no chunking; the 768p/120f config-5 geometry needs 8),
     PS_LOGDIR (/tmp/tf_step_profile).
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tokenflow_tpu import runtime
    from tokenflow_tpu.diffusion import ddim
    from tokenflow_tpu.editing import pipeline

    steps = int(os.environ.get("PS_STEPS", "2"))
    f_total = int(os.environ.get("PS_FRAMES", "40"))
    hw = int(os.environ.get("PS_LATENT", "64"))
    window = int(os.environ.get("PS_WINDOW", "8"))
    chunk = int(os.environ.get("PS_CHUNK", "0")) or None
    logdir = os.environ.get("PS_LOGDIR", "/tmp/tf_step_profile")

    stack = runtime.load_stack(
        "2.1", init="random", dtype=jnp.bfloat16, param_dtype=jnp.bfloat16
    )
    print("# stack loaded", flush=True)

    sched = ddim.make_schedule(steps)
    save_ts = sched.timesteps[::-1].copy()
    schedule = pipeline.make_edit_schedule(
        sched, save_ts, pnp_attn_t=0.5, pnp_f_t=0.8
    )
    rng = np.random.default_rng(0)
    x_init = jnp.asarray(
        rng.standard_normal((f_total, hw, hw, 4)), jnp.bfloat16
    )
    traj = jnp.asarray(
        rng.standard_normal((steps, f_total, hw, hw, 4)), jnp.bfloat16
    )
    embeds3 = jnp.asarray(
        rng.standard_normal((3, 77, stack.unet.config.cross_attention_dim)),
        jnp.bfloat16,
    )

    def loop_fn(params, x0, tr, e3, key):
        return pipeline.tokenflow_sample_loop(
            stack.unet_apply, params, x0, tr, e3, schedule,
            window_size=window, guidance_scale=7.5, pnp=True, rng=key,
            propagate_chunk=chunk,
        )

    loop = jax.jit(loop_fn)
    args = (stack.unet_params, x_init, traj, embeds3, jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    out = loop(*args)
    print(
        f"# first call {time.perf_counter() - t0:.1f}s "
        f"sum={float(jnp.sum(out.astype(jnp.float32))):.3f}",
        flush=True,
    )

    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    out = loop(*args)
    s = float(jnp.sum(out.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"# traced call {dt:.2f}s ({dt / steps:.3f}s/step) sum={s:.3f}",
          flush=True)

    xplanes = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.xplane.pb")))
    if not xplanes:
        print("NO XPLANE CAPTURED (relay may not export device traces)")
        return
    xplane = xplanes[-1]
    print(f"# xplane: {xplane}", flush=True)

    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except Exception as e:  # pragma: no cover
        print(f"tensorboard_plugin_profile unavailable: {e}")
        return

    for tool in ("hlo_stats", "op_profile"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [xplane], tool, {})
        except Exception as e:
            print(f"# tool {tool} failed: {e}", flush=True)
            continue
        path = os.path.join(logdir, f"{tool}.out")
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(path, mode) as f:
            f.write(data)
        print(f"# wrote {path} ({len(data)} bytes)", flush=True)
        if tool == "hlo_stats":
            summarize_hlo_stats(data)
            break


def summarize_hlo_stats(data):
    """hlo_stats is JSON ({"gviz" table}) or CSV depending on version —
    handle both and print top-20 ops by self time."""
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    rows = []
    try:
        obj = json.loads(data)
        table = obj if isinstance(obj, dict) else obj[0]
        cols = [c.get("label", c.get("id", "")) for c in table["cols"]]
        for r in table["rows"]:
            rows.append({c: cell.get("v") for c, cell in zip(cols, r["c"])})
    except Exception:
        import csv
        import io
        for r in csv.DictReader(io.StringIO(data)):
            rows.append(r)
    if not rows:
        print("hlo_stats: no rows parsed; inspect the .out file")
        return

    def pick(row, *names):
        for n in names:
            for k in row:
                if n in k.lower():
                    return row[k]
        return None

    def fnum(v):
        try:
            return float(v)
        except (TypeError, ValueError):
            return 0.0

    rows.sort(key=lambda r: fnum(pick(r, "total self time (us)",
                                      "self time", "self_time")),
              reverse=True)
    total = sum(fnum(pick(r, "total self time (us)", "self time",
                          "self_time")) for r in rows)
    print(f"# total self time: {total / 1e6:.3f} s over {len(rows)} ops")
    print(f"{'self_us':>12} {'%':>6} {'category':<22} op")
    for r in rows[:25]:
        t = fnum(pick(r, "total self time (us)", "self time", "self_time"))
        cat = pick(r, "category") or "?"
        name = (pick(r, "hlo op expression", "expression", "op name",
                     "hlo_op_name", "name") or "?")
        print(f"{t:12.0f} {100 * t / max(total, 1e-9):6.2f} "
              f"{str(cat):<22} {str(name)[:110]}")


if __name__ == "__main__":
    main()
