"""Exact-vs-approximate propagation A/B through the REAL CLIs, with the
SAME pinned pivots on both sides, scored by the metrics harness
(scripts/compare_outputs.py) — the recorded execution VERDICT r04 tasks
#4/#7 ask for.

Pipeline (tiny weightless stack, CPU by default so it runs anywhere):
  1. synthesize a gently-moving clip, preprocess (inversion trajectory);
  2. PnP edit, EXACT propagation — records its drawn pivots;
  3. PnP edit, prop_approx: true — pivots PINNED to run 2's table, so the
     remaining difference is exactly the approximation (source-free
     propagation pass), not sampling;
  4. compare_outputs.py on the two img_ode/ trees -> JSON report.

Run: python scripts/prop_approx_ab.py [WORKDIR=/tmp/approx_ab]
Env: AB_DEVICE=cpu|default (cpu re-execs with the axon tunnel bypassed),
     AB_FRAMES/AB_HW/AB_STEPS/AB_TIMESTEPS to scale the geometry.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if os.environ.get("AB_DEVICE", "cpu") == "cpu" and not os.environ.get(
    "_AB_REEXEC"
):
    env = dict(
        os.environ,
        _AB_REEXEC="1",
        JAX_PLATFORMS="cpu",
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    sys.exit(
        subprocess.run([sys.executable, os.path.abspath(__file__)] + sys.argv[1:], env=env).returncode
    )

import numpy as np
import yaml
from PIL import Image

from tokenflow_tpu.cli import preprocess as preprocess_cli
from tokenflow_tpu.cli import run_pnp

F = int(os.environ.get("AB_FRAMES", "4"))
HW = int(os.environ.get("AB_HW", "64"))
STEPS = int(os.environ.get("AB_STEPS", "8"))
SAVE_STEPS = int(os.environ.get("AB_SAVE_STEPS", "4"))
N_TIMESTEPS = int(os.environ.get("AB_TIMESTEPS", "4"))


def make_clip(data_dir):
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    base = rng.integers(40, 210, (HW, HW, 3), dtype=np.uint8)
    for i in range(F):
        Image.fromarray(np.roll(base, shift=2 * i, axis=1)).save(
            os.path.join(data_dir, f"{i:05d}.png")
        )


def edit_config(prop_approx, pivot_indices=None):
    cfg = {
        "seed": 1,
        "output_path": "results_approx" if prop_approx else "results_exact",
        "data_path": "data/clip",
        "latents_path": "latents",
        "n_inversion_steps": STEPS,
        "n_frames": F,
        "sd_version": "tiny",
        "guidance_scale": 7.5,
        "n_timesteps": N_TIMESTEPS,
        "prompt": "a stained glass mosaic",
        "negative_prompt": "",
        "batch_size": 2,
        "pnp_attn_t": 0.5,
        "pnp_f_t": 0.8,
        "image_size": HW,
        "data_parallel": "off",
        "prop_approx": bool(prop_approx),
    }
    if pivot_indices is not None:
        cfg["pivot_indices"] = pivot_indices
    path = f"config_{'approx' if prop_approx else 'exact'}.yaml"
    with open(path, "w") as f:
        yaml.dump(cfg, f)
    return path


def run_edit(config_path):
    run_pnp.main(["--config_path", config_path])
    cfg = yaml.safe_load(open(config_path))
    out_root = (
        cfg["output_path"]
        + f"_pnp_SD_{cfg['sd_version']}/clip/{cfg['prompt'][:240]}/"
        + f"attn_{cfg['pnp_attn_t']}_f_{cfg['pnp_f_t']}/"
        + f"batch_size_{cfg['batch_size']}/{cfg['n_timesteps']}"
    )
    with open(os.path.join(out_root, "pivots.json")) as f:
        pivots = json.load(f)["pivot_indices"]
    return os.path.join(out_root, "img_ode"), pivots


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/approx_ab"
    os.makedirs(work, exist_ok=True)
    os.chdir(work)
    make_clip("data/clip")

    opt = preprocess_cli.build_parser().parse_args(
        [
            "--data_path", "data/clip",
            "--H", str(HW), "--W", str(HW),
            "--sd_version", "tiny",
            "--steps", str(STEPS),
            "--save_steps", str(SAVE_STEPS),
            "--n_frames", str(F),
            "--batch_size", str(F),
            "--inversion_prompt", "a test clip",
        ]
    )
    preprocess_cli.run(opt)

    dir_exact, pivots = run_edit(edit_config(False))
    dir_approx, pivots_b = run_edit(edit_config(True, pivot_indices=pivots))
    assert pivots_b == pivots, "pivot pinning failed"

    report = os.path.join(work, "approx_ab_report.json")
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "compare_outputs.py"),
            dir_exact,
            dir_approx,
            "--out", report,
        ],
        check=True,
    )
    with open(report) as f:
        print("A/B (exact vs approx, pinned pivots):", f.read())


if __name__ == "__main__":
    main()
