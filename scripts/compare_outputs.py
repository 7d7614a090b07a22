"""Per-frame PSNR parity harness (SURVEY.md §7 gate: per-frame PSNR
parity vs reference outputs).

Compares two frame directories (e.g. our img_ode/ vs a reference run's
img_ode/) and prints a JSON summary. Usage:

    python scripts/compare_outputs.py DIR_A DIR_B [--out report.json]
"""

import argparse
import glob
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tokenflow_tpu.utils import psnr  # noqa: E402


def load_dir(d):
    paths = sorted(glob.glob(os.path.join(d, "*.png"))) or sorted(
        glob.glob(os.path.join(d, "*.jpg"))
    )
    if not paths:
        raise FileNotFoundError(f"no frames in {d}")
    return [np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0 for p in paths]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dir_a")
    ap.add_argument("dir_b")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    a, b = load_dir(args.dir_a), load_dir(args.dir_b)
    n = min(len(a), len(b))
    per_frame = [psnr(a[i], b[i]) for i in range(n)]
    report = {
        "frames_compared": n,
        "psnr_per_frame": [round(p, 3) for p in per_frame],
        "psnr_mean": round(float(np.mean(per_frame)), 3),
        "psnr_min": round(float(np.min(per_frame)), 3),
    }
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
