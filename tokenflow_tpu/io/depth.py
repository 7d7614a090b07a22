"""Per-frame depth conditioning for the sd_version='depth' path.

The reference computes MiDaS DPT_Large depth maps via torch.hub at runtime
(preprocess.py:76-111, run_tokenflow_pnp.py:70-105). Depth estimation is a
host-side preprocessing step whose output is just an array (SURVEY.md §2.8),
so here it is decoupled:

  1. precomputed maps: ``{data_path}/depth/%05d.npy`` (raw predictions,
     any HxW — preferred; produced by compute_midas_depth or any tool);
  2. otherwise MiDaS via torch.hub if the hub cache is present;
  3. otherwise a clear error.

Maps are bicubic-resized to the latent resolution and per-frame min-max
normalized to [-1, 1], exactly as the reference does
(preprocess.py:100-108).
"""

from __future__ import annotations

import os

import numpy as np


def _normalize_resize(pred: np.ndarray, latent_hw) -> np.ndarray:
    """(H, W) raw depth -> (h, w, 1) in [-1, 1] (bicubic, per-frame
    min-max — reference preprocess.py:100-108)."""
    import cv2

    h, w = latent_hw
    d = cv2.resize(
        pred.astype(np.float32), (w, h), interpolation=cv2.INTER_CUBIC
    )
    dmin, dmax = d.min(), d.max()
    d = 2.0 * (d - dmin) / max(dmax - dmin, 1e-8) - 1.0
    return d[..., None]


def load_or_compute_depth(
    data_path: str, n_frames: int, latent_hw
) -> np.ndarray:
    """-> (F, h, w, 1) float32 in [-1, 1]."""
    depth_dir = os.path.join(data_path, "depth")
    pre = [
        os.path.join(depth_dir, f"{i:05d}.npy") for i in range(n_frames)
    ]
    if os.path.exists(pre[0]):
        return np.stack(
            [_normalize_resize(np.load(p), latent_hw) for p in pre]
        )
    try:
        return compute_midas_depth(data_path, n_frames, latent_hw)
    except Exception as e:  # no hub cache / no network
        raise RuntimeError(
            f"depth maps unavailable: no precomputed {depth_dir}/%05d.npy "
            f"and MiDaS could not run ({e}). Precompute depth with "
            f"tokenflow_tpu.io.depth.compute_midas_depth on a machine with "
            f"the MiDaS torch.hub cache, or drop .npy files into "
            f"{depth_dir}/."
        ) from e


def compute_midas_depth(
    data_path: str, n_frames: int, latent_hw, model_type: str = "DPT_Large"
) -> np.ndarray:
    """MiDaS depth via torch.hub (requires the hub cache or network),
    mirroring the reference's settings (preprocess.py:77-97)."""
    import cv2
    import torch

    from tokenflow_tpu.io.video import frame_paths

    midas = torch.hub.load("intel-isl/MiDaS", model_type)
    midas.eval()
    transforms = torch.hub.load("intel-isl/MiDaS", "transforms")
    transform = (
        transforms.dpt_transform
        if model_type in ("DPT_Large", "DPT_Hybrid")
        else transforms.small_transform
    )
    out = []
    depth_dir = os.path.join(data_path, "depth")
    os.makedirs(depth_dir, exist_ok=True)
    for i, p in enumerate(frame_paths(data_path, n_frames)):
        img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        with torch.no_grad():
            pred = midas(transform(img)).squeeze(0).numpy()
        np.save(os.path.join(depth_dir, f"{i:05d}.npy"), pred)
        out.append(_normalize_resize(pred, latent_hw))
    return np.stack(out)
