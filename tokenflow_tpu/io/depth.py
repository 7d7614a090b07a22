"""Per-frame depth conditioning for the sd_version='depth' path.

The reference computes MiDaS DPT_Large depth maps via torch.hub at runtime
(preprocess.py:76-111, run_tokenflow_pnp.py:70-105). Here depth estimation
is decoupled, in priority order:

  1. precomputed maps: ``{data_path}/depth/%05d.npy`` (raw predictions,
     any HxW — produced by compute_*_depth or any tool);
  2. the TPU-native Flax DPT (models/dpt.py) when a checkpoint is available
     — set ``TOKENFLOW_MIDAS_CKPT`` to an HF ``Intel/dpt-large`` snapshot
     directory or weight file (same weights torch.hub serves as DPT_Large);
  3. MiDaS via torch.hub if the hub cache is present;
  4. otherwise a clear error.

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
    ckpt = os.environ.get("TOKENFLOW_MIDAS_CKPT")
    if ckpt:
        return compute_dpt_depth(data_path, n_frames, latent_hw, ckpt)
    try:
        return compute_midas_depth(data_path, n_frames, latent_hw)
    except Exception as e:  # no hub cache / no network
        raise RuntimeError(
            f"depth maps unavailable: no precomputed {depth_dir}/%05d.npy "
            f"and MiDaS could not run ({e}). Set TOKENFLOW_MIDAS_CKPT to an "
            f"Intel/dpt-large checkpoint for the TPU-native DPT, precompute "
            f"depth with tokenflow_tpu.io.depth.compute_midas_depth on a "
            f"machine with the MiDaS torch.hub cache, or drop .npy files "
            f"into {depth_dir}/."
        ) from e


def load_dpt_params(ckpt: str, config=None):
    """Load an HF Intel/dpt-large checkpoint (snapshot dir or a single
    .safetensors/.bin file) into Flax DPTDepthModel params."""
    from tokenflow_tpu.models.weights import (
        convert_dpt_state_dict,
        load_component_state_dict,
        load_state_dict,
    )

    if os.path.isdir(ckpt):
        sd = load_component_state_dict(ckpt)
    else:
        sd = load_state_dict(ckpt)
    return convert_dpt_state_dict(sd, config)


def compute_dpt_depth(
    data_path: str,
    n_frames: int,
    latent_hw,
    ckpt: str,
    batch: int = 8,
    input_size: int = 384,
    config=None,
) -> np.ndarray:
    """TPU-native MiDaS: run the Flax DPT (models/dpt.py) over the frames.

    Preprocessing matches the HF DPTImageProcessor for Intel/dpt-large
    (resize to 384x384 bilinear, scale 1/255, normalize mean=std=0.5),
    which is the square-input equivalent of the reference's hub transform
    (the reference feeds square frames, preprocess.py:90-97). Raw
    predictions are cached to depth/%05d.npy like the hub path.
    """
    import cv2
    import jax
    import jax.numpy as jnp

    from tokenflow_tpu.io.video import frame_paths
    from tokenflow_tpu.models.dpt import DPTConfig, DPTDepthModel

    config = config or DPTConfig.dpt_large()
    model = DPTDepthModel(config)
    params = load_dpt_params(ckpt, config)

    @jax.jit
    def run(p, x):
        return model.apply({"params": p}, x)

    imgs = []
    for p in frame_paths(data_path, n_frames):
        img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        img = cv2.resize(
            img, (input_size, input_size), interpolation=cv2.INTER_LINEAR
        )
        imgs.append((img.astype(np.float32) / 255.0 - 0.5) / 0.5)
    frames = np.stack(imgs)

    preds = []
    for i in range(0, n_frames, batch):
        chunk = jnp.asarray(frames[i : i + batch])
        preds.append(np.asarray(run(params, chunk)))
    pred = np.concatenate(preds)

    depth_dir = os.path.join(data_path, "depth")
    os.makedirs(depth_dir, exist_ok=True)
    out = []
    for i in range(n_frames):
        np.save(os.path.join(depth_dir, f"{i:05d}.npy"), pred[i])
        out.append(_normalize_resize(pred[i], latent_hw))
    return np.stack(out)


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
