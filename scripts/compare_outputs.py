"""Edit-quality / parity harness (SURVEY.md §7 gate: per-frame PSNR parity
vs reference outputs; §5 observability extension: CLIP metrics).

Compares two frame directories (e.g. our img_ode/ vs a reference run's
img_ode/) and prints a JSON summary. Optionally computes CLIP metrics with
the TPU-native CLIP towers (models/clip_vision.py):

  - prompt fidelity (CLIP-score of DIR_A frames vs --prompt)
  - frame-to-frame temporal consistency (mean cosine of consecutive
    DIR_A frame embeddings — the standard TokenFlow-style eval axis)

Usage:
    python scripts/compare_outputs.py DIR_A DIR_B [--out report.json]
        [--clip_ckpt /path/to/clip-vit-large-patch14 --prompt "..."]

Pinning pivots for a real-weight A/B vs the reference
-----------------------------------------------------
The reference draws its per-step keyframe (pivot) indices from the torch
global RNG (/root/reference/run_tokenflow_pnp.py:224:
``randint(batch_size) + arange(0, n_frames, batch_size)``); this repo
draws from the JAX PRNG (editing/pipeline.py::choose_pivots). Identical
seeds therefore give DIFFERENT pivots on the two sides, and a per-frame
PSNR comparison of unpinned runs conflates numerics with pivot choice.
To isolate numerics, pin the SAME pivot table on both sides:

1. Run the reference once; capture its drawn pivots by logging
   ``pivotal_idx`` each step (run_tokenflow_pnp.py:224) into a
   ``(n_steps, n_windows)`` table of ABSOLUTE frame indices.
2. Put that table in this repo's run config as ``pivot_indices:``
   (nested list) — the editors validate it (each pivot inside its own
   window) and bypass the PRNG draw. Every run also writes its own table
   to ``{output_path}/pivots.json`` and metrics.json, so step 1 can
   equally be done in this repo and replayed on a patched reference.
3. Then compare ``img_ode/`` directories with this script; remaining
   differences are numerics (bf16 vs fp16, XLA vs CUDA kernels), not
   sampling.
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


def clip_metrics(frames, prompt: str, ckpt: str) -> dict:
    """CLIP prompt-fidelity + temporal consistency via the Flax towers."""
    import jax.numpy as jnp

    from tokenflow_tpu.io.tokenizer import CLIPTokenizer
    from tokenflow_tpu.models.clip_text import CLIPTextConfig
    from tokenflow_tpu.models.clip_vision import (
        CLIPScorer,
        CLIPVisionConfig,
        preprocess_images,
    )
    from tokenflow_tpu.models.weights import (
        convert_clip_model_state_dict,
        load_component_state_dict,
        load_state_dict,
    )

    sd = (
        load_component_state_dict(ckpt)
        if os.path.isdir(ckpt)
        else load_state_dict(ckpt)
    )
    params = convert_clip_model_state_dict(sd)
    # default to openai/clip-vit-large-patch14 geometry (the standard
    # CLIP-score model); a checkpoint-dir config.json overrides it so any
    # HF CLIPModel (ViT-H, tiny test checkpoints, ...) works too.
    vis_cfg = CLIPVisionConfig.vit_l_14()
    txt_cfg = CLIPTextConfig(
        hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072, hidden_act="quick_gelu",
    )
    eos_id = 49407
    cfg_path = os.path.join(ckpt, "config.json") if os.path.isdir(ckpt) else None
    if cfg_path and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            hf = json.load(f)
        v, t = hf["vision_config"], hf["text_config"]
        proj = hf.get("projection_dim", 768)
        vis_cfg = CLIPVisionConfig(
            hidden_size=v["hidden_size"],
            num_layers=v["num_hidden_layers"],
            num_heads=v["num_attention_heads"],
            intermediate_size=v["intermediate_size"],
            image_size=v["image_size"],
            patch_size=v["patch_size"],
            projection_dim=proj,
            hidden_act=v.get("hidden_act", "quick_gelu"),
        )
        txt_cfg = CLIPTextConfig(
            vocab_size=t.get("vocab_size", 49408),
            hidden_size=t["hidden_size"],
            num_layers=t["num_hidden_layers"],
            num_heads=t["num_attention_heads"],
            intermediate_size=t["intermediate_size"],
            hidden_act=t.get("hidden_act", "quick_gelu"),
        )
        eos_id = t.get("eos_token_id", eos_id)
    scorer = CLIPScorer(
        vision_config=vis_cfg, text_config=txt_cfg, eos_token_id=eos_id
    )
    tok = (
        CLIPTokenizer.from_pretrained(ckpt)
        if os.path.isdir(ckpt)
        and os.path.exists(os.path.join(ckpt, "vocab.json"))
        else None
    )
    pixels = preprocess_images(
        jnp.asarray(np.stack(frames)), image_size=vis_cfg.image_size
    )
    img = scorer.apply(
        {"params": params}, pixels, method=scorer.image_features
    )
    img = np.asarray(img)
    consec = np.sum(img[1:] * img[:-1], axis=-1)
    out = {
        "clip_temporal_consistency": round(float(consec.mean()), 4),
    }
    if tok is not None and prompt:
        # tok(...) adds bos/eos and eos-pads to 77 — text pooling happens
        # at the FIRST eos position, so special tokens are load-bearing.
        ids = jnp.asarray(np.asarray([tok(prompt)], np.int32))
        txt = np.asarray(
            scorer.apply(
                {"params": params}, ids, method=scorer.text_features
            )
        )
        score = np.maximum(img @ txt[0], 0.0) * 100.0
        out["clip_score_mean"] = round(float(score.mean()), 3)
        out["clip_score_min"] = round(float(score.min()), 3)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dir_a")
    ap.add_argument("dir_b")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--clip_ckpt", default=None,
        help="HF CLIPModel checkpoint (dir or file) for CLIP metrics",
    )
    ap.add_argument("--prompt", default=None)
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
    if args.clip_ckpt:
        report.update(clip_metrics(a, args.prompt, args.clip_ckpt))
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
