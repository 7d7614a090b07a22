"""e2e test of the edit-quality harness (scripts/compare_outputs.py):
PSNR + CLIP metrics against a synthetic HF CLIPModel checkpoint — the
full CLI path the parity/eval workflow uses (PARITY.md §5)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tokenflow_tpu.io.tokenizer import _bytes_to_unicode

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def harness_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env

@pytest.fixture(scope="module")
def clip_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_ckpt")
    # synthetic BPE vocab (same construction as test_tokenizer)
    chars = list(_bytes_to_unicode().values())
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    merges = ["h e", "l l", "he ll", "hell o</w>", "w o", "r l", "wo rl",
              "worl d</w>"]
    for m in merges:
        a, b = m.split()
        vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges) + "\n")

    cfg = transformers.CLIPConfig(
        text_config=dict(
            vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=77,
            bos_token_id=vocab["<|startoftext|>"],
            eos_token_id=vocab["<|endoftext|>"],
        ),
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=32, patch_size=8,
        ),
        projection_dim=16,
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg).eval()
    torch.save(model.state_dict(), d / "pytorch_model.bin")
    (d / "config.json").write_text(json.dumps(model.config.to_dict()))
    return str(d)


@pytest.fixture(scope="module")
def frame_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    for name, noise in (("a", 0), ("b", 12)):
        sub = root / name
        sub.mkdir()
        for i in range(3):
            img = np.roll(base, shift=i, axis=1).astype(np.int16)
            img = np.clip(img + noise, 0, 255).astype(np.uint8)
            Image.fromarray(img).save(sub / f"{i:05d}.png")
    return str(root / "a"), str(root / "b")


@pytest.mark.slow
def test_compare_outputs_clip_metrics(clip_ckpt, frame_dirs, harness_env):
    a, b = frame_dirs
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "compare_outputs.py"),
         a, b, "--clip_ckpt", clip_ckpt, "--prompt", "hello world"],
        capture_output=True, text=True, env=harness_env, cwd=REPO,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["frames_compared"] == 3
    assert report["psnr_mean"] > 20  # same base frames + small offset
    assert -1.0 <= report["clip_temporal_consistency"] <= 1.0
    assert 0.0 <= report["clip_score_mean"] <= 100.0
    assert "clip_score_min" in report
