"""Golden-parity tests for the Flax CLIP vision tower and CLIP-score
(models/clip_vision.py) vs transformers CLIPModel — the TPU-native
edit-quality metric stack (the reference computes no metrics, SURVEY §5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tokenflow_tpu.models import clip_vision as cv
from tokenflow_tpu.models.clip_text import CLIPTextConfig
from tokenflow_tpu.models.weights import (
    convert_clip_model_state_dict,
    convert_clip_vision_state_dict,
)


@pytest.fixture(scope="module")
def tiny_clip():
    cfg = transformers.CLIPConfig(
        text_config=dict(
            vocab_size=1000, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=77,
        ),
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=32, patch_size=8,
        ),
        projection_dim=16,
    )
    cfg.text_config.eos_token_id = 999
    torch.manual_seed(0)
    ref = transformers.CLIPModel(cfg).eval()
    vis_cfg = cv.CLIPVisionConfig.tiny()
    txt_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, hidden_act="quick_gelu",
    )
    return ref, vis_cfg, txt_cfg


def test_vision_tower_matches_transformers(tiny_clip):
    ref, vis_cfg, _ = tiny_clip
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    model = cv.CLIPVisionModel(vis_cfg)
    params = convert_clip_vision_state_dict(sd)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ours = model.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        theirs = ref.vision_model(
            torch.from_numpy(x).permute(0, 3, 1, 2)
        ).pooler_output.numpy()
    np.testing.assert_allclose(
        np.asarray(ours), theirs, rtol=2e-4, atol=2e-4
    )


def test_clip_score_matches_transformers(tiny_clip):
    ref, vis_cfg, txt_cfg = tiny_clip
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    scorer = cv.CLIPScorer(
        vision_config=vis_cfg, text_config=txt_cfg, eos_token_id=999
    )
    params = convert_clip_model_state_dict(sd)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
    # text pooling happens at the first eos position
    ids = rng.integers(1, 900, (1, 77)).astype(np.int32)
    ids[0, 9] = 999
    img = scorer.apply(
        {"params": params}, jnp.asarray(x), method=scorer.image_features
    )
    txt = scorer.apply(
        {"params": params}, jnp.asarray(ids), method=scorer.text_features
    )
    score = scorer.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(ids)
    )

    with torch.no_grad():
        out = ref(
            input_ids=torch.from_numpy(ids).long(),
            pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2),
        )
        img_t = torch.nn.functional.normalize(out.image_embeds, dim=-1)
        txt_t = torch.nn.functional.normalize(out.text_embeds, dim=-1)
        score_t = (img_t @ txt_t.T).clamp(min=0)[:, 0] * 100.0

    np.testing.assert_allclose(
        np.asarray(img), img_t.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(txt), txt_t.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(score), score_t.numpy(), rtol=2e-4, atol=2e-3
    )


def test_preprocess_images_range():
    rng = np.random.default_rng(2)
    frames = jnp.asarray(
        rng.uniform(0, 1, (2, 64, 48, 3)).astype(np.float32)
    )
    out = cv.preprocess_images(frames, image_size=32)
    assert out.shape == (2, 32, 32, 3)
    # normalized range for [0,1] inputs stays within (x - mean)/std bounds
    assert float(out.min()) > -2.2 and float(out.max()) < 2.7


def test_preprocess_images_center_crop_geometry():
    """Non-square frames use shortest-edge resize + CENTER crop
    (CLIPImageProcessor semantics), not a squash resize. With H already at
    image_size the resize is the identity, so the output must equal the
    normalized center window of the input exactly."""
    rng = np.random.default_rng(3)
    frames = rng.uniform(0, 1, (2, 32, 64, 3)).astype(np.float32)
    out = cv.preprocess_images(jnp.asarray(frames), image_size=32)
    mean = np.asarray(cv.CLIP_MEAN, np.float32)
    std = np.asarray(cv.CLIP_STD, np.float32)
    expected = (frames[:, :, 16:48] - mean) / std
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
