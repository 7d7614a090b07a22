"""Flax CLIP vision tower + CLIP-score — TPU-native edit-quality metrics.

The reference repo has no metric computation at all (SURVEY.md §5
"observability": artifact inspection only). For production evaluation of
edits this module adds the standard CLIP similarity metrics on TPU:

  - ``CLIPVisionModel``: ViT image encoder with the exact architecture of
    ``transformers.CLIPVisionModel`` (no-bias patch conv, class embedding,
    learned position embeddings, pre-LN encoder reusing
    clip_text.CLIPEncoderLayer without the causal mask, post-layernormed
    CLS pooling);
  - ``CLIPScorer``: composes the vision tower, the existing
    models.clip_text.CLIPTextModel, and the CLIPModel projection heads
    into image<->text (CLIP-score) and image<->image similarities;
  - ``weights.convert_clip_model_state_dict`` maps an HF ``CLIPModel``
    checkpoint (e.g. openai/clip-vit-large-patch14 or the laion ViT-H SD
    uses) onto both towers.

Golden-tested value-for-value against transformers (tests/test_clip_vision.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from tokenflow_tpu.models.clip_text import (
    CLIPEncoderLayer,
    CLIPTextConfig,
    CLIPTextModel,
)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5

    @staticmethod
    def vit_l_14() -> "CLIPVisionConfig":
        """openai/clip-vit-large-patch14 (the standard CLIP-score model)."""
        return CLIPVisionConfig()

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(
            hidden_size=32,
            num_layers=2,
            num_heads=4,
            intermediate_size=64,
            image_size=32,
            patch_size=8,
            projection_dim=16,
        )

    def as_text_layer_config(self) -> CLIPTextConfig:
        """The encoder-layer hyperparameters as a CLIPTextConfig so
        clip_text.CLIPEncoderLayer can be reused verbatim."""
        return CLIPTextConfig(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            intermediate_size=self.intermediate_size,
            hidden_act=self.hidden_act,
            layer_norm_eps=self.layer_norm_eps,
        )


class CLIPVisionModel(nn.Module):
    config: CLIPVisionConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        """pixels: (B, H, W, 3) CLIP-normalized -> pooled (B, hidden)
        (post-layernormed CLS token, transformers CLIPVisionModel
        pooler_output)."""
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln = dict(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
            param_dtype=self.param_dtype,
        )
        b = pixels.shape[0]
        p = cfg.patch_size
        h = nn.Conv(
            cfg.hidden_size, (p, p), strides=(p, p), use_bias=False,
            name="patch_embed", **common,
        )(pixels.astype(self.dtype))
        h = h.reshape(b, -1, cfg.hidden_size)
        cls = self.param(
            "class_embedding",
            nn.initializers.normal(0.02),
            (cfg.hidden_size,),
            self.param_dtype,
        )
        h = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size)), h],
            axis=1,
        )
        n_pos = (cfg.image_size // p) ** 2 + 1
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (n_pos, cfg.hidden_size),
            self.param_dtype,
        )
        h = h + pos[None, : h.shape[1]].astype(self.dtype)
        h = nn.LayerNorm(name="pre_layernorm", **ln)(h).astype(self.dtype)
        layer_cfg = cfg.as_text_layer_config()
        zero_bias = jnp.zeros((1, 1, 1, 1), jnp.float32)  # no causal mask
        for i in range(cfg.num_layers):
            h = CLIPEncoderLayer(
                layer_cfg, name=f"layer_{i}", **common
            )(h, zero_bias)
        pooled = nn.LayerNorm(name="post_layernorm", **ln)(h[:, 0])
        return pooled.astype(self.dtype)


# ImageNet-CLIP preprocessing constants (transformers CLIPImageProcessor)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_images(
    frames: jax.Array, image_size: int = 224
) -> jax.Array:
    """(B, H, W, 3) in [0, 1] -> CLIP-normalized (B, size, size, 3).

    Matches transformers CLIPImageProcessor defaults: bicubic resize of
    the SHORTEST edge to ``image_size`` (long edge scaled to
    int(size * long / short)) followed by a center crop — not a squash
    resize, which would distort CLIP scores on non-square frames. Square
    inputs (the TokenFlow default) reduce to a plain square resize.
    """
    b, h, w, _ = frames.shape
    if h == w:
        nh = nw = image_size
    elif h < w:
        nh, nw = image_size, int(image_size * w / h)
    else:
        nh, nw = int(image_size * h / w), image_size
    x = jax.image.resize(frames, (b, nh, nw, 3), method="bicubic")
    top = (nh - image_size) // 2
    left = (nw - image_size) // 2
    x = x[:, top : top + image_size, left : left + image_size]
    mean = jnp.asarray(CLIP_MEAN, x.dtype)
    std = jnp.asarray(CLIP_STD, x.dtype)
    return (x - mean) / std


class CLIPScorer(nn.Module):
    """Vision + text towers + CLIPModel projection heads.

    image_features / text_features return L2-normalized embedding vectors;
    clip_score is the standard 100 * max(cos, 0) prompt-fidelity metric.
    """

    vision_config: CLIPVisionConfig
    text_config: CLIPTextConfig
    # CLIP vocab end-of-text id; modern HF configs pool the text tower at
    # the FIRST position equal to this id (legacy configs with
    # eos_token_id==2 pooled at argmax(ids), which coincides because eot is
    # the highest id the tokenizer emits)
    eos_token_id: int = 49407
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.vision = CLIPVisionModel(
            self.vision_config, name="vision", **common
        )
        self.text = CLIPTextModel(self.text_config, name="text", **common)
        self.visual_projection = nn.Dense(
            self.vision_config.projection_dim, use_bias=False,
            name="visual_projection", **common,
        )
        self.text_projection = nn.Dense(
            self.vision_config.projection_dim, use_bias=False,
            name="text_projection", **common,
        )

    def image_features(self, pixels: jax.Array) -> jax.Array:
        emb = self.visual_projection(self.vision(pixels))
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def text_features(self, input_ids: jax.Array) -> jax.Array:
        hidden = self.text(input_ids)
        # pool the first end-of-text position (transformers CLIPTextModel)
        eos = jnp.argmax(
            (input_ids == self.eos_token_id).astype(jnp.int32), axis=-1
        )
        pooled = jnp.take_along_axis(
            hidden, eos[:, None, None], axis=1
        )[:, 0]
        emb = self.text_projection(pooled)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def __call__(
        self, pixels: jax.Array, input_ids: jax.Array
    ) -> jax.Array:
        """CLIP-score per (image, first-prompt): (B,) in [0, 100]."""
        img = self.image_features(pixels)
        txt = self.text_features(input_ids)
        cos = jnp.einsum("bd,cd->bc", img, txt)[:, 0]
        return jnp.maximum(cos, 0.0) * 100.0
