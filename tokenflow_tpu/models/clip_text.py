"""Flax CLIP text encoder — TPU-native re-implementation.

Architectural contract of the ``transformers.CLIPTextModel`` checkpoints the
reference loads (SURVEY.md §2.8): token + learned position embeddings,
pre-LN transformer with causal masking, final layer norm; returns the last
hidden state (the only output the reference consumes —
preprocess.py:151-160). SD-2.x uses gelu / 23 layers / width 1024; SD-1.5
uses quick_gelu / 12 layers / width 768.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from tokenflow_tpu.ops.attention import merge_heads, split_heads


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    num_layers: int = 23
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 77
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5

    @staticmethod
    def sd21() -> "CLIPTextConfig":
        return CLIPTextConfig()

    @staticmethod
    def sd15() -> "CLIPTextConfig":
        return CLIPTextConfig(
            hidden_size=768,
            num_layers=12,
            num_heads=12,
            intermediate_size=3072,
            hidden_act="quick_gelu",
        )

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        return CLIPTextConfig(
            vocab_size=1000,
            hidden_size=32,
            num_layers=2,
            num_heads=4,
            intermediate_size=64,
        )


def _act(name: str):
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    raise ValueError(name)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, causal_bias):
        cfg = self.config
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln = dict(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
            param_dtype=self.param_dtype,
        )
        h = nn.LayerNorm(name="layer_norm1", **ln)(x).astype(self.dtype)
        q = nn.Dense(cfg.hidden_size, name="q_proj", **common)(h)
        k = nn.Dense(cfg.hidden_size, name="k_proj", **common)(h)
        v = nn.Dense(cfg.hidden_size, name="v_proj", **common)(h)
        heads = cfg.num_heads
        d = cfg.hidden_size // heads
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk",
            split_heads(q, heads),
            split_heads(k, heads),
            preferred_element_type=jnp.float32,
        ) * (d**-0.5)
        probs = jax.nn.softmax(logits + causal_bias, axis=-1)
        o = jnp.einsum(
            "bhqk,bkhd->bqhd",
            probs.astype(self.dtype),
            split_heads(v, heads),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        o = nn.Dense(cfg.hidden_size, name="out_proj", **common)(
            merge_heads(o)
        )
        x = x + o
        h = nn.LayerNorm(name="layer_norm2", **ln)(x).astype(self.dtype)
        h = nn.Dense(cfg.intermediate_size, name="fc1", **common)(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, name="fc2", **common)(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        """input_ids: (B, S) int32 -> last hidden state (B, S, hidden)."""
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, name="token_embedding",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_position_embeddings, cfg.hidden_size),
            self.param_dtype,
        )
        x = tok + pos[None, :s].astype(self.dtype)
        mask = jnp.tril(jnp.ones((s, s), jnp.bool_))
        causal_bias = jnp.where(mask, 0.0, -jnp.inf)[None, None]
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(
                cfg, name=f"layer_{i}", dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x, causal_bias)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
            param_dtype=self.param_dtype, name="final_layer_norm",
        )(x)
        return x.astype(self.dtype)
