"""Weight-converter structural tests: known diffusers SD-2.1 state-dict
keys (name + shape, as published in the HF checkpoints) must land at the
right places in the Flax param trees with correctly transformed shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenflow_tpu.models import weights as W
from tokenflow_tpu.models.unet2d import UNet2DConfig, UNet2DConditionModel
from tokenflow_tpu.models.vae import AutoencoderKL, AutoencoderKLConfig


def _get(tree, path):
    node = tree
    for p in path.split("/"):
        assert p in node, f"missing {p} (of {path}); have {sorted(node)[:8]}"
        node = node[p]
    return node


# (diffusers key, torch shape, flax path, flax shape) — representative
# samples from every block family of stabilityai/stable-diffusion-2-1-base.
UNET_CASES = [
    ("conv_in.weight", (320, 4, 3, 3), "conv_in/kernel", (3, 3, 4, 320)),
    ("time_embedding.linear_1.weight", (1280, 320),
     "time_embedding/linear_1/kernel", (320, 1280)),
    ("down_blocks.0.resnets.0.norm1.weight", (320,),
     "down_0_res_0/norm1/scale", (320,)),
    ("down_blocks.0.resnets.0.conv1.weight", (320, 320, 3, 3),
     "down_0_res_0/conv1/kernel", (3, 3, 320, 320)),
    ("down_blocks.0.resnets.0.time_emb_proj.weight", (320, 1280),
     "down_0_res_0/time_emb_proj/kernel", (1280, 320)),
    ("down_blocks.1.resnets.0.conv_shortcut.weight", (640, 320, 1, 1),
     "down_1_res_0/conv_shortcut/kernel", (1, 1, 320, 640)),
    ("down_blocks.0.downsamplers.0.conv.weight", (320, 320, 3, 3),
     "down_0_downsample/conv/kernel", (3, 3, 320, 320)),
    ("down_blocks.0.attentions.0.norm.weight", (320,),
     "down_0_attn_0/norm/scale", (320,)),
    ("down_blocks.0.attentions.0.proj_in.weight", (320, 320),
     "down_0_attn_0/proj_in/kernel", (320, 320)),
    ("down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
     (320, 320), "down_0_attn_0/block/attn1/to_q/kernel", (320, 320)),
    ("down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight",
     (320, 1024), "down_0_attn_0/block/attn2/to_k/kernel", (1024, 320)),
    ("down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_out.0.weight",
     (320, 320), "down_0_attn_0/block/attn1/to_out/kernel", (320, 320)),
    ("down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
     (2560, 320), "down_0_attn_0/block/ff/proj_in/kernel", (320, 2560)),
    ("down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight",
     (320, 1280), "down_0_attn_0/block/ff/proj_out/kernel", (1280, 320)),
    ("mid_block.resnets.1.conv2.weight", (1280, 1280, 3, 3),
     "mid_res_1/conv2/kernel", (3, 3, 1280, 1280)),
    ("mid_block.attentions.0.transformer_blocks.0.norm1.weight", (1280,),
     "mid_attn/block/norm1/scale", (1280,)),
    ("up_blocks.1.attentions.2.transformer_blocks.0.attn1.to_v.weight",
     (640, 640), "up_1_attn_2/block/attn1/to_v/kernel", (640, 640)),
    ("up_blocks.1.resnets.1.conv2.weight", (640, 640, 3, 3),
     "up_1_res_1/conv2/kernel", (3, 3, 640, 640)),
    ("up_blocks.0.upsamplers.0.conv.weight", (1280, 1280, 3, 3),
     "up_0_upsample/conv/kernel", (3, 3, 1280, 1280)),
    ("conv_norm_out.weight", (320,), "conv_norm_out/scale", (320,)),
    ("conv_out.weight", (4, 320, 3, 3), "conv_out/kernel", (3, 3, 320, 4)),
]

VAE_CASES = [
    ("encoder.conv_in.weight", (128, 3, 3, 3),
     "encoder/conv_in/kernel", (3, 3, 3, 128)),
    ("encoder.down_blocks.0.resnets.0.norm1.weight", (128,),
     "encoder/down_0_res_0/norm1/scale", (128,)),
    ("encoder.down_blocks.0.downsamplers.0.conv.weight", (128, 128, 3, 3),
     "encoder/down_0_downsample/conv/kernel", (3, 3, 128, 128)),
    ("encoder.mid_block.attentions.0.to_q.weight", (512, 512),
     "encoder/mid_attn/to_q/kernel", (512, 512)),
    ("encoder.mid_block.attentions.0.to_out.0.weight", (512, 512),
     "encoder/mid_attn/to_out/kernel", (512, 512)),
    ("encoder.conv_out.weight", (8, 512, 3, 3),
     "encoder/conv_out/kernel", (3, 3, 512, 8)),
    ("quant_conv.weight", (8, 8, 1, 1), "quant_conv/kernel", (1, 1, 8, 8)),
    ("post_quant_conv.weight", (4, 4, 1, 1),
     "post_quant_conv/kernel", (1, 1, 4, 4)),
    ("decoder.up_blocks.3.resnets.2.conv1.weight", (128, 128, 3, 3),
     "decoder/up_3_res_2/conv1/kernel", (3, 3, 128, 128)),
    ("decoder.mid_block.resnets.0.norm2.weight", (512,),
     "decoder/mid_res_0/norm2/scale", (512,)),
]


def test_unet_key_mapping():
    sd = {k: np.zeros(shape, np.float32) for k, shape, _, _ in UNET_CASES}
    params = W.convert_unet_state_dict(sd)
    for key, _, path, flax_shape in UNET_CASES:
        leaf = _get(params, path)
        assert leaf.shape == flax_shape, (key, leaf.shape, flax_shape)


def test_vae_key_mapping():
    sd = {k: np.zeros(shape, np.float32) for k, shape, _, _ in VAE_CASES}
    params = W.convert_vae_state_dict(sd)
    for key, _, path, flax_shape in VAE_CASES:
        leaf = _get(params, path)
        assert leaf.shape == flax_shape, (key, leaf.shape, flax_shape)


def test_vae_legacy_attention_names():
    sd = {
        "encoder.mid_block.attentions.0.query.weight": np.zeros(
            (512, 512, 1, 1), np.float32
        ),
        "encoder.mid_block.attentions.0.proj_attn.weight": np.zeros(
            (512, 512), np.float32
        ),
    }
    params = W.convert_vae_state_dict(sd)
    assert _get(params, "encoder/mid_attn/to_q/kernel").shape == (512, 512)
    assert _get(params, "encoder/mid_attn/to_out/kernel").shape == (512, 512)


@pytest.mark.slow
def test_full_unet_synthetic_roundtrip():
    """Build the COMPLETE diffusers key set for the tiny UNet config by
    inverse-renaming the Flax tree, convert it, and require an exact
    structural match against model.init — proves the converter covers
    every parameter with correct transforms."""
    cfg = UNet2DConfig.tiny()
    model = UNet2DConditionModel(cfg)
    expected = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 16, 16, 4), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
        jax.ShapeDtypeStruct((1, 7, cfg.cross_attention_dim), jnp.float32),
    )["params"]

    import re

    inverse = [
        (r"^down_(\d+)_res_(\d+)\.", r"down_blocks.\1.resnets.\2."),
        (r"^down_(\d+)_attn_(\d+)\.", r"down_blocks.\1.attentions.\2."),
        (r"^down_(\d+)_downsample\.", r"down_blocks.\1.downsamplers.0."),
        (r"^up_(\d+)_res_(\d+)\.", r"up_blocks.\1.resnets.\2."),
        (r"^up_(\d+)_attn_(\d+)\.", r"up_blocks.\1.attentions.\2."),
        (r"^up_(\d+)_upsample\.", r"up_blocks.\1.upsamplers.0."),
        (r"^mid_res_(\d+)\.", r"mid_block.resnets.\1."),
        (r"^mid_attn\.", r"mid_block.attentions.0."),
        (r"\.block\.", r".transformer_blocks.0."),
        (r"\.ff\.proj_in\.", r".ff.net.0.proj."),
        (r"\.ff\.proj_out\.", r".ff.net.2."),
        (r"\.attn(\d)\.to_out\.", r".attn\1.to_out.0."),
    ]

    def flatten(tree, prefix=""):
        for k, v in tree.items():
            p = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
            if isinstance(v, dict):
                yield from flatten(v, p)
            else:
                yield p, v

    sd = {}
    for path, leaf in flatten(expected):
        parts = path.split(".")
        flax_leaf = parts[-1]
        base = ".".join(parts[:-1])
        for pat, rep in inverse:
            base = re.sub(pat, rep, base)
        if flax_leaf == "kernel":
            if len(leaf.shape) == 4:
                arr = np.zeros(
                    (leaf.shape[3], leaf.shape[2], leaf.shape[0], leaf.shape[1]),
                    np.float32,
                )
            else:
                arr = np.zeros((leaf.shape[1], leaf.shape[0]), np.float32)
            sd[base + ".weight"] = arr
        elif flax_leaf == "scale":
            sd[base + ".weight"] = np.zeros(leaf.shape, np.float32)
        else:
            sd[base + ".bias"] = np.zeros(leaf.shape, np.float32)

    params = W.convert_unet_state_dict(sd)
    W.assert_params_match(params, expected)
