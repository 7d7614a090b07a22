"""HF checkpoint -> Flax parameter conversion (no diffusers dependency).

The reference obtains all model weights from HuggingFace checkpoints
(SURVEY.md §2.8: SD-1.5/2.0/2.1/2-depth UNet+VAE+CLIP, ControlNet). This
module maps those on-disk state dicts (diffusers / transformers naming) onto
the parameter pytrees of the Flax models in :mod:`tokenflow_tpu.models`.

Loading path: safetensors (preferred, zero-copy numpy) or torch .bin
(via torch CPU, only if torch is importable). Conversion rules are
name-rewrites plus shape-driven transforms:
  - 4D conv weights (O,I,kh,kw)  -> HWIO (kh,kw,I,O)
  - 2D linear weights (out,in)   -> (in,out)
  - 1D norm weights              -> 'scale'
  - embeddings                   -> kept (vocab, hidden)
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable

import numpy as np


# ---------------------------------------------------------------------------
# state-dict loading
# ---------------------------------------------------------------------------


def load_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a single .safetensors or torch .bin file as numpy arrays."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        try:
            return load_file(path)
        except Exception:
            # bf16 tensors are not numpy-native; go through torch.
            from safetensors.torch import load_file as load_torch

            return {
                k: v.float().numpy() for k, v in load_torch(path).items()
            }
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}


def load_component_state_dict(component_dir: str) -> dict[str, np.ndarray]:
    """Load (possibly sharded) weights from a diffusers component dir."""
    files = sorted(os.listdir(component_dir))
    weight_files = [
        f
        for f in files
        if f.endswith(".safetensors") or f.endswith(".bin")
    ]
    # prefer safetensors when both exist
    st = [f for f in weight_files if f.endswith(".safetensors")]
    if st:
        weight_files = st
    sd: dict[str, np.ndarray] = {}
    for f in weight_files:
        if "index" in f:
            continue
        sd.update(load_state_dict(os.path.join(component_dir, f)))
    if not sd:
        raise FileNotFoundError(f"no weight files in {component_dir}")
    return sd


# ---------------------------------------------------------------------------
# generic transforms
# ---------------------------------------------------------------------------


def _leaf(name: str, w: np.ndarray) -> tuple[str, np.ndarray]:
    """Map a torch leaf (weight/bias) to a flax leaf (kernel/scale/bias)."""
    if name == "bias":
        return "bias", w
    if name == "weight":
        if w.ndim == 4:  # conv OIHW -> HWIO
            return "kernel", w.transpose(2, 3, 1, 0)
        if w.ndim == 2:  # linear (out,in) -> (in,out)
            return "kernel", w.T
        if w.ndim == 1:  # norm
            return "scale", w
    raise ValueError(f"unhandled leaf {name} with shape {w.shape}")


def _insert(tree: dict, path: list[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _apply_rules(
    key: str, rules: list[tuple[str, str]]
) -> str:
    for pat, rep in rules:
        key = re.sub(pat, rep, key)
    return key


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

_UNET_RULES = [
    (r"down_blocks\.(\d+)\.resnets\.(\d+)\.", r"down_\1_res_\2."),
    (r"down_blocks\.(\d+)\.attentions\.(\d+)\.", r"down_\1_attn_\2."),
    (r"down_blocks\.(\d+)\.downsamplers\.0\.", r"down_\1_downsample."),
    (r"up_blocks\.(\d+)\.resnets\.(\d+)\.", r"up_\1_res_\2."),
    (r"up_blocks\.(\d+)\.attentions\.(\d+)\.", r"up_\1_attn_\2."),
    (r"up_blocks\.(\d+)\.upsamplers\.0\.", r"up_\1_upsample."),
    (r"mid_block\.resnets\.(\d+)\.", r"mid_res_\1."),
    (r"mid_block\.attentions\.0\.", r"mid_attn."),
    (r"transformer_blocks\.0\.", r"block."),
    (r"to_out\.0\.", r"to_out."),
    (r"ff\.net\.0\.proj\.", r"ff.proj_in."),
    (r"ff\.net\.2\.", r"ff.proj_out."),
]


def convert_unet_state_dict(
    sd: dict[str, np.ndarray]
) -> dict[str, Any]:
    params: dict[str, Any] = {}
    for key, w in sd.items():
        if key.endswith("position_ids"):
            continue
        new = _apply_rules(key, _UNET_RULES)
        parts = new.split(".")
        leaf_name, leaf = _leaf(parts[-1], w)
        _insert(params, parts[:-1] + [leaf_name], leaf)
    return params


_CONTROLNET_RULES = _UNET_RULES + [
    (r"controlnet_cond_embedding\.conv_in\.", r"cond_embedding.conv_in."),
    (r"controlnet_cond_embedding\.blocks\.(\d+)\.", r"cond_embedding.block_\1."),
    (r"controlnet_cond_embedding\.conv_out\.", r"cond_embedding.conv_out."),
    (r"controlnet_down_blocks\.(\d+)\.", r"controlnet_down_\1."),
    (r"controlnet_mid_block\.", r"controlnet_mid."),
]


def convert_controlnet_state_dict(
    sd: dict[str, np.ndarray]
) -> dict[str, Any]:
    params: dict[str, Any] = {}
    for key, w in sd.items():
        if key.endswith("position_ids"):
            continue
        new = _apply_rules(key, _CONTROLNET_RULES)
        parts = new.split(".")
        leaf_name, leaf = _leaf(parts[-1], w)
        _insert(params, parts[:-1] + [leaf_name], leaf)
    return params


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

_VAE_RULES = [
    (r"down_blocks\.(\d+)\.resnets\.(\d+)\.", r"down_\1_res_\2."),
    (r"down_blocks\.(\d+)\.downsamplers\.0\.", r"down_\1_downsample."),
    (r"up_blocks\.(\d+)\.resnets\.(\d+)\.", r"up_\1_res_\2."),
    (r"up_blocks\.(\d+)\.upsamplers\.0\.", r"up_\1_upsample."),
    (r"mid_block\.resnets\.(\d+)\.", r"mid_res_\1."),
    (r"mid_block\.attentions\.0\.", r"mid_attn."),
    # legacy VAE attention naming (pre-diffusers-0.19 checkpoints)
    (r"mid_attn\.query\.", r"mid_attn.to_q."),
    (r"mid_attn\.key\.", r"mid_attn.to_k."),
    (r"mid_attn\.value\.", r"mid_attn.to_v."),
    (r"mid_attn\.proj_attn\.", r"mid_attn.to_out."),
    (r"mid_attn\.to_out\.0\.", r"mid_attn.to_out."),
]


def convert_vae_state_dict(sd: dict[str, np.ndarray]) -> dict[str, Any]:
    params: dict[str, Any] = {}
    for key, w in sd.items():
        new = _apply_rules(key, _VAE_RULES)
        parts = new.split(".")
        if "mid_attn" in parts and w.ndim == 4:
            # legacy 1x1-conv attention projections -> linear
            w = w[:, :, 0, 0]
        leaf_name, leaf = _leaf(parts[-1], w)
        _insert(params, parts[:-1] + [leaf_name], leaf)
    return params


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------

_CLIP_RULES = [
    (r"^text_model\.", r""),
    (r"embeddings\.token_embedding\.", r"token_embedding."),
    (r"embeddings\.position_embedding\.", r"position_embedding."),
    (r"encoder\.layers\.(\d+)\.", r"layer_\1."),
    (r"self_attn\.", r""),
    (r"mlp\.", r""),
]


def convert_clip_text_state_dict(
    sd: dict[str, np.ndarray]
) -> dict[str, Any]:
    params: dict[str, Any] = {}
    for key, w in sd.items():
        if "position_ids" in key or key.startswith("text_projection"):
            continue
        new = _apply_rules(key, _CLIP_RULES)
        parts = new.split(".")
        if parts[0] == "token_embedding":
            _insert(params, ["token_embedding", "embedding"], w)
            continue
        if parts[0] == "position_embedding":
            _insert(params, ["position_embedding"], w)
            continue
        leaf_name, leaf = _leaf(parts[-1], w)
        _insert(params, parts[:-1] + [leaf_name], leaf)
    return params


# ---------------------------------------------------------------------------
# CLIP vision tower / full CLIPModel (CLIP-score metrics)
# ---------------------------------------------------------------------------

_CLIP_VISION_RULES = [
    (r"^vision_model\.embeddings\.patch_embedding\.", r"patch_embed."),
    (r"^vision_model\.pre_layrnorm\.", r"pre_layernorm."),  # HF typo
    (r"^vision_model\.post_layernorm\.", r"post_layernorm."),
    (r"^vision_model\.encoder\.layers\.(\d+)\.", r"layer_\1."),
    (r"self_attn\.", r""),
    (r"mlp\.", r""),
]


def convert_clip_vision_state_dict(
    sd: dict[str, np.ndarray]
) -> dict[str, Any]:
    """HF CLIPVisionModel/CLIPModel vision_model.* -> CLIPVisionModel params."""
    params: dict[str, Any] = {}
    for key, w in sd.items():
        if not key.startswith("vision_model."):
            continue
        if key.endswith("position_ids"):
            continue
        if key == "vision_model.embeddings.class_embedding":
            params["class_embedding"] = w
            continue
        if key == "vision_model.embeddings.position_embedding.weight":
            params["position_embedding"] = w
            continue
        new = _apply_rules(key, _CLIP_VISION_RULES)
        parts = new.split(".")
        leaf_name, leaf = _leaf(parts[-1], w)
        _insert(params, parts[:-1] + [leaf_name], leaf)
    return params


def convert_clip_model_state_dict(
    sd: dict[str, np.ndarray]
) -> dict[str, Any]:
    """HF CLIPModel -> models.clip_vision.CLIPScorer params (both towers
    plus the no-bias projection heads; logit_scale is not needed for the
    cosine-based CLIP-score)."""
    text_sd = {
        k: v for k, v in sd.items() if k.startswith("text_model.")
    }
    return {
        "vision": convert_clip_vision_state_dict(sd),
        "text": convert_clip_text_state_dict(text_sd),
        "visual_projection": {"kernel": sd["visual_projection.weight"].T},
        "text_projection": {"kernel": sd["text_projection.weight"].T},
    }


# ---------------------------------------------------------------------------
# DPT depth estimator (MiDaS DPT_Large == HF Intel/dpt-large)
# ---------------------------------------------------------------------------

_DPT_RULES = [
    (r"^dpt\.embeddings\.patch_embeddings\.projection\.", r"patch_embed."),
    (r"^dpt\.encoder\.layer\.(\d+)\.layernorm_before\.", r"block_\1.norm1."),
    (r"^dpt\.encoder\.layer\.(\d+)\.layernorm_after\.", r"block_\1.norm2."),
    (
        r"^dpt\.encoder\.layer\.(\d+)\.attention\.attention\.query\.",
        r"block_\1.q.",
    ),
    (
        r"^dpt\.encoder\.layer\.(\d+)\.attention\.attention\.key\.",
        r"block_\1.k.",
    ),
    (
        r"^dpt\.encoder\.layer\.(\d+)\.attention\.attention\.value\.",
        r"block_\1.v.",
    ),
    (
        r"^dpt\.encoder\.layer\.(\d+)\.attention\.output\.dense\.",
        r"block_\1.proj.",
    ),
    (r"^dpt\.encoder\.layer\.(\d+)\.intermediate\.dense\.", r"block_\1.fc1."),
    (r"^dpt\.encoder\.layer\.(\d+)\.output\.dense\.", r"block_\1.fc2."),
    (
        r"^neck\.reassemble_stage\.readout_projects\.(\d+)\.0\.",
        r"reassemble_\1.readout.",
    ),
    (
        r"^neck\.reassemble_stage\.layers\.(\d+)\.projection\.",
        r"reassemble_\1.proj.",
    ),
    (
        r"^neck\.reassemble_stage\.layers\.(\d+)\.resize\.",
        r"reassemble_\1.resize.",
    ),
    (r"^neck\.convs\.(\d+)\.", r"neck_conv_\1."),
    (r"^neck\.fusion_stage\.layers\.(\d+)\.projection\.", r"fusion_\1.proj."),
    (
        r"^neck\.fusion_stage\.layers\.(\d+)\.residual_layer(\d)\."
        r"convolution(\d)\.",
        r"fusion_\1.res\2.conv\3.",
    ),
    (r"^head\.head\.0\.", r"head_conv1."),
    (r"^head\.head\.2\.", r"head_conv2."),
    (r"^head\.head\.4\.", r"head_conv3."),
]


def convert_dpt_state_dict(
    sd: dict[str, np.ndarray], config=None
) -> dict[str, Any]:
    """HF DPTForDepthEstimation state dict -> models.dpt.DPTDepthModel params.

    The reference runs this model via torch.hub intel-isl/MiDaS DPT_Large
    (preprocess.py:69-70); the identical weights ship on the HF hub as
    Intel/dpt-large. ``config`` (models.dpt.DPTConfig) identifies which
    reassemble stages use a transposed-conv resize (factor > 1): torch
    ConvTranspose2d weights are (in, out, k, k) and map to the einsum
    pixel-shuffle kernel (k, k, in, out) — NOT the regular conv transpose
    (the in/out axes are swapped vs Conv2d's OIHW).

    dpt.layernorm / dpt.pooler are skipped: the depth path consumes the raw
    (pre-final-layernorm) block outputs (HF modeling_dpt
    DPTForDepthEstimation.forward uses hidden_states[1:], untouched by
    DPTModel.layernorm which only transforms last_hidden_state).
    """
    from tokenflow_tpu.models.dpt import DPTConfig

    config = config or DPTConfig.dpt_large()
    upsample_stages = {
        i for i, f in enumerate(config.reassemble_factors) if f > 1
    }
    params: dict[str, Any] = {}
    for key, w in sd.items():
        if key == "dpt.embeddings.cls_token":
            params["cls_token"] = w
            continue
        if key == "dpt.embeddings.position_embeddings":
            params["pos_embed"] = w
            continue
        if key.startswith(("dpt.layernorm.", "dpt.pooler.")):
            continue
        if key.startswith("neck.fusion_stage.layers.0.residual_layer1."):
            # the first fusion layer (deepest feature) never receives a
            # residual; HF instantiates the unit anyway but never calls it
            continue
        new = _apply_rules(key, _DPT_RULES)
        parts = new.split(".")
        m = re.match(r"reassemble_(\d+)$", parts[0])
        if (
            m
            and parts[1] == "resize"
            and int(m.group(1)) in upsample_stages
        ):
            if parts[-1] == "weight":
                _insert(
                    params,
                    [parts[0], "resize_kernel"],
                    w.transpose(2, 3, 0, 1),  # (in,out,k,k) -> (k,k,in,out)
                )
            else:
                _insert(params, [parts[0], "resize_bias"], w)
            continue
        leaf_name, leaf = _leaf(parts[-1], w)
        _insert(params, parts[:-1] + [leaf_name], leaf)
    return params


# ---------------------------------------------------------------------------
# pretrained-directory loading (diffusers layout)
# ---------------------------------------------------------------------------


def _maybe_json(path: str) -> dict:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def load_pretrained(
    model_dir: str,
    components: tuple[str, ...] = ("unet", "vae", "text_encoder"),
) -> dict[str, Any]:
    """Load a diffusers-layout checkpoint directory into Flax params.

    Returns {component: {"params": pytree, "config": dict}}. The directory
    must contain ``unet/``, ``vae/``, ``text_encoder/`` subfolders as in the
    HF hub layout of the SD checkpoints the reference uses
    (preprocess.py:51-57).
    """
    converters: dict[str, Callable] = {
        "unet": convert_unet_state_dict,
        "vae": convert_vae_state_dict,
        "text_encoder": convert_clip_text_state_dict,
        "controlnet": convert_controlnet_state_dict,
    }
    out: dict[str, Any] = {}
    for comp in components:
        comp_dir = os.path.join(model_dir, comp)
        sd = load_component_state_dict(comp_dir)
        out[comp] = {
            "params": converters[comp](sd),
            "config": _maybe_json(os.path.join(comp_dir, "config.json")),
        }
    return out


def assert_params_match(
    converted: dict, expected: dict, path: str = ""
) -> None:
    """Raise with a precise diff if a converted tree mismatches the model's
    expected structure/shapes (expected from jax.eval_shape of init)."""
    ck, ek = set(converted), set(expected)
    if ck != ek:
        raise ValueError(
            f"at {path or '<root>'}: missing={sorted(ek - ck)} "
            f"unexpected={sorted(ck - ek)}"
        )
    for k in ck:
        c, e = converted[k], expected[k]
        if isinstance(e, dict):
            assert_params_match(c, e, f"{path}/{k}")
        else:
            if tuple(c.shape) != tuple(e.shape):
                raise ValueError(
                    f"at {path}/{k}: shape {tuple(c.shape)} != "
                    f"expected {tuple(e.shape)}"
                )
