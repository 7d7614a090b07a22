"""ControlNet conditioning helpers for the CLIs.

Canny-edge conditioning exactly as the reference computes it
(preprocess.py:113-127: thresholds 100/200, single channel replicated x3,
[0,1] float). The ControlNet weights load from a diffusers-layout dir of
``lllyasviel/sd-controlnet-canny`` resolved like the SD checkpoints.
"""

from __future__ import annotations

import os
from typing import Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from tokenflow_tpu import runtime
from tokenflow_tpu.models import weights as weights_lib
from tokenflow_tpu.models.controlnet import ControlNetModel

CONTROLNET_KEY = "lllyasviel/sd-controlnet-canny"


def canny_cond(
    frames: np.ndarray, low: int = 100, high: int = 200
) -> np.ndarray:
    """float (F,H,W,3) in [0,1] -> canny cond (F,H,W,3) in [0,1]."""
    out = []
    for f in frames:
        edges = cv2.Canny((f * 255).astype(np.uint8), low, high)
        out.append(
            np.repeat(edges[..., None], 3, axis=-1).astype(np.float32)
            / 255.0
        )
    return np.stack(out)


def resolve_controlnet_dir(model_dir: Optional[str] = None) -> Optional[str]:
    if model_dir and os.path.isdir(model_dir):
        return model_dir
    root = os.environ.get("TOKENFLOW_MODELS")
    if root:
        for cand in (
            os.path.join(root, CONTROLNET_KEY),
            os.path.join(root, CONTROLNET_KEY.split("/")[-1]),
        ):
            if os.path.isdir(cand):
                return cand
    return None


def load_controlnet(
    stack: runtime.SDStack,
    model_dir: Optional[str] = None,
    init: str = "auto",
):
    """Returns (model, params). The ControlNet encoder mirrors the base
    UNet's config (SD-1.5 for the canny checkpoint)."""
    cfg = stack.unet.config
    model = ControlNetModel(
        cfg, dtype=stack.dtype, param_dtype=stack.dtype
    )
    found = resolve_controlnet_dir(model_dir)
    if found is None and init == "pretrained":
        raise FileNotFoundError(
            f"no ControlNet checkpoint ({CONTROLNET_KEY}); set "
            f"$TOKENFLOW_MODELS or pass controlnet_dir"
        )
    if found is not None and init != "random":
        sd = weights_lib.load_component_state_dict(found)
        params = {
            "params": jax.tree.map(
                lambda a: jnp.asarray(a, stack.dtype),
                weights_lib.convert_controlnet_state_dict(sd),
            )
        }
    else:
        # cond-embedding depth is inferred from the cond/latent spatial
        # ratio at trace time, so init must use the stack's real VAE
        # factor (x8 for SD, x2 for the tiny test stack)
        vae_factor = 2 ** (len(stack.vae.config.block_out_channels) - 1)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, 8, cfg.in_channels)),
            jnp.asarray(0),
            jnp.zeros((1, 77, cfg.cross_attention_dim)),
            jnp.zeros((1, 8 * vae_factor, 8 * vae_factor, 3)),
        )
    return model, params


def build_controlnet(stack: runtime.SDStack, frames: np.ndarray, opt):
    """-> (model, params, canny).

    Callers must pass ``params`` as a traced jit argument and build the
    apply closure INSIDE the jitted function — closure-captured params
    become HLO literal constants and break the remote-compile transport
    (see cli/preprocess.py eps_fn note)."""
    model, params = load_controlnet(
        stack,
        getattr(opt, "controlnet_dir", None),
        getattr(opt, "init", "auto"),
    )
    canny = jnp.asarray(canny_cond(np.asarray(frames)), stack.dtype)
    return model, params, canny
