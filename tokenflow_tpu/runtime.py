"""Model-stack assembly: configs, weights, tokenizer, prompt encoding, VAE
helpers — the TPU-native replacement for the reference's
``StableDiffusionPipeline.from_pretrained`` plumbing (preprocess.py:51-74,
run_tokenflow_pnp.py:44-57).

Checkpoints are diffusers-layout directories resolved from (in order) an
explicit ``model_dir``, ``$TOKENFLOW_MODELS/{model_key}``, or the HF hub
cache layout under ``$HF_HOME``. With no checkpoint available the stack can
be built random-init (``init="random"``) for benchmarking/smoke runs — SD
compute cost does not depend on weight values.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tokenflow_tpu.io.tokenizer import CLIPTokenizer, HashTokenizer
from tokenflow_tpu.models import weights as weights_lib
from tokenflow_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from tokenflow_tpu.models.unet2d import UNet2DConfig, UNet2DConditionModel
from tokenflow_tpu.models.vae import AutoencoderKL, AutoencoderKLConfig

MODEL_KEYS = {
    # sd_version -> HF repo id (directory name under $TOKENFLOW_MODELS)
    # (reference preprocess.py:39-48)
    "2.1": "stabilityai/stable-diffusion-2-1-base",
    "2.0": "stabilityai/stable-diffusion-2-base",
    "1.5": "runwayml/stable-diffusion-v1-5",
    "ControlNet": "runwayml/stable-diffusion-v1-5",
    "depth": "stabilityai/stable-diffusion-2-depth",
}


def is_depth(sd_version: str) -> bool:
    """Depth-conditioned UNet variants (5 input channels — reference
    preprocess.py:69-70, run_tokenflow_pnp.py:63-64)."""
    return sd_version in ("depth", "tiny-depth")


def is_controlnet(sd_version: str) -> bool:
    """Variants that run the ControlNet residual branch (reference
    preprocess.py:60-68)."""
    return sd_version in ("ControlNet", "tiny-controlnet")


def configs_for(sd_version: str):
    if sd_version.startswith("tiny"):
        # weightless smoke/e2e-test stacks (random init, hash tokenizer);
        # tiny-depth mirrors the 5-channel depth UNet, tiny-controlnet the
        # ControlNet pairing, at test scale
        unet_cfg = UNet2DConfig.tiny()
        if is_depth(sd_version):
            unet_cfg = dataclasses.replace(unet_cfg, in_channels=5)
        return (
            unet_cfg,
            AutoencoderKLConfig.tiny(),
            CLIPTextConfig.tiny(),
        )
    if sd_version in ("2.1", "2.0"):
        return (
            UNet2DConfig.sd21_base(),
            AutoencoderKLConfig.sd(),
            CLIPTextConfig.sd21(),
        )
    if sd_version in ("1.5", "ControlNet"):
        return (
            UNet2DConfig.sd15(),
            AutoencoderKLConfig.sd(),
            CLIPTextConfig.sd15(),
        )
    if sd_version == "depth":
        return (
            UNet2DConfig.sd21_depth(),
            AutoencoderKLConfig.sd(),
            CLIPTextConfig.sd21(),
        )
    raise ValueError(
        f"Stable-diffusion version {sd_version} not supported."
    )


@dataclasses.dataclass
class SDStack:
    sd_version: str
    unet: UNet2DConditionModel
    unet_params: Any
    vae: AutoencoderKL
    vae_params: Any
    text_encoder: CLIPTextModel
    text_params: Any
    tokenizer: Any
    dtype: Any
    _vae_jit_cache: dict = dataclasses.field(default_factory=dict)

    # ---- text ---------------------------------------------------------

    def encode_tokens(self, ids: np.ndarray) -> jax.Array:
        return self.text_encoder.apply(
            self.text_params, jnp.asarray(ids, jnp.int32)
        )

    def encode_prompt(self, prompt: str, negative_prompt: str) -> jax.Array:
        """-> (2, 77, D) [uncond, cond] (reference get_text_embeds order,
        preprocess.py:151-160)."""
        ids = np.stack(
            [self.tokenizer(negative_prompt), self.tokenizer(prompt)]
        )
        return self.encode_tokens(ids)

    # ---- VAE ----------------------------------------------------------

    def encode_frames(
        self,
        frames: jax.Array,
        *,
        batch: int = 10,
        rng: Optional[jax.Array] = None,
        mesh=None,
        frames_per_dispatch: int = 0,
    ) -> jax.Array:
        """float (F, H, W, 3) in [0,1] -> scaled latents (F, h, w, 4).

        Deterministic (posterior mean) by default, like every reference
        call site (preprocess.py:195, run_tokenflow_pnp.py:181)."""
        sf = self.vae.config.scaling_factor
        x = jnp.asarray(frames) * 2.0 - 1.0
        out = self._vae_apply("encode", x, batch, mesh, frames_per_dispatch)
        return out.astype(jnp.float32) * sf

    def decode_latents(
        self,
        latents: jax.Array,
        *,
        batch: int = 10,
        mesh=None,
        frames_per_dispatch: int = 0,
    ) -> jax.Array:
        """scaled latents -> float images in [0,1] (reference
        decode_latents, preprocess.py:162-171). With ``mesh``, frames
        decode data-parallel over the frames axis (SURVEY.md §2.12 — VAE
        work is embarrassingly frame-parallel; config 5 decodes 120
        frames @768p)."""
        sf = self.vae.config.scaling_factor
        # Canonical fp32 decode input: callers hand both fp32 latents
        # (encode_frames output) and bf16 ones (edit/inversion scan
        # carries); without the upcast each dtype compiles its OWN decode
        # program per shape and the second lands cold mid-run (config-5
        # on-chip: a ~530 s remote-compile wall inside decode_and_save —
        # PERF.md round 5). bf16->fp32 is exact, the scale divide happens
        # in fp32 (>= the old per-caller-dtype precision; for bf16
        # callers the result can differ from the old bf16 divide by 1
        # bf16 ulp via double rounding), and the VAE casts to its compute
        # dtype at the first layer — fp32 and bf16 callers now get
        # IDENTICAL outputs from ONE shared program per shape
        # (test_decode_dtype_canonicalized_one_program).
        z = jnp.asarray(latents).astype(jnp.float32) / sf
        img = self._vae_apply("decode", z, batch, mesh, frames_per_dispatch)
        img = img.astype(jnp.float32)
        return jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)

    def decode_prewarm_specs(
        self,
        n_frames: int,
        latent_hw: tuple,
        *,
        batch: int = 10,
        frames_per_dispatch: int = 0,
    ) -> list:
        """(jitted_fn, args, kwargs) triples that AOT-compile exactly the
        decode program(s) :meth:`decode_latents` will dispatch for this
        geometry (fp32 canonical input; one entry per distinct segment
        length — the planner aims for one). The CLIs' compile-ahead
        threads use this so the 768p decode compile rides the
        inversion/data-prep wall instead of serializing inside the
        vae_recon / decode_and_save phases (PERF.md round 5)."""
        from tokenflow_tpu.utils import plan_seg_len, segment_slices

        params_spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
            self.vae_params,
        )
        h, w = latent_hw
        n = int(n_frames)
        fpd = int(frames_per_dispatch or 0)
        lengths = [n]
        if 0 < fpd < n:
            seg = plan_seg_len(n, fpd)
            lengths = sorted(
                {s.stop - s.start for s in segment_slices(n, seg)}
            )
        fn = self._vae_mapped("decode")
        return [
            (
                fn,
                (
                    params_spec,
                    jax.ShapeDtypeStruct((m, h, w, 4), jnp.float32),
                ),
                {"batch": batch},
            )
            for m in lengths
        ]

    def _vae_apply(
        self, which: str, x: jax.Array, batch: int, mesh,
        frames_per_dispatch: int = 0,
    ):
        fpd = int(frames_per_dispatch or 0)
        n = x.shape[0]
        if mesh is not None and fpd > 0:
            # keep every segment shardable: round fpd DOWN to a multiple
            # of the device count, with ndev as the floor (the minimum
            # shardable segment). A requested fpd < ndev is rounded UP to
            # ndev — that still TIGHTENS the per-dispatch execution bound
            # rather than loosening it: the sharded ndev-frame dispatch
            # computes 1 frame per device (~1 frame-time of wall) vs
            # fpd >= 1 frame-times for an unsharded fpd-frame segment.
            ndev = mesh.devices.size
            fpd = max(ndev, (fpd // ndev) * ndev)
        if 0 < fpd < n:
            # Segmented dispatch over the frame axis: one device program
            # per <=fpd-frame segment (equal-length segments share a
            # compiled program). Needed where the runtime kills long
            # single executions (the axon relay kills ~>60 s programs —
            # PERF.md round 3; 120-frame 768p decode is minutes in one
            # dispatch). Dispatches are async; numerics are unchanged
            # (the lax.map chunking below is already per-frame-batch).
            from tokenflow_tpu.utils import plan_seg_len, segment_slices

            # prefer a divisor of n (all segments share one compiled
            # program — plan_seg_len); sharded segments must stay
            # device-count multiples
            fpd = plan_seg_len(
                n, fpd,
                multiple_of=mesh.devices.size if mesh is not None else 1,
            )
            outs = [
                self._vae_apply(which, x[s], batch, mesh)
                for s in segment_slices(n, fpd)
            ]
            return jnp.concatenate(outs, axis=0)
        if mesh is not None and x.shape[0] % mesh.devices.size == 0:
            return self._vae_mapped_sharded(which, mesh)(
                self.vae_params, x
            )
        return self._vae_mapped(which)(self.vae_params, x, batch)

    def _vae_mapped_sharded(self, which: str, mesh):
        """Frames-mesh variant: one un-chunked dispatch with the frame
        axis sharded (per-device batch = F / n_devices replaces the
        lax.map chunking — both bound peak memory)."""
        key = (which, mesh)
        fn = self._vae_jit_cache.get(key)
        if fn is None:
            from tokenflow_tpu.sharding import mesh as mesh_lib

            vae = self.vae
            method = getattr(vae, which)
            fsh = mesh_lib.frames_sharding(mesh)
            repl = mesh_lib.replicated(mesh)
            fn = jax.jit(
                lambda params, x: vae.apply(params, x, method=method),
                in_shardings=(
                    jax.tree.map(lambda _: repl, self.vae_params),
                    fsh,
                ),
                out_shardings=fsh,
            )
            self._vae_jit_cache[key] = fn
        return fn

    def _vae_mapped(self, which: str):
        """One jitted dispatch per encode/decode call regardless of frame
        count: chunks the frame axis inside jit with ``lax.map`` (the
        round-1 host loop issued one device dispatch per chunk —
        VERDICT.md weak #7; BASELINE config 5 decodes 120 frames @768p).
        Params are a traced argument (closure capture would inline the
        weights as HLO constants and break the remote-compile transport).
        """
        fn = self._vae_jit_cache.get(which)
        if fn is None:
            vae = self.vae
            method = getattr(vae, which)

            @functools.partial(jax.jit, static_argnames=("batch",))
            def fn(params, x, batch):
                n = x.shape[0]
                if n <= batch:
                    return vae.apply(params, x, method=method)
                # balanced chunking: same chunk COUNT as ceil(n/batch)
                # but the chunk size shrinks to fit, so padding is
                # < one chunk row instead of up to batch-1 frames of
                # wasted VAE compute (12 frames @ batch 10 would pad to
                # 20 — 67% extra — exactly the segmented-dispatch shape)
                n_chunks = -(-n // batch)
                bal = -(-n // n_chunks)
                pad = n_chunks * bal - n
                xp = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
                xb = xp.reshape(n_chunks, bal, *x.shape[1:])
                out = jax.lax.map(
                    lambda c: vae.apply(params, c, method=method), xb
                )
                return out.reshape(-1, *out.shape[2:])[:n]

            self._vae_jit_cache[which] = fn
        return fn

    # ---- UNet ---------------------------------------------------------

    def unet_apply(self, params, sample, t, context, edit=None, **kw):
        return self.unet.apply(
            params, sample, t, context, edit=edit, **kw
        )


def _batched(fn, x, batch: int):
    """Host-loop chunking (kept as the test reference for the jitted
    lax.map path in SDStack._vae_mapped)."""
    n = x.shape[0]
    if n <= batch:
        return fn(x)
    outs = [fn(x[i : i + batch]) for i in range(0, n, batch)]
    return jnp.concatenate(outs, axis=0)


def resolve_model_dir(
    sd_version: str, model_dir: Optional[str] = None
) -> Optional[str]:
    if model_dir:
        return model_dir if os.path.isdir(model_dir) else None
    if sd_version not in MODEL_KEYS:
        return None
    key = MODEL_KEYS[sd_version]
    root = os.environ.get("TOKENFLOW_MODELS")
    if root:
        for cand in (os.path.join(root, key), os.path.join(root, key.split("/")[-1])):
            if os.path.isdir(cand):
                return cand
    # HF hub cache layout
    hf_home = os.environ.get(
        "HF_HOME", os.path.expanduser("~/.cache/huggingface")
    )
    snap_root = os.path.join(
        hf_home, "hub", "models--" + key.replace("/", "--"), "snapshots"
    )
    if os.path.isdir(snap_root):
        snaps = sorted(os.listdir(snap_root))
        if snaps:
            return os.path.join(snap_root, snaps[-1])
    return None


def _config_mismatches(ckpt_cfg: dict, expected: dict) -> list[str]:
    """Compare a checkpoint config.json against preset expectations.

    Keys absent from the checkpoint config are not mismatches (older
    checkpoints omit some); present keys must agree."""
    out = []
    for key, want in expected.items():
        if key not in ckpt_cfg:
            continue
        got = ckpt_cfg[key]
        if isinstance(want, (list, tuple)):
            ok = list(got) == list(want)
        elif isinstance(want, float):
            ok = abs(float(got) - want) < 1e-9
        else:
            ok = got == want
        if not ok:
            out.append(f"{key}: checkpoint={got!r} != preset={want!r}")
    return out


def validate_checkpoint_configs(
    sd_version: str, loaded: dict, unet_cfg, vae_cfg, clip_cfg
) -> None:
    """Fail fast (with every mismatch listed) when a checkpoint's own
    config.json disagrees with the preset chosen for ``sd_version``.

    Previously the checkpoint config was loaded but discarded (VERDICT
    round-2 weak #1) — a checkpoint of the wrong SD generation would
    silently mis-configure d_head / projection variants and fail deep in
    flax apply instead of here. Load-bearing keys only; architectural
    equality of the rest is enforced by assert_params_match on the
    converted trees.
    """
    mismatches: list[str] = []

    unet_ck = dict(loaded.get("unet", {}).get("config") or {})
    heads = list(unet_cfg.num_heads)
    # diffusers' historically-misnamed ``attention_head_dim`` IS the
    # per-level head count for SD UNets (models/unet2d.py num_heads note);
    # an int means uniform across levels
    ahd = unet_ck.pop("attention_head_dim", None)
    if ahd is not None:
        ahd_list = [ahd] * len(heads) if isinstance(ahd, int) else list(ahd)
        if ahd_list != heads:
            mismatches.append(
                f"unet: attention_head_dim: checkpoint={ahd!r} "
                f"!= preset={heads!r}"
            )
    mismatches += [
        f"unet: {m}"
        for m in _config_mismatches(
            unet_ck,
            {
                "in_channels": unet_cfg.in_channels,
                "out_channels": unet_cfg.out_channels,
                "cross_attention_dim": unet_cfg.cross_attention_dim,
                "block_out_channels": list(unet_cfg.block_out_channels),
                "layers_per_block": unet_cfg.layers_per_block,
                "use_linear_projection": unet_cfg.use_linear_projection,
            },
        )
    ]
    mismatches += [
        f"vae: {m}"
        for m in _config_mismatches(
            dict(loaded.get("vae", {}).get("config") or {}),
            {
                "in_channels": vae_cfg.in_channels,
                "out_channels": vae_cfg.out_channels,
                "latent_channels": vae_cfg.latent_channels,
                "block_out_channels": list(vae_cfg.block_out_channels),
                "layers_per_block": vae_cfg.layers_per_block,
                "scaling_factor": vae_cfg.scaling_factor,
            },
        )
    ]
    mismatches += [
        f"text_encoder: {m}"
        for m in _config_mismatches(
            dict(loaded.get("text_encoder", {}).get("config") or {}),
            {
                "vocab_size": clip_cfg.vocab_size,
                "hidden_size": clip_cfg.hidden_size,
                "num_hidden_layers": clip_cfg.num_layers,
                "num_attention_heads": clip_cfg.num_heads,
                "intermediate_size": clip_cfg.intermediate_size,
                "max_position_embeddings": clip_cfg.max_position_embeddings,
                "hidden_act": clip_cfg.hidden_act,
            },
        )
    ]
    if mismatches:
        raise ValueError(
            f"checkpoint does not match the sd_version={sd_version!r} "
            "preset:\n  " + "\n  ".join(mismatches)
            + "\n(pass the matching sd_version, or a matching checkpoint)"
        )


_STACK_CACHE: dict = {}


def clear_stack_cache() -> None:
    """Drop every cached SDStack (frees params + jit executables once
    callers release their own references)."""
    _STACK_CACHE.clear()


def load_stack(
    sd_version: str,
    *,
    model_dir: Optional[str] = None,
    dtype: Any = jnp.bfloat16,
    param_dtype: Any = jnp.bfloat16,
    init: str = "auto",  # "auto" | "pretrained" | "random"
    seed: int = 0,
    cache: bool = True,
) -> SDStack:
    """Build (or fetch) the SD model stack.

    ``cache=True`` (default) returns one shared SDStack per distinct
    (version, resolved checkpoint, dtypes, init, seed) within the
    process. Chained stages in one process — ``api.invert`` then
    ``api.edit_pnp``, or a combined preprocess+edit driver — would
    otherwise hold TWO full param sets (~1.8 GB bf16 each) plus two
    executable sets in HBM; at 768p that margin is the difference
    between fitting and crashing the TPU worker (measured: the combined
    config-5 driver crashed in the edit scan, while each stage alone
    runs — PERF.md round 3). Sharing also reuses the per-stack jitted
    VAE/apply caches. Pass ``cache=False`` for an isolated stack.
    """
    found_for_key = resolve_model_dir(sd_version, model_dir)
    key = (
        sd_version, found_for_key, jnp.dtype(dtype).name,
        jnp.dtype(param_dtype).name, init, seed,
    )
    if cache and key in _STACK_CACHE:
        return _STACK_CACHE[key]
    stack = _build_stack(
        sd_version, model_dir=model_dir, dtype=dtype,
        param_dtype=param_dtype, init=init, seed=seed,
    )
    if cache:
        # single-slot cache: chained SAME-key stages share one stack
        # (the HBM-margin case the docstring describes), while a
        # DIFFERENT key evicts the old entry — an unbounded cache would
        # permanently pin every distinct ~1.8 GB param set (plus jit
        # executables) for the life of a multi-version driver process
        _STACK_CACHE.clear()
        _STACK_CACHE[key] = stack
    return stack


def _build_stack(
    sd_version: str,
    *,
    model_dir: Optional[str],
    dtype: Any,
    param_dtype: Any,
    init: str,
    seed: int,
) -> SDStack:
    unet_cfg, vae_cfg, clip_cfg = configs_for(sd_version)
    unet = UNet2DConditionModel(unet_cfg, dtype=dtype, param_dtype=param_dtype)
    vae = AutoencoderKL(vae_cfg, dtype=dtype, param_dtype=param_dtype)
    text = CLIPTextModel(clip_cfg, dtype=dtype, param_dtype=param_dtype)

    found = resolve_model_dir(sd_version, model_dir)
    if init == "pretrained" and found is None:
        raise FileNotFoundError(
            f"no checkpoint for sd_version={sd_version} "
            f"(looked at model_dir={model_dir!r}, $TOKENFLOW_MODELS, HF cache). "
            "Place a diffusers-layout checkpoint of "
            f"{MODEL_KEYS.get(sd_version, sd_version)} "
            f"there, or pass init='random' for weightless smoke runs."
        )

    if found is not None and init != "random":
        loaded = weights_lib.load_pretrained(found)
        # guard 1: the checkpoint's own config.json must agree with the
        # preset (wrong-generation checkpoints fail here with a precise
        # message, not deep in flax apply)
        validate_checkpoint_configs(
            sd_version, loaded, unet_cfg, vae_cfg, clip_cfg
        )
        # guard 2: the converted trees must match each model's expected
        # parameter structure/shapes exactly (jax.eval_shape of init is
        # abstract — no weight compute); a converter/key gap surfaces as
        # a named-path diff instead of a flax traceback
        expected = jax.eval_shape(
            lambda: (
                unet.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 8, 8, unet_cfg.in_channels)),
                    jnp.asarray(0),
                    jnp.zeros((1, 77, unet_cfg.cross_attention_dim)),
                ),
                vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))),
                text.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
                ),
            )
        )
        for comp, exp in zip(("unet", "vae", "text_encoder"), expected):
            weights_lib.assert_params_match(
                loaded[comp]["params"], exp["params"], path=comp
            )

        def cast(tree):
            return jax.tree.map(
                lambda a: jnp.asarray(a, param_dtype), tree
            )

        unet_params = {"params": cast(loaded["unet"]["params"])}
        vae_params = {"params": cast(loaded["vae"]["params"])}
        text_params = {"params": cast(loaded["text_encoder"]["params"])}
        tok_dir = os.path.join(found, "tokenizer")
        tokenizer = CLIPTokenizer.from_pretrained(tok_dir)
    else:
        k = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(k, 3)
        unet_params = unet.init(
            k1,
            jnp.zeros((1, 8, 8, unet_cfg.in_channels)),
            jnp.asarray(0),
            jnp.zeros((1, 77, unet_cfg.cross_attention_dim)),
        )
        vae_params = vae.init(k2, jnp.zeros((1, 32, 32, 3)))
        text_params = text.init(
            k3, jnp.zeros((1, 77), jnp.int32)
        )
        tokenizer = HashTokenizer(vocab_size=clip_cfg.vocab_size)

    return SDStack(
        sd_version=sd_version,
        unet=unet,
        unet_params=unet_params,
        vae=vae,
        vae_params=vae_params,
        text_encoder=text,
        text_params=text_params,
        tokenizer=tokenizer,
        dtype=dtype,
    )
