"""The TokenFlow editing sample loop — jit-scanned, hook-free.

Replaces the reference's editing stack (run_tokenflow_pnp.py:195-273,
run_tokenflow_sdedit.py:154-216): per denoising timestep,

  1. *pivotal pass* — one UNet call over the randomly-chosen keyframes
     (3-stream [source|uncond|cond] batch) with keyframe extended
     attention, returning the per-site cache {pivot_h, kf_attn};
  2. *propagation pass* — UNet over ALL frames at once (optionally chunked
     to bound memory), self-attention replaced by NN token propagation from
     the cache;
  3. 3-way chunk -> classifier-free guidance -> DDIM step.

TPU-first deltas vs the reference (math preserved):
  - the whole 50-step loop is ONE lax.scan under jit — no per-step python,
    no re-registration of hooks, no disk reloads of source latents (the
    trajectory lives in HBM; the reference reloads the same tensor from
    disk 6x per timestep, tokenflow_utils.py:43-47);
  - the reference's 5 sequential batch passes per step
    (run_tokenflow_pnp.py:229-232) become one batched propagation pass
    (windows are independent given the cache), chunkable via lax.map;
  - pivot indices come from the JAX PRNG (fold_in per step) instead of the
    global torch RNG (run_tokenflow_pnp.py:224).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tokenflow_tpu.diffusion import ddim
from tokenflow_tpu.ops import editctx
from tokenflow_tpu.ops.propagation import propagation_indices

# unet_apply(params, sample, t, context, edit) -> (eps, cache)
UNetApply = Callable[..., tuple[jax.Array, dict]]


@dataclasses.dataclass(frozen=True)
class PivotalShardings:
    """Sharding constraints making the pivotal pass compute sharded over the
    keyframe axis on a frames mesh (SURVEY.md §2.12 sequence parallelism).

    Without these, GSPMD computes the whole pivotal UNet pass replicated on
    every device (the cache is consumed by all frame shards, and nothing
    pins its producer) — wall-clock fine on one chip but Amdahl-limiting on
    a mesh: at 8 devices the replicated pivotal pass is ~70% of the sharded
    step. Constraining the pivotal batch (frame-major, so the (kf, 3)
    factorization shards cleanly) and the cache keyframe axis makes GSPMD
    shard the convs/FFs batch-parallel and turn extended attention into the
    Ulysses-style pattern: queries stay keyframe-sharded, the flattened
    keyframe K/V is all-gathered over ICI (the reference's KV concat,
    tokenflow_utils.py:133-138, is the single-device analog). The keyframe
    count need not divide the mesh (GSPMD pads odd shards internally).

    ``batch``  applies to the (3*kf, h, w, c) pivotal input batch;
    ``pivot_h`` to each site's (kf, s, d) cached source states;
    ``kf_attn`` to each site's (3, kf, s, d) cached attention outputs.
    """

    batch: jax.sharding.Sharding
    pivot_h: jax.sharding.Sharding
    kf_attn: jax.sharding.Sharding

    def constrain_cache(self, cache: dict) -> dict:
        # kf_attn carries the keyframe axis at position 1; every other
        # cache leaf (pivot_h, pivot_h_uncond, conv_src) leads with it
        return {
            site: {
                key: jax.lax.with_sharding_constraint(
                    arr, self.kf_attn if key == "kf_attn" else self.pivot_h
                )
                for key, arr in entry.items()
            }
            for site, entry in cache.items()
        }


@struct.dataclass
class EditSchedule:
    """Per-step tables driving the edit scan.

    A pytree (flax.struct.dataclass), so it can either be closed over
    (tables baked into the trace as constants — the single-dispatch
    default) or passed as a jit ARGUMENT — the segmented-dispatch path
    (:func:`split_schedule`), where every equal-length segment must share
    one executable."""

    timesteps: np.ndarray  # (T,) descending
    alpha_t: np.ndarray  # (T,)
    alpha_prev: np.ndarray  # (T,)
    src_slot: np.ndarray  # (T,) index into the latent trajectory
    qk_gate: np.ndarray  # (T,) bool
    conv_gate: np.ndarray  # (T,) bool


def split_schedule(
    schedule: EditSchedule, seg_len: int
) -> list[EditSchedule]:
    """Host-side split of the per-step tables into contiguous segments of
    at most ``seg_len`` steps.

    ``lax.scan`` over the concatenated tables == sequential scans over
    the segments with the carry threaded through, so running
    :func:`tokenflow_sample_loop` per segment (feeding each segment the
    previous segment's output latents) is EXACTLY the single-dispatch
    edit — the decomposition exists to bound single-device-program
    execution time (long dispatches trip the axon relay's execution
    watchdog at ~60 s; PERF.md round 3) and to surface host-side
    progress/checkpoint points mid-edit."""
    if seg_len <= 0:
        raise ValueError(f"seg_len must be positive, got {seg_len}")
    from tokenflow_tpu.utils import segment_slices

    n = len(schedule.timesteps)
    fields = [f.name for f in dataclasses.fields(EditSchedule)]
    return [
        EditSchedule(**{k: getattr(schedule, k)[s] for k in fields})
        for s in segment_slices(n, seg_len)
    ]


def make_edit_schedule(
    sched: ddim.DDIMSchedule,
    save_timesteps: np.ndarray,
    *,
    pnp_attn_t: float = 0.0,
    pnp_f_t: float = 0.0,
) -> EditSchedule:
    """Build the per-step tables.

    Injection thresholds follow the reference exactly: the first
    ``int(n_timesteps * frac)`` steps of the schedule inject
    (run_tokenflow_pnp.py:235-240, 254-256 — note the fraction is of the
    *full* n_timesteps even though SDEdit truncates the loop).
    """
    ts = sched.timesteps
    slot_of = {int(t): i for i, t in enumerate(save_timesteps)}
    missing = [int(t) for t in ts if int(t) not in slot_of]
    if missing:
        raise ValueError(
            f"edit timesteps {missing} not on the inversion save grid "
            f"(reference asserts the same, tokenflow_utils.py:45)"
        )
    src_slot = np.asarray([slot_of[int(t)] for t in ts], np.int32)
    alpha_t, alpha_prev = sched.step_alphas()
    n_full = sched.num_inference_steps
    qk_n = int(n_full * pnp_attn_t)
    conv_n = int(n_full * pnp_f_t)
    idx = np.arange(len(ts))
    return EditSchedule(
        timesteps=ts.astype(np.int32),
        alpha_t=alpha_t,
        alpha_prev=alpha_prev,
        src_slot=src_slot,
        qk_gate=idx < qk_n,
        conv_gate=idx < conv_n,
    )


def choose_pivots(
    rng: jax.Array, n_steps: int, n_windows: int, window_size: int
) -> jax.Array:
    """Per-step random pivot indices, (n_steps, n_windows) ABSOLUTE frame
    indices (pivot of window w lies in [w*ws, (w+1)*ws)).

    Parity: the reference draws ``randint(batch_size) + arange(0, n, bs)``
    from the torch global RNG every step (run_tokenflow_pnp.py:224); here
    the JAX PRNG (one split per step). Exposed as a public function so
    callers can RECORD the drawn pivots (metrics.json) or PIN them
    (``pivot_indices`` argument of :func:`tokenflow_sample_loop`) — with
    different RNGs, identical seeds give different pivots on the two
    sides of a reference A/B, so output-parity comparisons must pin the
    same pivot table on both (VERDICT round-2 missing #3).
    """
    keys = jax.random.split(rng, n_steps)
    offsets = jnp.arange(n_windows, dtype=jnp.int32) * window_size
    draw = jax.vmap(
        lambda k: jax.random.randint(k, (n_windows,), 0, window_size)
    )(keys)
    return draw.astype(jnp.int32) + offsets[None, :]


def validate_pivot_indices(
    pivots: np.ndarray, n_steps: int, n_windows: int, window_size: int
) -> np.ndarray:
    """Host-side validation of a pinned pivot table (shape + each pivot
    inside its own window, the invariant propagation_indices assumes)."""
    pivots = np.asarray(pivots, np.int32)
    if pivots.shape != (n_steps, n_windows):
        raise ValueError(
            f"pivot_indices shape {pivots.shape} != "
            f"(n_steps={n_steps}, n_windows={n_windows})"
        )
    lo = np.arange(n_windows) * window_size
    if ((pivots < lo) | (pivots >= lo + window_size)).any():
        raise ValueError(
            "pivot_indices out of window: each pivots[t, w] must lie in "
            f"[w*{window_size}, (w+1)*{window_size})"
        )
    return pivots


def _stream_embeds(
    embeds3: jax.Array, n: int
) -> jax.Array:
    """(3, 77, D) [inv|uncond|cond] -> (3n, 77, D) FRAME-MAJOR
    ([inv,uncond,cond] per frame). Same per-(frame,stream) pairing as the
    reference's stream-major concat (run_tokenflow_pnp.py:206-207); the
    frame-major flattening keeps the batch axis shardable over a frames
    mesh (see models/layers.py PIVOTAL note)."""
    return jnp.tile(embeds3, (n, 1, 1))


def _stack_streams(*streams: jax.Array) -> jax.Array:
    """k stream arrays (F, ...) -> (k*F, ...) frame-major batch
    (item i = (frame i//k, stream i%k))."""
    return jnp.stack(streams, axis=1).reshape(
        -1, *streams[0].shape[1:]
    )


def _with_depth(x: jax.Array, depth: Optional[jax.Array]) -> jax.Array:
    if depth is None:
        return x
    return jnp.concatenate([x, depth.astype(x.dtype)], axis=-1)


def tokenflow_sample_loop(
    unet_apply: UNetApply,
    params,
    x_init: jax.Array,  # (F, h, w, 4) noisy start latents
    src_traj: jax.Array,  # (n_save, F, h, w, 4) inversion trajectory
    embeds3: jax.Array,  # (3, 77, D) [inversion | uncond | cond]
    schedule: EditSchedule,
    *,
    window_size: int,
    guidance_scale: float,
    pnp: bool,
    rng: jax.Array,
    depth: Optional[jax.Array] = None,  # (F, h, w, 1)
    propagate_chunk: Optional[int] = None,  # frames, multiple of window_size
    controlnet_fn: Optional[Callable] = None,  # (sample,t,ctx,cond)->(down,mid)
    cond_image: Optional[jax.Array] = None,  # (F, H, W, 3) for controlnet_fn
    fused: bool = False,  # single-pass pivotal+propagation (EditMode.FUSED)
    pivotal_shardings: Optional["PivotalShardings"] = None,
    pivot_indices: Optional[jax.Array] = None,  # (T, n_windows) absolute
    prop_approx: bool = False,  # source-free propagation pass (NON-PARITY)
) -> jax.Array:
    """Run the full TokenFlow edit; returns denoised latents (F, h, w, 4).

    ``pivot_indices`` pins the per-step keyframe choices (overriding the
    PRNG draw) — required for reference A/B parity runs and the composed
    torch golden; when None the pivots are exactly
    ``choose_pivots(rng, ...)``, so callers can record them host-side.

    ``prop_approx`` (opt-in, NON-PARITY fast mode — config key
    ``prop_approx`` / env TOKENFLOW_PROP_APPROX): the propagation pass
    drops the source stream (~1/3 of its batch), which the exact path
    carries through the full UNet solely to provide NN-matching features
    and the conv-injection source (PERF.md known-overhead #3). The pivotal
    pass (unchanged, 3-stream) additionally caches uncond matching tables
    and the pivot source conv features; see editctx.UNetEdit.prop_approx
    for the substitution semantics. Deviation from reference outputs is
    bounded with the metrics harness (scripts/compare_outputs.py), not
    asserted bitwise.
    """
    f_total = x_init.shape[0]
    n_windows = f_total // window_size
    assert n_windows * window_size == f_total
    chunk = propagate_chunk or f_total
    assert chunk % window_size == 0 and f_total % chunk == 0
    n_chunks = f_total // chunk
    if fused and (n_chunks != 1 or controlnet_fn is not None or prop_approx):
        # fusion assumes one full-batch propagation segment; chunked,
        # ControlNet-conditioned, or approximate-propagation runs use the
        # two-pass form
        fused = False

    pa, pb, w1 = (jnp.asarray(a) for a in propagation_indices(f_total, window_size))
    n_steps = len(schedule.timesteps)
    if pivot_indices is None:
        pivot_indices = choose_pivots(rng, n_steps, n_windows, window_size)
    else:
        pivot_indices = jnp.asarray(pivot_indices, jnp.int32)
        assert pivot_indices.shape == (n_steps, n_windows), (
            pivot_indices.shape, n_steps, n_windows,
        )

    def chunk_view(arr):
        return arr.reshape(n_chunks, chunk, *arr.shape[1:])

    pa_c, pb_c, w1_c = chunk_view(pa), chunk_view(pb), chunk_view(w1)
    depth_c = None if depth is None else chunk_view(depth)
    cond_c = None if cond_image is None else chunk_view(cond_image)

    n_prop = 2 if prop_approx else 3  # propagation-pass stream count
    # SDEdit approx (no injection) is source-free in the PIVOTAL pass too:
    # without PnP q/k + conv injection, no stream ever consumes the source
    # stream, and matching runs uncond-vs-uncond (editctx src_free_piv)
    src_free_piv = prop_approx and not pnp
    n_piv = 2 if src_free_piv else 3
    embeds_piv = _stream_embeds(
        embeds3[1:] if src_free_piv else embeds3, n_windows
    )
    embeds_prop = _stream_embeds(
        embeds3[1:] if prop_approx else embeds3, chunk
    )
    embeds_fused = _stream_embeds(embeds3, n_windows + f_total)

    def residual_kwargs(sample, t, embeds, cond, ns=3):
        """ControlNet residuals for an ns-stream pass (cond replicated per
        stream, matching the reference's 3x concat of the conditioning,
        run_tokenflow_pnp.py:201 analog for depth)."""
        if controlnet_fn is None:
            return {}
        cond_s = jnp.repeat(cond, ns, axis=0)  # frame-major replication
        down, mid = controlnet_fn(sample, t, embeds, cond_s)
        return dict(
            down_block_residuals=down, mid_block_residual=mid
        )

    def fused_step_fn(x, xs):
        a_t, a_prev, t, slot, qk_g, conv_g, piv = xs
        src = src_traj[slot]
        d_piv = None if depth is None else depth[piv]
        # [3*kf pivots | 3*f frames], each segment frame-major
        sample = jnp.concatenate(
            [
                _stack_streams(
                    _with_depth(src[piv], d_piv),
                    _with_depth(x[piv], d_piv),
                    _with_depth(x[piv], d_piv),
                ),
                _stack_streams(
                    _with_depth(src, depth),
                    _with_depth(x, depth),
                    _with_depth(x, depth),
                ),
            ],
            axis=0,
        )
        edit = editctx.UNetEdit(
            mode=editctx.EditMode.FUSED,
            n_frames=f_total,
            n_pivots=n_windows,
            pnp=pnp,
            qk_gate=qk_g,
            conv_gate=conv_g,
            prop_pa=pa,
            prop_pb=pb,
            prop_w1=w1,
        )
        eps_all, _ = unet_apply(params, sample, t, embeds_fused, edit)
        eps3 = eps_all.reshape(
            n_windows + f_total, 3, *eps_all.shape[1:]
        )[n_windows:]
        eps = ddim.classifier_free_guidance(
            eps3[:, 1], eps3[:, 2], guidance_scale
        )
        return ddim.ddim_step(x, eps, a_t, a_prev).astype(x.dtype), None

    def step_fn(x, xs):
        a_t, a_prev, t, slot, qk_g, conv_g, piv = xs
        src = src_traj[slot]

        # ---- pivotal pass over the keyframes
        x_piv, src_piv, d_piv = x[piv], src[piv], (
            None if depth is None else depth[piv]
        )
        if src_free_piv:
            sample_piv = _stack_streams(
                _with_depth(x_piv, d_piv),
                _with_depth(x_piv, d_piv),
            )
        else:
            sample_piv = _stack_streams(
                _with_depth(src_piv, d_piv),
                _with_depth(x_piv, d_piv),
                _with_depth(x_piv, d_piv),
            )
        if pivotal_shardings is not None:
            sample_piv = jax.lax.with_sharding_constraint(
                sample_piv, pivotal_shardings.batch
            )
        edit_piv = editctx.UNetEdit(
            mode=editctx.EditMode.PIVOTAL,
            n_frames=n_windows,
            pnp=pnp,
            prop_approx=prop_approx,
            qk_gate=qk_g,
            conv_gate=conv_g,
        )
        # pivot eps is discarded — only the cache matters (the reference
        # does the same, run_tokenflow_pnp.py:227)
        _, cache = unet_apply(
            params, sample_piv, t, embeds_piv, edit_piv,
            **residual_kwargs(
                sample_piv, t, embeds_piv,
                None if cond_image is None else cond_image[piv],
                ns=n_piv,
            ),
        )
        if pivotal_shardings is not None:
            cache = pivotal_shardings.constrain_cache(cache)

        # ---- propagation pass over all frames (chunked)
        def prop_one(args):
            x_c, src_c, pa_i, pb_i, w1_i, d_i, cn_i = args
            if prop_approx:
                # source-free pass: [uncond|cond] only (the source
                # stream's outputs are discarded by CFG anyway; its
                # features are substituted from the pivotal cache)
                sample = _stack_streams(
                    _with_depth(x_c, d_i),
                    _with_depth(x_c, d_i),
                )
            else:
                sample = _stack_streams(
                    _with_depth(src_c, d_i),
                    _with_depth(x_c, d_i),
                    _with_depth(x_c, d_i),
                )
            edit = editctx.UNetEdit(
                mode=editctx.EditMode.PROPAGATE,
                n_frames=chunk,
                pnp=pnp,
                prop_approx=prop_approx,
                qk_gate=qk_g,
                conv_gate=conv_g,
                cache=cache,
                prop_pa=pa_i,
                prop_pb=pb_i,
                prop_w1=w1_i,
            )
            eps_c, _ = unet_apply(
                params, sample, t, embeds_prop, edit,
                **residual_kwargs(sample, t, embeds_prop, cn_i, ns=n_prop),
            )
            # stay FRAME-MAJOR (chunk, ns, ...): CFG slices the stream axis
            # directly; the former stream-major moveaxis was a per-step
            # transpose XLA materialized in the scan (PERF.md round-2 op
            # profile "copies/scan plumbing")
            return eps_c.reshape(chunk, n_prop, *eps_c.shape[1:])

        x_c, src_c = chunk_view(x), chunk_view(src)
        if n_chunks == 1:
            eps3 = prop_one(
                (x_c[0], src_c[0], pa_c[0], pb_c[0], w1_c[0],
                 None if depth is None else depth_c[0],
                 None if cond_image is None else cond_c[0])
            )
        else:
            # lax.map can't carry None leaves; assemble present aux arrays
            aux = [a for a in (depth_c, cond_c) if a is not None]

            def unpack(args):
                x_i, src_i, pa_i, pb_i, w1_i, *rest = args
                it = iter(rest)
                d_i = next(it) if depth is not None else None
                cn_i = next(it) if cond_image is not None else None
                return prop_one((x_i, src_i, pa_i, pb_i, w1_i, d_i, cn_i))

            eps3 = jax.lax.map(
                unpack, (x_c, src_c, pa_c, pb_c, w1_c, *aux)
            )
            # (n_chunks, chunk, ns, ...) -> (F, ns, ...)
            eps3 = eps3.reshape(f_total, n_prop, *eps3.shape[3:])

        # stream layout: [src|uncond|cond] exact, [uncond|cond] approx
        u_idx, c_idx = (0, 1) if prop_approx else (1, 2)
        eps = ddim.classifier_free_guidance(
            eps3[:, u_idx], eps3[:, c_idx], guidance_scale
        )
        x = ddim.ddim_step(x, eps, a_t, a_prev).astype(x.dtype)
        return x, None

    xs = (
        jnp.asarray(schedule.alpha_t),
        jnp.asarray(schedule.alpha_prev),
        jnp.asarray(schedule.timesteps),
        jnp.asarray(schedule.src_slot),
        jnp.asarray(schedule.qk_gate),
        jnp.asarray(schedule.conv_gate),
        pivot_indices,
    )
    x_out, _ = jax.lax.scan(
        fused_step_fn if fused else step_fn, x_init, xs
    )
    return x_out


def vanilla_sample_loop(
    unet_apply: UNetApply,
    params,
    x_init: jax.Array,
    embeds2: jax.Array,  # (2, 77, D) [uncond | cond]
    schedule: EditSchedule,
    *,
    guidance_scale: float,
    frame_chunk: Optional[int] = None,
) -> jax.Array:
    """Per-frame SDEdit baseline (no TokenFlow): 2-stream CFG sampling.

    Parity: the uncalled reference baseline run_tokenflow_sdedit.py:218-257.
    """
    f_total = x_init.shape[0]
    chunk = frame_chunk or f_total
    assert f_total % chunk == 0
    n_chunks = f_total // chunk
    embeds = _stream_embeds(embeds2, chunk)

    def denoise_chunk(x_c, t):
        sample = _stack_streams(x_c, x_c)  # frame-major [uncond|cond]
        eps2, _ = unet_apply(params, sample, t, embeds, None)
        eps2 = eps2.reshape(chunk, 2, *eps2.shape[1:])
        return ddim.classifier_free_guidance(
            eps2[:, 0], eps2[:, 1], guidance_scale
        )

    def step_fn(x, xs):
        a_t, a_prev, t = xs
        if n_chunks == 1:
            eps = denoise_chunk(x, t)
        else:
            xc = x.reshape(n_chunks, chunk, *x.shape[1:])
            eps = jax.lax.map(lambda xb: denoise_chunk(xb, t), xc)
            eps = eps.reshape(f_total, *x.shape[1:])
        return ddim.ddim_step(x, eps, a_t, a_prev).astype(x.dtype), None

    xs = (
        jnp.asarray(schedule.alpha_t),
        jnp.asarray(schedule.alpha_prev),
        jnp.asarray(schedule.timesteps),
    )
    x_out, _ = jax.lax.scan(step_fn, x_init, xs)
    return x_out
