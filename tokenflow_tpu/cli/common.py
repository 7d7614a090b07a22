"""Shared editor-CLI plumbing (config loading, data/latents assembly) for
the PnP and SDEdit runners — the two reference editors share ~70% of their
code (SURVEY.md §2.3); here the shared part is factored once.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
from pathlib import Path
from typing import Any

import jax.numpy as jnp
import numpy as np
import yaml

from tokenflow_tpu import runtime, utils
from tokenflow_tpu.diffusion import ddim
from tokenflow_tpu.io import latents as latents_io
from tokenflow_tpu.io import video as video_io

VAE_BATCH_SIZE = 10  # reference run_tokenflow_pnp.py:22


REQUIRED_KEYS = {
    "base": (
        "seed", "output_path", "data_path", "latents_path", "n_frames",
        "sd_version", "guidance_scale", "n_timesteps", "prompt",
        "negative_prompt", "batch_size",
    ),
    "pnp": ("n_inversion_steps", "pnp_attn_t", "pnp_f_t"),
    "sdedit": ("start",),
    "controlnet": ("n_inversion_steps",),
}


def validate_config(config: dict, mode: str) -> dict:
    """Fail fast with a precise message on missing keys (the reference
    passes raw dicts around and KeyErrors deep inside — SURVEY.md §5)."""
    missing = [
        k
        for k in REQUIRED_KEYS["base"] + REQUIRED_KEYS.get(mode, ())
        if k not in config
    ]
    if missing:
        raise KeyError(
            f"config missing required keys for {mode}: {missing}"
        )
    # n_frames % batch_size is allowed here: parity behavior is to clamp
    # later (find_latents_path), matching run_tokenflow_pnp.py:121-123
    pc = config.get("propagate_chunk")
    if pc is not None and pc % config["batch_size"]:
        raise ValueError(
            "propagate_chunk must be a multiple of batch_size "
            f"({pc} % {config['batch_size']})"
        )
    return config


def load_config(config_path: str) -> dict:
    with open(config_path) as f:
        return yaml.safe_load(f)


# Kernel-dispatch env flags maybe_frames_mesh tunes for mesh execution.
# They are process-global, so editors scope them with dispatch_env_scope —
# otherwise a later single-device run in the same process would silently
# inherit mesh-tuned dispatch (e.g. globally disabled non-flash kernels).
DISPATCH_FLAGS = (
    "TOKENFLOW_PALLAS",
    "TOKENFLOW_PALLAS_FLASH",
    "TOKENFLOW_FLASH_SHARDED",
    "TOKENFLOW_PALLAS_MATCH",
    "TOKENFLOW_MATCH_SHARDED",
)


@contextlib.contextmanager
def dispatch_env_scope():
    """Snapshot the kernel-dispatch env flags and restore them on exit.

    Editors wrap their whole run (setup through decode) in this so the
    flags maybe_frames_mesh sets stay live for every trace of that run
    but never leak into subsequent runs in the same process."""
    prior = {k: os.environ.get(k) for k in DISPATCH_FLAGS}
    try:
        yield
    finally:
        for k, v in prior.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def maybe_frames_mesh(config: dict, n_frames: int, window_size: int):
    """Build the frames mesh for the editors when multi-device execution is
    available and applicable (extension key ``data_parallel``: 'auto'
    [default] = all local devices, N = first N, 'off' = single-device).

    Gracefully falls back to single-device when the device count is 1 or
    the frame count doesn't factor over the mesh (the reference is strictly
    single-GPU, SURVEY.md §2.12, so every multi-chip behavior is an
    extension and must never break a single-chip run).
    """
    import jax

    dp = config.get("data_parallel", "auto")
    if dp in ("off", "0", 0, False, None):
        return None
    devs = jax.devices()
    n = len(devs) if dp == "auto" else min(int(dp), len(devs))
    if n <= 1:
        return None
    from tokenflow_tpu.sharding import mesh as mesh_lib

    mesh = mesh_lib.make_frames_mesh(n)
    try:
        mesh_lib.check_divisible(n_frames, mesh, window_size)
    except ValueError as e:
        print(
            f"[tokenflow-tpu] data_parallel disabled: {e} "
            f"(set data_parallel: off to silence)"
        )
        return None
    print(
        f"[tokenflow-tpu] frames mesh over {n} devices "
        f"({n_frames // n} frames/device)"
    )
    # A plain pallas_call under GSPMD (no partitioning rule) is computed
    # REPLICATED on every device (sharding/mesh.py caveat) — correct but
    # wasteful, so under a mesh the kernels default to their shardable
    # jnp paths. The flash kernel carries a custom_partitioning rule
    # (kernels/flash_attention.py::flash_attention_sharded) and stays on.
    # Explicit env settings win (setdefault).
    os.environ.setdefault("TOKENFLOW_PALLAS", "0")
    if jax.default_backend() in ("tpu", "axon"):
        # the flash + token-match kernels carry custom_partitioning rules
        # (queries/frames sharded, K/V + keyframe tables gathered), so
        # they stay on under the mesh; everything else runs its shardable
        # jnp path (GroupNorm etc.)
        os.environ.setdefault("TOKENFLOW_PALLAS_FLASH", "1")
        os.environ.setdefault("TOKENFLOW_FLASH_SHARDED", "1")
        os.environ.setdefault("TOKENFLOW_PALLAS_MATCH", "1")
        os.environ.setdefault("TOKENFLOW_MATCH_SHARDED", "1")
    return mesh


def resolve_pivots(
    config: dict, rng, n_steps: int, n_frames: int
) -> np.ndarray:
    """Per-step keyframe (pivot) indices for the edit loop, (T, n_windows).

    ``pivot_indices`` in the config (nested list, absolute frame indices)
    PINS them — required to reproduce a run exactly or to A/B against the
    reference with both sides on the same pivots (the reference draws from
    the torch global RNG, run_tokenflow_pnp.py:224, so identical seeds
    give different pivots across frameworks). Otherwise they are drawn
    from the JAX PRNG exactly as the edit loop would. Either way the
    chosen table is dumped to ``{output_path}/pivots.json`` so any run can
    be replayed pinned.
    """
    import json

    from tokenflow_tpu.editing import pipeline

    ws = config["batch_size"]
    n_windows = n_frames // ws
    pinned = config.get("pivot_indices")
    if pinned is not None:
        pivots = pipeline.validate_pivot_indices(
            np.asarray(pinned, np.int32), n_steps, n_windows, ws
        )
    else:
        pivots = np.asarray(
            pipeline.choose_pivots(rng, n_steps, n_windows, ws)
        )
    os.makedirs(config["output_path"], exist_ok=True)
    with open(os.path.join(config["output_path"], "pivots.json"), "w") as f:
        json.dump(
            {"pinned": pinned is not None, "pivot_indices": pivots.tolist()},
            f,
        )
    return pivots


def schedule_segments(
    config: dict, schedule, pivots: np.ndarray | None = None
) -> list:
    """Edit-loop dispatch plan: [(schedule_segment, pivot_segment), ...].

    Config key ``steps_per_dispatch`` (int) splits the jit-scanned edit
    into several device dispatches with the latents carried through —
    numerically IDENTICAL to the single dispatch (pipeline.split_schedule)
    but bounding each device program's execution time. Needed on rigs
    whose runtime kills long single executions (the axon relay here kills
    ~>60 s programs — PERF.md round 3: the 768p 50-step edit is ~84 s in
    one dispatch and crashes, 10-step segments run); also gives host-side
    progress/checkpoint points. Pick seg_len so the longest segment stays
    well under the limit (segments of equal length share one compiled
    program; an uneven tail compiles once more). Default: one dispatch.
    """
    from tokenflow_tpu.editing import pipeline

    seg_len = int(config.get("steps_per_dispatch") or 0)
    n = len(schedule.timesteps)
    if seg_len <= 0 or seg_len >= n:
        return [(schedule, pivots)]
    # equal-length segments share one compiled program; prefer a divisor
    # of n over a cap-plus-tail split (50 @ <=20 -> 5x10, one remote
    # compile instead of two — utils.plan_seg_len)
    seg_len = utils.plan_seg_len(n, seg_len)
    scheds = pipeline.split_schedule(schedule, seg_len)
    if pivots is None:
        pivs = [None] * len(scheds)
    else:
        pivs = [pivots[s] for s in utils.segment_slices(n, seg_len)]
    print(
        f"[tokenflow-tpu] edit loop in {len(scheds)} dispatches of "
        f"<= {seg_len} steps"
    )
    return list(zip(scheds, pivs))



def frames_per_dispatch_of(config: dict) -> int:
    """The VAE frame-segmentation knob, resolved in ONE place (see
    SDStack._vae_apply; 0 = one dispatch)."""
    return int(config.get("frames_per_dispatch") or 0)


def build_edit_loop(
    stack, config: dict, *, pnp: bool, rng, mesh=None, schedule=None,
    has_depth: bool = False,
):
    """The jitted TokenFlow edit-scan callable, built in ONE place for
    both editors (PnP: ``pnp=True`` + optional depth channel; SDEdit:
    ``pnp=False``) AND for compile prewarming — the prewarm paths
    (:func:`start_compile_ahead`, ``preprocess --prewarm_edit_config``)
    must construct a trace-identical program so the persistent compile
    cache (JAX_COMPILATION_CACHE_DIR) turns the editor's blocking remote
    compile (~2 min per program shape at 768p, PERF.md) into a fetch.

    Signature of the returned callable:
    ``loop(params, x0, traj, embeds3, pivots, sched_seg, depth)`` where
    ``depth`` is None for non-depth models (an empty pytree — it never
    enters the trace). ``rng`` is dead in the trace whenever ``pivots``
    is a real array (tokenflow_sample_loop only consumes it when
    pivot_indices is None), so prewarm builders may pass any key.
    ``schedule`` is only needed under a mesh (sharding tree structure).

    The ``x0`` carry is DONATED (TOKENFLOW_DONATE=0 disables): segmented
    dispatch re-feeds each dispatch's output as the next input, so
    aliasing the buffers halves the carry's HBM footprint and skips a
    copy per dispatch. Segment callers never reuse a carry after
    passing it (checkpoint saves read the NEW carry); use-after-donate
    raises loudly on both CPU and TPU backends.
    """
    import jax

    from tokenflow_tpu.editing import pipeline

    donate = (1,) if donate_enabled() else ()

    pivotal_shardings = None
    if mesh is not None and config.get("shard_pivotal", True):
        from tokenflow_tpu.sharding import mesh as mesh_lib

        pivotal_shardings = mesh_lib.pivotal_shardings(mesh)

    approx = prop_approx_enabled(config)
    if approx:
        print(
            "[tokenflow-tpu] prop_approx ON: source-free propagation "
            "pass (NON-PARITY fast mode — outputs deviate from exact; "
            "bound with scripts/compare_outputs.py)"
        )

    def loop_fn(params, x0, traj, embeds3, pivots, sched_seg, depth):
        return pipeline.tokenflow_sample_loop(
            stack.unet_apply,
            params,
            x0,
            traj,
            embeds3,
            sched_seg,  # traced tables: every segment shares one program
            window_size=config["batch_size"],
            guidance_scale=config["guidance_scale"],
            pnp=pnp,
            rng=rng,
            depth=depth,
            propagate_chunk=config.get("propagate_chunk"),
            fused=config.get("fused_step", False),
            pivotal_shardings=pivotal_shardings,
            pivot_indices=pivots,
            prop_approx=approx,
        )

    if mesh is None:
        return jax.jit(loop_fn, donate_argnums=donate)
    from tokenflow_tpu.sharding import mesh as mesh_lib

    fsh = mesh_lib.frames_sharding(mesh)
    repl = mesh_lib.replicated(mesh)
    return jax.jit(
        loop_fn,
        in_shardings=(
            jax.tree.map(lambda _: repl, stack.unet_params),
            fsh,
            mesh_lib.frames_sharding(mesh, frame_axis=1),
            repl,
            repl,
            jax.tree.map(lambda _: repl, schedule),
            fsh if has_depth else None,
        ),
        out_shardings=fsh,
        donate_argnums=donate,
    )


def prop_approx_enabled(config: dict) -> bool:
    """Approximate (source-free) propagation — opt-in NON-PARITY fast
    mode (pipeline.tokenflow_sample_loop prop_approx). Config key
    ``prop_approx: true/false`` wins; env TOKENFLOW_PROP_APPROX=1 is the
    default when the key is absent. Default off: reference parity."""
    v = config.get("prop_approx")
    if v is not None:
        return bool(v)
    return os.environ.get("TOKENFLOW_PROP_APPROX", "0") == "1"


def donate_enabled() -> bool:
    """Carry donation switch (default on; TOKENFLOW_DONATE=0 for A/B —
    scripts/tpu_donation_ab.py measures the throughput side; the memory
    side is structural: the carry's old and new buffers alias instead of
    coexisting)."""
    return os.environ.get("TOKENFLOW_DONATE", "1") != "0"


def compile_ahead_enabled(config: dict) -> bool:
    """Compile-ahead default: on for real TPU backends (where compiles hit
    the remote service and cost minutes), off on CPU (local compiles are
    cheap and the extra thread only adds noise to the test harness).
    Config key ``compile_ahead: true/false`` overrides."""
    import jax

    v = config.get("compile_ahead", "auto")
    if v in (True, False):
        return v
    return jax.default_backend() in ("tpu", "axon")


def start_compile_ahead(
    loop, example_args: tuple, label: str, example_kwargs: dict = None
):
    """AOT-compile ``loop`` on (possibly abstract) ``example_args`` in a
    daemon thread, populating the in-the-loop compile path's persistent
    cache so the blocking jit call later in the run — or in the NEXT
    process (``preprocess --prewarm_edit_config``) — fetches the
    executable instead of compiling. The remote-compile service is
    independent of device execution, so this overlaps compile wall with
    whatever the device is doing (VAE round-trip, inversion scan).

    Failures are logged and swallowed: a failed prewarm degrades to the
    status quo (compile at first call). Join the returned thread before
    timing-sensitive phases so the jit call doesn't race a concurrent
    compile of the same program."""
    import threading

    def work():
        try:
            with utils.Timer() as t:
                loop.lower(*example_args, **(example_kwargs or {})).compile()
            print(
                f"[tokenflow-tpu] compile-ahead [{label}]: "
                f"{t.seconds:.1f}s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — prewarm must never kill a run
            print(
                f"[tokenflow-tpu] compile-ahead [{label}] failed "
                f"(ignored): {e!r}",
                flush=True,
            )

    th = threading.Thread(target=work, daemon=True, name=f"prewarm-{label}")
    th.start()
    return th


def start_decode_prewarm(
    stack, n_frames: int, latent_hw: tuple, config: dict,
    *, batch: int = VAE_BATCH_SIZE,
) -> list:
    """Compile-ahead threads for the VAE decode program(s) this run will
    dispatch (editor: vae_recon + decode_and_save; preprocess:
    reconstruction frames + inverted.mp4 — all one fp32-canonical
    program per shape since round 5). Returns [] on CPU backends (same
    gate as :func:`compile_ahead_enabled`); callers gate on
    ``mesh is None`` (the sharded decode compiles its own variant)."""
    if not compile_ahead_enabled(config):
        return []
    return [
        start_compile_ahead(fn, args, f"vae-decode/{i}", kwargs)
        for i, (fn, args, kwargs) in enumerate(
            stack.decode_prewarm_specs(
                n_frames, latent_hw, batch=batch,
                frames_per_dispatch=frames_per_dispatch_of(config),
            )
        )
    ]


def edit_prewarm_args(
    stack, config: dict, segments: list, n_frames: int, latent_hw: tuple,
    n_saved: int, embeds3, depth_spec=None,
):
    """Abstract argument tuples for prewarming the edit-scan program —
    one per DISTINCT segment length (the planner aims for one; an uneven
    tail adds a second program shape). Shapes/dtypes mirror exactly what
    the editors pass at run time: bf16/stack-dtype carry + trajectory,
    int32 pivot table, concrete schedule-segment pytrees."""
    import jax

    params_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), stack.unet_params
    )
    h, w = latent_hw
    x_spec = jax.ShapeDtypeStruct((n_frames, h, w, 4), stack.dtype)
    traj_spec = jax.ShapeDtypeStruct(
        (n_saved, n_frames, h, w, 4), stack.dtype
    )
    n_windows = n_frames // config["batch_size"]
    out, seen = [], set()
    for sched_seg, _piv in segments:
        n = len(sched_seg.timesteps)
        if n in seen:
            continue
        seen.add(n)
        piv_spec = jax.ShapeDtypeStruct((n, n_windows), jnp.int32)
        out.append(
            (params_spec, x_spec, traj_spec, embeds3, piv_spec, sched_seg,
             depth_spec)
        )
    return out


def _edit_fingerprint(config: dict, segments: list, x_init) -> str:
    """Identity of an edit run for checkpoint/resume: a checkpoint written
    under one config must never seed a run whose schedule, pivots, prompt,
    or INPUT DATA differ (the carry would be silently wrong). Input-data
    identity = data_path/latents_path plus the start-latent shape+dtype,
    mirroring _inversion_fingerprint (a rerun against a different source
    video with the same output_path must not resume the old carry)."""
    import hashlib
    import json

    piv_digest = [
        None
        if piv is None
        else hashlib.sha256(np.ascontiguousarray(piv)).hexdigest()
        for _, piv in segments
    ]
    ident = {
        k: config.get(k)
        for k in (
            "seed", "sd_version", "prompt", "negative_prompt", "n_frames",
            "n_timesteps", "batch_size", "guidance_scale", "pnp_attn_t",
            "pnp_f_t", "start", "use_ddim_noise", "steps_per_dispatch",
            "data_path", "latents_path", "n_inversion_steps",
        )
    }
    # resolved (config key OR env): a checkpoint written in exact mode
    # must never seed an approx-mode rerun — the remaining segments would
    # silently mix the two (non-parity) maths in one output
    ident["prop_approx"] = prop_approx_enabled(config)
    ident["segment_steps"] = [len(s.timesteps) for s, _ in segments]
    ident["pivots"] = piv_digest
    ident["x_init"] = [list(x_init.shape), str(x_init.dtype)]
    return hashlib.sha256(
        json.dumps(ident, sort_keys=True).encode()
    ).hexdigest()


class SegmentCheckpointer:
    """Carry checkpointing for segmented-dispatch loops (edit loop,
    preprocess inversion).

    After each non-final dispatch, :meth:`save` writes the loop carry
    (a tuple of arrays), the completed-dispatch count, and a run
    fingerprint to ``path``; :meth:`resume` restores a matching
    checkpoint so the loop continues exactly where it stopped — segments
    are exact splits of the scan, so resumed == uninterrupted (asserted
    bitwise in tests/test_e2e_cli.py). bf16 carries round-trip through a
    uint16 view (numpy cannot serialize ml_dtypes natively); every other
    dtype is stored as-is, so the restore is bitwise for all carries. A
    fingerprint mismatch (different prompt/schedule/pivots/geometry)
    ignores the file instead of seeding a wrong carry. Disabled
    checkpointers are no-ops, keeping the default loop an async dispatch
    chain (saving forces a host sync per dispatch). The reference offers
    nothing comparable — an interrupted edit or inversion restarts from
    step 0 (run_tokenflow_pnp.py:195-233, preprocess.py:198-230).
    """

    def __init__(
        self, path: str, fingerprint: str, enabled: bool, every: int = 1
    ):
        self.path = path
        self.fingerprint = fingerprint
        self.enabled = enabled
        # save cadence: a checkpoint write is a host sync + a potentially
        # multi-GB npz (config-5 inversion carry ~0.9 GB f32), so
        # ``every=N`` persists only every Nth dispatch boundary; resume
        # restarts from the last saved boundary (segments are exact scan
        # splits, so the replay is bitwise regardless of cadence)
        self.every = max(1, int(every or 1))
        # append-tracked carries (see :meth:`save` ``appended``): host
        # mirror + count of rows already pulled from the device
        self._mirror: dict[int, np.ndarray] = {}
        self._synced: dict[int, int] = {}

    def resume(self, carry: tuple, n_segments: int) -> tuple[int, tuple]:
        if not self.enabled or not os.path.exists(self.path):
            return 0, carry
        try:
            saved = np.load(self.path)
            _ = saved["fingerprint"]
        except Exception as e:
            # an unreadable/truncated checkpoint (e.g. the process died
            # mid-write before :meth:`save` went atomic, or disk
            # corruption) must degrade to a restart from step 0 — exactly
            # the interrupted-run scenario this feature exists for
            print(
                f"[tokenflow-tpu] ignoring unreadable checkpoint "
                f"{self.path}: {e!r}"
            )
            return 0, carry
        if str(saved["fingerprint"]) != self.fingerprint:
            print(
                f"[tokenflow-tpu] ignoring stale {self.path}: different run "
                "config (fingerprint mismatch)"
            )
            return 0, carry
        done = int(saved["segments_done"])
        restored = []
        for i, ref in enumerate(carry):
            arr = saved[f"carry_{i}"]
            if str(saved[f"dtype_{i}"]) == "bfloat16":
                arr = arr.view(np.dtype(jnp.bfloat16))
            restored.append(jnp.asarray(arr, ref.dtype))
        print(
            f"[tokenflow-tpu] resuming at dispatch {done + 1}/"
            f"{n_segments} from {self.path}"
        )
        return done, tuple(restored)

    def save(
        self,
        i: int,
        n_segments: int,
        carry: tuple,
        appended: dict[int, int] | None = None,
    ) -> None:
        """``appended[j] = n`` declares carry ``j`` append-only along axis
        0 with exactly ``n`` valid rows after this dispatch: rows below
        ``n`` never change once written and rows at/above it still hold
        the caller's initial zeros. Both properties hold for scan-
        accumulated save-grid trajectories (inversion save slots are
        ascending and write-once — diffusion/inversion.py::invert_scan).
        The checkpointer then keeps a host mirror and ``device_get``s only
        the rows added since the last save — at config-5 scale that turns
        a ~0.44 GB-per-dispatch device→host pull over the relay tunnel
        into ~44 MB (the round-5 on-chip measurement that motivated this:
        checkpointed inversion 1251 s vs 234 s un-checkpointed
        reconstruction at identical step counts, PERF.md round 5). The
        npz file layout is unchanged, so old/new checkpoints interoperate
        both ways. Cadence-skipped saves transfer nothing; the next save
        pulls the union."""
        if not self.enabled or i >= n_segments - 1:
            return
        if (i + 1) % self.every:
            return
        import jax

        payload = {}
        for j, a in enumerate(carry):
            if appended and j in appended:
                hi = int(appended[j])
                m = self._mirror.get(j)
                if m is None:
                    # rows >= the valid count are untouched initial zeros
                    # on device, so zeros is the correct mirror seed even
                    # after a resume mid-run
                    m = np.zeros(a.shape, np.dtype(a.dtype))
                    self._mirror[j] = m
                lo = self._synced.get(j, 0)
                if hi > lo:
                    m[lo:hi] = np.asarray(jax.device_get(a[lo:hi]))
                    self._synced[j] = hi
                host = m
            else:
                host = np.ascontiguousarray(np.asarray(jax.device_get(a)))
            if host.dtype == np.dtype(jnp.bfloat16):
                payload[f"carry_{j}"] = host.view(np.uint16)
                payload[f"dtype_{j}"] = "bfloat16"
            else:
                payload[f"carry_{j}"] = host
                payload[f"dtype_{j}"] = host.dtype.name
        # atomic publish: the inversion carry is ~1.8 GB at config-5
        # scale, so a kill during the multi-second write must never leave
        # a truncated file at the final path (resume() also tolerates one,
        # but a clean tmp+rename keeps the last GOOD checkpoint usable)
        tmp = self.path + ".tmp.npz"  # .npz suffix: np.savez appends it
        np.savez(
            tmp,
            segments_done=i + 1,
            fingerprint=self.fingerprint,
            **payload,
        )
        os.replace(tmp, self.path)

    def done(self) -> None:
        if self.enabled and os.path.exists(self.path):
            os.remove(self.path)
        # release the delta-save host mirrors (~0.9 GB for the config-5
        # trajectory) — the checkpointer outlives the loop it guarded
        self._mirror.clear()
        self._synced.clear()


def run_segmented_edit(config: dict, segments: list, step_fn, x_init):
    """Drive the edit dispatch plan, optionally checkpointing the latent
    carry at dispatch boundaries (config key ``checkpoint_edit: true`` —
    see :class:`SegmentCheckpointer` for the contract; file:
    ``<output_path>/edit_checkpoint.npz``).

    ``step_fn(latents, sched_seg, piv_seg) -> latents`` runs one dispatch.
    """
    checkpoint = bool(config.get("checkpoint_edit"))
    ck = SegmentCheckpointer(
        os.path.join(config["output_path"], "edit_checkpoint.npz"),
        _edit_fingerprint(config, segments, x_init) if checkpoint else "",
        checkpoint,
        every=int(config.get("checkpoint_every") or 1),
    )
    start_seg, (x,) = ck.resume((x_init,), len(segments))
    for i, (sched_seg, piv_seg) in enumerate(segments):
        if i < start_seg:
            continue
        x = step_fn(x, sched_seg, piv_seg)
        ck.save(i, len(segments), (x,))
    ck.done()
    return x

def dump_config(config: dict) -> None:
    os.makedirs(config["output_path"], exist_ok=True)
    with open(os.path.join(config["output_path"], "config.yaml"), "w") as f:
        yaml.dump(config, f)


@dataclasses.dataclass
class EditorData:
    stack: runtime.SDStack
    config: dict
    frames: np.ndarray  # (F, H, W, 3) in [0,1]
    latents: Any  # (F, h, w, 4) scaled
    eps: Any  # (F, h, w, 4) implied inversion noise
    trajectory: latents_io.LatentTrajectory
    embeds3: Any  # (3, 77, D) [inv | uncond | cond]
    save_path: str  # nframes_* dir containing latents/
    mesh: Any = None  # frames mesh when data_parallel is engaged
    # decode compile-ahead threads launched by setup_editor (joined by
    # save_vae_recon/save_outputs before their first decode dispatch)
    decode_prewarm: list = dataclasses.field(default_factory=list)


def setup_editor(
    config: dict,
    *,
    use_steps_dir: bool = True,
) -> EditorData:
    """Common editor init (reference TokenFlow.__init__,
    run_tokenflow_pnp.py:25-68): resolve latents dir, load/clamp frames,
    VAE-encode, recover the inversion endpoint noise, build the 3-part
    text embeds."""
    sd_version = config["sd_version"]
    dtype = jnp.bfloat16 if config.get("dtype", "bf16") == "bf16" else jnp.float32
    stack = runtime.load_stack(
        sd_version,
        model_dir=config.get("model_dir"),
        dtype=dtype,
        param_dtype=dtype,
        init=config.get("init", "auto"),
    )

    video_stem = Path(config["data_path"]).stem
    save_path, n_frames = latents_io.find_latents_path(
        config["latents_path"],
        sd_version,
        video_stem,
        config["n_inversion_steps"] if use_steps_dir else None,
        config["n_frames"],
        config["batch_size"],
    )
    config["n_frames"] = n_frames
    print("Number of frames: ", n_frames)
    # mesh after the frame-count clamp (it must divide the mesh)
    mesh = maybe_frames_mesh(config, n_frames, config["batch_size"])

    # AOT-compile the decode program while the device runs the VAE
    # encode below: every editor decodes twice (vae_recon + outputs)
    # through the same fp32-canonical program (PERF.md round 5)
    decode_prewarm = []
    image_size = int(config.get("image_size", 512))
    if mesh is None:
        hw = image_size // 8
        decode_prewarm = start_decode_prewarm(
            stack, n_frames, (hw, hw), config
        )

    frames = video_io.load_frames(
        config["data_path"], n_frames,
        resize_square=image_size,
    )
    for fps in (10, 20, 30):
        video_io.save_video(
            frames,
            os.path.join(config["output_path"], f"input_fps{fps}.mp4"),
            fps=fps,
        )

    latents = stack.encode_frames(
        frames, batch=VAE_BATCH_SIZE, mesh=mesh,
        frames_per_dispatch=frames_per_dispatch_of(config),
    )

    trajectory = latents_io.load_trajectory(save_path)
    if trajectory.traj.shape[1] < n_frames:
        raise ValueError(
            f"trajectory has {trajectory.traj.shape[1]} frames < {n_frames}"
        )
    trajectory = latents_io.LatentTrajectory(
        traj=trajectory.traj[:, :n_frames],
        save_ts=trajectory.save_ts,
        final=trajectory.final[:n_frames],
        final_t=trajectory.final_t,
    )

    # implied endpoint noise (reference get_ddim_eps,
    # run_tokenflow_pnp.py:186-193)
    sched_full = ddim.make_schedule(config["n_timesteps"])
    alpha_T = sched_full.alphas_cumprod[trajectory.final_t]
    eps = ddim.recover_eps(
        jnp.asarray(trajectory.final), latents.astype(jnp.float32), alpha_T
    )

    inv_prompt = latents_io.read_inversion_prompt(
        os.path.join(save_path, "latents")
    )
    uncond_cond = stack.encode_prompt(
        config["prompt"], config["negative_prompt"]
    )
    inv_embed = stack.encode_prompt(inv_prompt, inv_prompt)[0:1]
    embeds3 = jnp.concatenate([inv_embed, uncond_cond], axis=0)

    return EditorData(
        stack=stack,
        config=config,
        frames=frames,
        latents=latents,
        eps=eps,
        trajectory=trajectory,
        embeds3=embeds3,
        save_path=save_path,
        mesh=mesh,
        decode_prewarm=decode_prewarm,
    )


def save_vae_recon(data: EditorData) -> None:
    """VAE round-trip sanity outputs (reference run_tokenflow_pnp.py:242-249)."""
    for th in data.decode_prewarm:  # don't race the compile-ahead
        th.join()
    out = data.config["output_path"]
    decoded = np.asarray(
        data.stack.decode_latents(
            data.latents, batch=VAE_BATCH_SIZE, mesh=data.mesh,
            frames_per_dispatch=frames_per_dispatch_of(data.config),
        )
    )
    video_io.save_frames(decoded, os.path.join(out, "vae_recon"))
    for fps in (10, 20, 30):
        video_io.save_video(
            decoded, os.path.join(out, f"vae_recon_{fps}.mp4"), fps=fps
        )


def save_outputs(
    data: EditorData, latents_out, tag: str
) -> np.ndarray:
    """Decode final latents, write img_ode/ frames + tagged mp4s
    (reference run_tokenflow_pnp.py:259-261, 269-271)."""
    for th in data.decode_prewarm:  # no-op if save_vae_recon joined
        th.join()
    out = data.config["output_path"]
    decoded = np.asarray(
        data.stack.decode_latents(
            latents_out, batch=VAE_BATCH_SIZE, mesh=data.mesh,
            frames_per_dispatch=frames_per_dispatch_of(data.config),
        )
    )
    video_io.save_frames(decoded, os.path.join(out, "img_ode"))
    for fps in (10, 20, 30):
        video_io.save_video(
            decoded,
            os.path.join(out, f"tokenflow_{tag}_fps_{fps}.mp4"),
            fps=fps,
        )
    return decoded
