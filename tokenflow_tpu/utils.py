"""Small host-side utilities (seeding, PSNR, timing)."""

from __future__ import annotations

import random
import time

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed python/numpy (and torch if importable) and return the JAX root
    PRNG key. Parity intent: reference util.py:99-103; note JAX streams are
    counter-based, so draws differ from torch's even at equal seeds (the
    reproducibility contract is per-framework determinism)."""
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass
    return jax.random.PRNGKey(seed)


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(max_val**2 / mse)


def force_completion(x) -> None:
    """Force device computation to finish for wall-clock timing.

    ``block_until_ready`` is a no-op under some remote-TPU transports (the
    axon relay), so completion is forced by pulling a device-computed
    scalar to the host (cost: one tiny reduce + scalar transfer)."""
    import jax.numpy as jnp

    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "astype"):
            float(jnp.sum(leaf.astype(jnp.float32)))
            return


class Timer:
    """Wall-clock phase timer: with Timer() as t: ...; t.seconds."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.start
        return False


def segment_slices(n: int, seg_len: int) -> list[slice]:
    """Contiguous <=seg_len-sized slices covering ``range(n)``.

    THE segmentation rule for bounded-execution dispatch (the axon relay
    kills single device programs ~>60 s — PERF.md round 3): the edit
    loop (pipeline.split_schedule), the inversion/reconstruction scans
    (cli/preprocess), the VAE frame axis (runtime._vae_apply) and bench
    all derive their segment boundaries here so they cannot diverge.
    ``seg_len <= 0`` or ``>= n`` means one segment (no split)."""
    if seg_len <= 0 or seg_len >= n:
        return [slice(0, n)]
    return [slice(s, min(s + seg_len, n)) for s in range(0, n, seg_len)]


def plan_seg_len(n: int, max_len: int, *, multiple_of: int = 1) -> int:
    """Pick the actual segment length for splitting ``n`` items under a
    per-segment cap of ``max_len``.

    Remote compile is the expensive resource here (~2 min per distinct
    program shape — PERF.md), and equal-length segments share ONE
    compiled program, so when a divisor of ``n`` close to the cap exists
    we use it instead of the naive cap-plus-tail split: 50 steps at cap
    20 becomes 5x10 (one program) rather than 20+20+10 (two programs).
    The divisor is only taken when it does not explode the dispatch
    count (<= 2x the naive count — for near-prime ``n`` the only
    divisors are tiny, and there the naive two-program split is
    cheaper). ``multiple_of`` constrains candidates (the frames mesh
    needs segments divisible by the device count). Never returns more
    than ``max_len``; callers feed the result to :func:`segment_slices`.
    """
    if max_len <= 0 or max_len >= n:
        return max_len
    naive_count = -(-n // max_len)
    best = 0
    for d in range(max_len, 0, -1):
        if n % d == 0 and d % multiple_of == 0:
            best = d
            break
    if best and n // best <= 2 * naive_count:
        return best
    return max_len
