"""Tracing / profiling (SURVEY.md §5: the reference ships only tqdm bars;
here profiling is a first-class subsystem).

Two layers:
  - phase metrics: lightweight wall-clock per named phase, collected into a
    report dict that CLIs print and can dump as JSON next to outputs;
  - device traces: ``trace(logdir)`` wraps ``jax.profiler`` so any phase
    can be captured for xprof/tensorboard analysis (works on TPU and CPU).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field


@dataclass
class PhaseMetrics:
    """Accumulates {phase: seconds} plus free-form scalar metrics."""

    phases: dict = field(default_factory=dict)
    scalars: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = (
                self.phases.get(name, 0.0) + time.perf_counter() - t0
            )

    def add(self, name: str, value: float):
        self.scalars[name] = value

    def report(self) -> dict:
        return {"phases_seconds": dict(self.phases), **self.scalars}

    def dump(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)

    def pretty(self) -> str:
        lines = [
            f"  {k:<28s} {v:8.2f}s" for k, v in self.phases.items()
        ] + [f"  {k:<28s} {v}" for k, v in self.scalars.items()]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str | None):
    """jax.profiler trace context; no-op when logdir is falsy or the
    profiler is unavailable."""
    if not logdir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
