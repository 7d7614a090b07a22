"""Profiling subsystem tests."""

import json
import time

from tokenflow_tpu.profiling import PhaseMetrics, trace
from tokenflow_tpu.utils import Timer, psnr


def test_phase_metrics_roundtrip(tmp_path):
    m = PhaseMetrics()
    with m.phase("a"):
        time.sleep(0.01)
    with m.phase("a"):
        pass
    with m.phase("b"):
        pass
    m.add("score", 1.5)
    rep = m.report()
    assert rep["phases_seconds"]["a"] >= 0.01
    assert "b" in rep["phases_seconds"]
    assert rep["score"] == 1.5
    out = tmp_path / "m.json"
    m.dump(str(out))
    assert json.loads(out.read_text())["score"] == 1.5
    assert "a" in m.pretty()


def test_trace_noop_without_logdir():
    with trace(None):
        pass
    with trace(""):
        pass


def test_timer_and_psnr():
    with Timer() as t:
        time.sleep(0.01)
    assert t.seconds >= 0.01
    import numpy as np

    a = np.zeros((4, 4))
    assert psnr(a, a) == float("inf")
    b = a + 0.1
    assert 19 < psnr(a, b) < 21
