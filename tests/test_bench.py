"""bench.py robustness: with the TPU relay dead, the benchmark must exit
quickly with ONE parseable terminal JSON line instead of burning hours of
per-variant timeouts (the round-3 BENCH artifact was rc=124/parsed:null —
VERDICT r03 #1)."""

import importlib.util
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

BENCH = Path(__file__).resolve().parent.parent / "bench.py"


@pytest.fixture(scope="module")
def bench_mod():
    spec = importlib.util.spec_from_file_location("bench_under_test", BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_relay_down_signatures(bench_mod):
    # the exact round-3 failure line
    assert bench_mod.relay_down(
        "RuntimeError: Unable to initialize backend 'axon': UNAVAILABLE: "
        "TPU backend setup/compile error (Unavailable)."
    )
    assert not bench_mod.relay_down("some unrelated CUDA OOM")
    assert not bench_mod.relay_down("")


def test_last_good_bench_skips_failures(bench_mod):
    # the repo carries BENCH_r01/r02 (parsed) and BENCH_r03 (parsed:null);
    # the echo source must be a real measurement
    good = bench_mod.last_good_bench()
    assert good is not None
    src, parsed = good
    assert "status" not in parsed
    assert parsed["value"] > 0


def test_emit_unavailable_prints_terminal_json(bench_mod, capsys):
    with pytest.raises(SystemExit) as exc:
        bench_mod.emit_unavailable("test reason")
    assert exc.value.code == 0  # parseable-failure exits 0, not nonzero
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert result["status"] == "tpu_unavailable"
    assert result["reason"] == "test reason"
    assert result["value"] == 0.0
    for k in ("metric", "unit", "vs_baseline"):
        assert k in result
    # the stale echo is clearly marked and carries the last good number
    stale = result.get("stale_last_good")
    assert stale and stale["stale"] is True and stale["value"] > 0


def test_bench_dead_relay_exits_fast_with_json():
    """Full-process check: a bench whose preflight cannot reach any
    device still prints a terminal JSON line and exits 0 well under the
    old multi-hour burn (here: one failed preflight attempt)."""
    env = dict(
        os.environ,
        BENCH_PREFLIGHT_TRIES="1",
        BENCH_PREFLIGHT_TIMEOUT="60",
        # force the preflight subprocess onto a nonexistent backend so it
        # fails deterministically without a TPU in the loop
        JAX_PLATFORMS="no_such_platform",
    )
    env.pop("BENCH_TINY", None)
    proc = subprocess.run(
        [sys.executable, str(BENCH)],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    assert json_lines, proc.stdout
    result = json.loads(json_lines[-1])
    assert result["status"] == "tpu_unavailable"
    assert result["value"] == 0.0
