"""Test harness: force CPU JAX with 8 virtual devices (the cluster-free
multi-device harness from SURVEY.md §4) so tests never depend on the TPU
tunnel. TPU-only tests are marked `tpu` and opt in via TOKENFLOW_TEST_TPU=1.
"""

import os
import sys

import pytest


def _want_reexec() -> bool:
    # The axon sitecustomize registers a remote-TPU PJRT plugin in every
    # python process, adding minutes of tunnel-handshake latency even under
    # JAX_PLATFORMS=cpu. Re-exec the test process with the registration
    # disabled. jax is imported by sitecustomize but backends initialize
    # lazily, so re-exec'ing before any jax use is safe; popping the env
    # var prevents a re-exec loop.
    return (
        os.environ.get("TOKENFLOW_TEST_TPU", "0") != "1"
        and bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
    )


def _cpu_test_env() -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["XLA_FLAGS"] = flags
    # persistent compile cache: the full suite spends most of its ~30 min
    # recompiling unchanged programs on the single host core
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_cpu")
    return env


if os.environ.get("TOKENFLOW_TEST_TPU", "0") != "1" and not _want_reexec():
    # Already clean (or axon not present): just pin the CPU settings.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_cpu")


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")
    config.addinivalue_line("markers", "slow: long-running test")
    if _want_reexec():
        # Release pytest's fd-level capture so the re-exec'ed process
        # writes to the real stdout/stderr.
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
        os.execve(sys.executable, list(sys.orig_argv), _cpu_test_env())


def pytest_collection_modifyitems(config, items):
    if os.environ.get("TOKENFLOW_TEST_TPU", "0") == "1":
        return
    skip_tpu = pytest.mark.skip(
        reason="TPU tests disabled (set TOKENFLOW_TEST_TPU=1)"
    )
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
