"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware by forcing the
host platform to expose 8 devices (the TPU answer to "multi-node tests
without a cluster" — SURVEY.md §4).

The axon TPU plugin registers itself from sitecustomize at *interpreter
startup* (PYTHONPATH=/root/.axon_site) and routes every XLA compile through
a remote service (~1s per op even on the CPU backend). Env pops after
startup are too late, so pytest_configure re-execs pytest once with a
sanitized environment (stopping pytest's fd capture first so the child's
output reaches the caller).
"""
import os
import sys

_AXON_VARS = ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
              "AXON_LOOPBACK_RELAY", "AXON_POOL_SVC_OVERRIDE")


def _needs_reexec() -> bool:
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS")
                and not os.environ.get("OETR_TPU_TEST_REEXEC"))


def pytest_configure(config):
    if _needs_reexec():
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
        env = dict(os.environ)
        for k in _AXON_VARS:
            env.pop(k, None)
        env["OETR_TPU_TEST_REEXEC"] = "1"
        os.execve(sys.executable,
                  [sys.executable, "-m", "pytest", *sys.argv[1:]], env)


os.environ["JAX_PLATFORMS"] = "cpu"  # force off the axon/TPU backend
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

if not _needs_reexec():
    import jax

    # Math parity tests vs float64 numpy transcriptions need x64; model
    # code pins float32/bfloat16 dtypes explicitly so this only widens the
    # oracles.
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
