"""Test configuration: force an 8-device virtual CPU mesh.

Must set env vars before anything imports jax — this mirrors the driver's
multi-chip dry-run environment, so every collective / sharding test runs
without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    # few-core hosts trip XLA:CPU's 40s collective-rendezvous abort
    _flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=600"
               " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120")
os.environ["XLA_FLAGS"] = _flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Some sandboxes pre-import jax via sitecustomize with a hardware platform
# pinned; the config update below wins even in that case.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tests (multi-process cluster etc.)")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
