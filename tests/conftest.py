"""Test configuration: run everything on CPU with Pallas in interpret mode.

Mirrors the driver contract: multi-chip sharding is validated on a virtual
8-device CPU mesh (`--xla_force_host_platform_device_count=8`); real-TPU
numbers come from bench.py / benchmarks/, not the unit suite.
"""
import os

os.environ["TRS_INTERPRET"] = "1"
# Pin the backend to CPU *before* jax import: the unit suite never uses the
# real chip, and letting JAX probe the experimental axon platform makes the
# whole suite hostage to the tunnel (a wedged tunnel blocked collection for
# 25 min and then errored out, 2026-08-17 — CLAUDE.md "Machine gotchas").
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The env var above is read at jax-import time, and sitecustomize imports
# jax at interpreter start (to register the axon plugin) — before conftest
# runs. The runtime config update is what actually restricts backends()
# here, keeping a wedged tunnel from blocking backend init for the whole
# suite (the plugin's get_backend hook passes "cpu" through untouched).
jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True)
def _cpu_default_device():
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        yield


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The full suite compiles many hundreds of XLA:CPU executables in one
    process; without this, accumulation reproducibly ends in a native
    segfault inside `backend_compile_and_load` (~88% through the suite,
    jax 0.9.0 — observed twice at the same spot, while every module green
    in isolation). Cache reuse matters within a module (tests share pad
    windows), not across modules.
    """
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running sweeps")
