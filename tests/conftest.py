"""Test configuration.

Tests run on CPU with 8 virtual devices (multi-chip sharding logic is validated
on a virtual mesh, mirroring how the reference tests its Distributed path with
local processes — reference: test/DomainDecomposition/testDDParallel_Poisson.jl:2-6)
and with x64 enabled so convergence contracts can be checked at float64.

Note: the runtime image registers a TPU PJRT plugin from sitecustomize before
pytest starts, so ``JAX_PLATFORMS`` in the environment is too late — we switch
the platform through jax.config before any backend is initialised.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(17)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running convergence tests (> ~7s); the quick gate is "
        "`pytest -m 'not slow'` (< 3 min), full suite for release checks")
