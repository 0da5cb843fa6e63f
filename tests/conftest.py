"""Pytest configuration: force the fast CPU backend with 8 virtual devices.

All unit/integration tests run on a virtual 8-device CPU mesh so that
sharding/collective code paths are exercised without TPU hardware (mirrors
the reference's determinism-first conftest, `curobo/tests/conftest.py:34-46`,
adapted to JAX). Benchmarks (`bench.py`) run on the real chip instead.

This module must configure JAX before any test imports trigger backend
initialization, hence the env mutation at import time.
"""

import os

# Must happen before jax backend initialization.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The container's sitecustomize pins JAX_PLATFORMS=axon (single remote TPU);
# override to CPU for the test suite.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: interpret-mode Pallas kernels cost minutes
# of XLA compile on CPU; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/curobo_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    np.random.seed(0)


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)
