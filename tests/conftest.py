"""Test configuration: force an 8-device virtual CPU mesh.

All unit tests run on CPU with 8 virtual devices so sharding/pjit code
paths are exercised without TPU hardware. Must set XLA_FLAGS before jax
is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# the environment's axon site hook re-forces JAX_PLATFORMS=axon; the
# config update after import takes precedence.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
