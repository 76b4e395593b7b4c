"""Test configuration: force an 8-device virtual CPU mesh.

All unit tests run on CPU with 8 virtual devices so sharding/pjit code
paths are exercised without TPU hardware. Must set XLA_FLAGS before jax
is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compilation cache: the suite compiles the same programs
# every session (and the CLI smoke test in every subprocess); caching
# them on disk roughly halves suite wall-clock after the first run.
# Subprocess CLI runs inherit this via the environment.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
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
# the site hook also imports jax at interpreter startup - BEFORE this
# file runs - so the cache env vars above only reach subprocesses (the
# CLI smoke test); the in-process cache needs explicit config updates.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture()
def rng():
    """Per-test generator (seed 0): test inputs are order-independent -
    a session-scoped shared stream made every test's data depend on
    which tests ran before it (subset runs silently exercised different
    inputs than the full suite)."""
    return np.random.default_rng(0)
