"""Test config: force CPU platform with 8 virtual devices so sharding
tests run without TPU hardware (the reference's mpi_pool_executor fixture
analog — SURVEY.md §4 takeaway 4)."""
import os

# The ambient environment pins JAX_PLATFORMS=axon (tunneled TPU); tests
# must run on the local virtual-8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = \
        flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" via jax
# config (which overrides the env var) — override it back before any
# backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_test_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
