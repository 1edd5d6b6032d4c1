"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
tests run anywhere (the standard JAX fake-multi-device setup)."""

import os

# Force CPU even if the shell exports JAX_PLATFORMS=axon/tpu: unit tests must
# be hermetic and fast; TPU behavior is covered by bench.py / integration runs.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/optex_test_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
