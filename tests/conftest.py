"""Test harness: force an 8-device CPU platform so data-parallel sharding is
exercised without TPU hardware (SURVEY.md §4), and keep numerics in fp32."""

import os

# Must run before jax initializes a backend. The session environment pre-sets
# a TPU platform plugin that wins over the JAX_PLATFORMS env var, so force the
# platform through jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# The suite is compile-dominated on a 1-core host (the 3-stage GAN step
# alone costs ~3 min of XLA time); a persistent cache keyed on HLO makes
# repeat runs cheap without changing what is tested.
_cache_dir = os.environ.get("ATTNGAN_TEST_JAX_CACHE",
                            os.path.expanduser("~/.cache/attngan_test_jax"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

assert jax.default_backend() == "cpu", "tests must run on the CPU platform"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
