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

assert jax.default_backend() == "cpu", "tests must run on the CPU platform"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
