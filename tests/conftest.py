"""Test config: force an 8-device virtual CPU platform so sharding/pjit paths are
exercised without TPU hardware (the driver separately dry-runs multi-chip)."""

import os

# The environment presets JAX_PLATFORMS=axon (real TPU) and a sitecustomize imports
# jax at interpreter startup, so env vars alone are too late — use jax.config.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# exact-comparison tests need f32 matmuls, not the TPU-style bf16 default
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
