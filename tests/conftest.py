"""Test config: force an 8-device virtual CPU platform so sharding/pjit paths are
exercised without TPU hardware (the driver separately dry-runs multi-chip)."""

import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
