"""Test configuration: force JAX onto CPU with 8 virtual devices so all
multi-chip sharding paths are exercised without TPU hardware."""

import os

# Force CPU unconditionally (the session env pins JAX_PLATFORMS to the TPU
# tunnel); sharding tests rely on 8 virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
