"""Test configuration: force JAX onto CPU with 8 virtual devices so all
multi-chip sharding paths are exercised without TPU hardware."""

import os

# Force CPU unconditionally — the session environment registers a TPU plugin
# at interpreter start and pins jax_platforms to it, so the env var alone is
# not enough; override the config before any backend initializes. Sharding
# tests rely on 8 virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
