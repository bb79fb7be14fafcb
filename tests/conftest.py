"""Test configuration: force an 8-virtual-device CPU platform.

All tests run on CPU with 8 fake devices so pjit/sharding paths are
exercised without TPU hardware (the standard JAX testing recipe).
This must run before jax initializes a backend.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The environment's axon site-hook forces jax_platforms=axon (real TPU);
# override it programmatically — env vars alone are not enough here.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
