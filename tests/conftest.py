"""Test configuration: run on a virtual 8-device CPU mesh.

Bench and production run on real TPU; tests exercise the identical jitted code
on the CPU backend with 8 fake devices so sharding tests work anywhere.
Must set flags before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Under the axon TPU plugin the JAX_PLATFORMS env var is not honored; the
# config route is (verified).  Must run before any backend initialization.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
