"""Test configuration: force CPU with 8 virtual devices.

Tests run on CPU (Pallas kernels in interpret mode); multi-chip sharding
tests use the 8 virtual CPU devices.  This must happen before any JAX
backend initialization, and must override the axon TPU platform that the
environment's sitecustomize registers.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_frame(rng, h, w, c=4):
    """uint8-quantized random frame in [0,1] f32 — realistic frame content."""
    return (rng.integers(0, 256, size=(h, w, c)).astype(np.float32) / 255.0)
