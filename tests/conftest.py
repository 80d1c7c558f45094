"""Test configuration: force CPU with 8 virtual devices.

Tests run on CPU (Pallas kernels in interpret mode); multi-chip sharding
tests use the 8 virtual CPU devices.  This must happen before any JAX
backend initialization, and must override the axon TPU platform that the
environment's sitecustomize registers.

On-TPU lane: ``TPUFG_TEST_TPU=1 python -m pytest tests/ -m tpu -q`` keeps
the real TPU backend and runs the ``tpu``-marked suite (tests/test_tpu.py)
with COMPILED Mosaic kernels — the production artifact, not interpret
mode.  Without the env var, tpu-marked tests are skipped and everything
else runs on the CPU mesh as before.
"""

import os

ON_TPU = bool(os.environ.get("TPUFG_TEST_TPU"))

if not ON_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(
        reason="needs TPUFG_TEST_TPU=1 and a real TPU backend")
    for item in items:
        if "tpu" in item.keywords and not ON_TPU:
            item.add_marker(skip_tpu)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_frame(rng, h, w, c=4):
    """uint8-quantized random frame in [0,1] f32 — realistic frame content."""
    return (rng.integers(0, 256, size=(h, w, c)).astype(np.float32) / 255.0)
