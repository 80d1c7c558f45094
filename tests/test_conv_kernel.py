"""Pallas stride-2 conv (learned-head encoder) vs lax.conv."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpufg.kernels.conv import conv3x3_s2
from tpufg.models import rife


@pytest.mark.parametrize("cin,cout,h,w", [(8, 32, 64, 256), (8, 32, 96, 384),
                                          (4, 16, 32, 128)])
def test_matches_lax_conv(rng, cin, cout, h, w):
    x = jnp.asarray(rng.random((cin, h, w), np.float32))
    wgt = jnp.asarray(rng.normal(0, 0.2, (cout, cin, 3, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (cout,)).astype(np.float32))
    for dt in (jnp.float32, jnp.bfloat16):
        ref = rife._conv(x[None], wgt, b, 2, dt)[0]
        got = conv3x3_s2(x, wgt, b, compute_dtype=dt)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5 if dt == jnp.float32 else 3e-2)


def test_cin32_auto_tile(rng):
    # enc2-class shape: the auto tile drops to (16, 128) (VMEM-bounded
    # block-diagonal row selector at Cin=32)
    x = jnp.asarray(rng.random((32, 64, 256), np.float32))
    wgt = jnp.asarray(rng.normal(0, 0.2, (64, 32, 3, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (64,)).astype(np.float32))
    ref = rife._conv(x[None], wgt, b, 2, jnp.bfloat16)[0]
    got = conv3x3_s2(x, wgt, b, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-2)


def test_non_tile_multiple_sizes(rng):
    # output 30x70 is far off the (32, 128) tile lattice; the pad+crop
    # must keep edge outputs identical (zero-pad == SAME semantics)
    x = jnp.asarray(rng.random((8, 60, 140), np.float32))
    wgt = jnp.asarray(rng.normal(0, 0.2, (32, 8, 3, 3)).astype(np.float32))
    b = jnp.zeros((32,), np.float32)
    ref = rife._conv(x[None], wgt, b, 2, jnp.float32)[0]
    got = conv3x3_s2(x, wgt, b, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_odd_size_rejected(rng):
    with pytest.raises(ValueError, match="even"):
        conv3x3_s2(jnp.zeros((8, 63, 128)), jnp.zeros((32, 8, 3, 3)),
                   jnp.zeros((32,)))
