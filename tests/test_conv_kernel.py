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


class TestConvChain:
    """conv3x3_chain (stride-1 fused chain).  NOT wired into the model:
    on-chip, any Pallas kernel with two dependent 3D-rhs dots crashes the
    remote compile helper (minimal repro in docs/DESIGN.md 5b r4c), so
    rife keeps the lax chain; the kernel stays correct in interpret mode
    and per-layer (L=1) on chip."""

    def _mk(self, rng, c):
        ws = [jnp.asarray(rng.standard_normal(
            (c[i + 1], c[i], 3, 3)).astype(np.float32)) * 0.2
            for i in range(len(c) - 1)]
        bs = [jnp.asarray(rng.standard_normal(
            (c[i + 1],)).astype(np.float32)) * 0.1
            for i in range(len(c) - 1)]
        return tuple(ws), tuple(bs)

    def _lax_chain(self, x, ws, bs, relus, dt):
        import jax
        from jax import lax
        a = x[None]
        for w, b, r in zip(ws, bs, relus):
            y = lax.conv_general_dilated(
                a.astype(dt), w.astype(dt), (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32)
            a = y + b[None, :, None, None]
            if r:
                a = jax.nn.relu(a)
        return a[0]

    @pytest.mark.parametrize("hw", [(40, 272), (30, 130), (16, 128)])
    def test_matches_lax_chain_f32(self, hw):
        from tpufg.kernels.conv import conv3x3_chain
        rng = np.random.default_rng(0)
        h, w = hw
        ws, bs = self._mk(rng, [13, 16, 16, 5])
        relus = (True, True, False)
        x = jnp.asarray(rng.standard_normal((13, h, w)).astype(np.float32))
        ref = np.asarray(self._lax_chain(x, ws, bs, relus, jnp.float32))
        got = np.asarray(conv3x3_chain(x, ws, bs, relus,
                                       compute_dtype=jnp.float32,
                                       tile=(16, 128)))
        # same math up to f32 tap-accumulation re-association
        assert np.abs(got - ref).max() <= 2e-5 * np.abs(ref).max()

    def test_single_layer_bf16(self):
        from tpufg.kernels.conv import conv3x3_chain
        rng = np.random.default_rng(1)
        ws, bs = self._mk(rng, [8, 6])
        x = jnp.asarray(rng.standard_normal((8, 24, 256)).astype(np.float32))
        ref = np.asarray(self._lax_chain(x, ws, bs, (False,), jnp.bfloat16))
        got = np.asarray(conv3x3_chain(x, ws, bs, (False,),
                                       compute_dtype=jnp.bfloat16))
        assert np.abs(got - ref).max() <= 3e-2 * np.abs(ref).max()

    def test_border_matches_unfused_zero_padding(self):
        """The fused halo must reproduce each intermediate conv's SAME
        zero padding at the true image border (the kernel re-zeros
        out-of-image activations; without that, relu(bias)-class values
        leak across the border)."""
        from tpufg.kernels.conv import conv3x3_chain
        rng = np.random.default_rng(2)
        ws, bs0 = self._mk(rng, [4, 6, 6, 3])
        # large positive biases make any padding leak glaring
        bs = tuple(b + 2.0 for b in bs0)
        relus = (True, True, False)
        x = jnp.asarray(rng.standard_normal((4, 24, 136)).astype(np.float32))
        ref = np.asarray(self._lax_chain(x, ws, bs, relus, jnp.float32))
        got = np.asarray(conv3x3_chain(x, ws, bs, relus,
                                       compute_dtype=jnp.float32,
                                       tile=(8, 128)))
        edge = np.abs(got - ref)[:, :4, :4]
        assert edge.max() <= 2e-5 * np.abs(ref).max()
