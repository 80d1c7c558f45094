"""Pallas block-granular warp+blend kernel vs f32 oracle (CPU interpret)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import random_frame
from tpufg.kernels.warp import warp_blend_block
from tpufg.ops import warp_blend


def _chw(x):
    return jnp.transpose(x, (2, 0, 1))


@pytest.fixture
def frames(rng):
    prev = jnp.asarray(random_frame(rng, 32, 128))
    curr = jnp.asarray(random_frame(rng, 32, 128))
    return prev, curr


class TestAgainstOracle:
    @pytest.mark.parametrize("mvxy,t", [
        ((3.25, -2.5), 0.5),
        ((0.0, 0.0), 0.25),
        ((-7.75, 6.5), 0.75),
        ((16.0, -16.0), 0.5),   # full reference search radius
    ])
    def test_uniform_mv_matches_perpixel_oracle(self, frames, mvxy, t):
        prev, curr = frames
        h, w = prev.shape[:2]
        g = 16
        mvb = jnp.broadcast_to(
            jnp.array(mvxy, jnp.float32)[:, None, None], (2, h // g, w // g))
        mvp = jnp.broadcast_to(jnp.array(mvxy, jnp.float32), (h, w, 2))
        ref = _chw(warp_blend(prev, curr, mvp, t))
        out = warp_blend_block(_chw(prev), _chw(curr), mvb, factor=t, block=g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_factor_zero_is_prev(self, frames):
        prev, curr = frames
        mv0 = jnp.zeros((2, 2, 8), jnp.float32)
        out = warp_blend_block(_chw(prev), _chw(curr), mv0, factor=0.0)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_chw(prev)), atol=1e-6)

    def test_factor_one_is_curr(self, frames):
        prev, curr = frames
        mv0 = jnp.zeros((2, 2, 8), jnp.float32)
        out = warp_blend_block(_chw(prev), _chw(curr), mv0, factor=1.0)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_chw(curr)), atol=1e-6)

    def test_oob_transparent_black(self):
        # reference-radius motion at t=0.5 pushes border samples off-image
        prev = jnp.ones((4, 32, 128), jnp.float32)
        curr = jnp.ones((4, 32, 128), jnp.float32)
        mv = jnp.full((2, 2, 8), 16.0, jnp.float32)
        out = np.asarray(warp_blend_block(prev, curr, mv, factor=0.5))
        # prev tap at p-8 is OOB for the first rows/cols; curr tap at p+8
        # OOB for the last: corners lose both -> 0, interior keeps 1
        assert out[:, 0, 0].max() <= 0.5 + 1e-6       # one tap blanked
        assert np.allclose(out[:, 16, 64], 1.0)       # interior intact

    def test_varying_block_mvs(self, frames):
        prev, curr = frames
        h, w = 32, 128
        g = 16
        rng = np.random.default_rng(11)
        mvb = jnp.asarray(
            rng.integers(-4, 5, size=(2, h // g, w // g)).astype(np.float32))
        out = warp_blend_block(_chw(prev), _chw(curr), mvb, factor=0.5, block=g)
        # per-block constant MV: block interiors must equal the per-pixel
        # oracle run with the MV field upsampled block-constant
        mvp = jnp.transpose(
            jnp.repeat(jnp.repeat(mvb, g, axis=1), g, axis=2), (1, 2, 0))
        ref = _chw(warp_blend(prev, curr, mvp, 0.5))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestSingleWarp:
    def test_pure_warp_integer_shift(self, frames):
        prev, _ = frames
        mv = jnp.full((2, 2, 8), 4.0, jnp.float32)
        out = np.asarray(warp_blend_block(_chw(prev), _chw(prev), mv,
                                          single=True))
        ref = np.asarray(_chw(prev))
        # interior: out[p] = prev[p + 4] (edge-clamped outside)
        np.testing.assert_allclose(
            out[:, :-4, :-4], ref[:, 4:, 4:], atol=1e-6)
