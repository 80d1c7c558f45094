"""Property tests for the jnp f32 oracle ops (the executable GLSL spec).

The reference itself has no tests (SURVEY.md §4); these pin the documented
semantics: identity scaling, partition-of-unity edge renormalization, the
motion-search tie-break convention, OOB conventions, and blend boundary
behavior.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import random_frame
from tpufg.ops import (
    bilinear_sample,
    dequantize_unorm8,
    lanczos_scale,
    lanczos_weight,
    motion_search,
    quantize_unorm8,
    warp_blend,
)


class TestLanczosWeight:
    def test_center_is_one(self):
        assert float(lanczos_weight(jnp.array(0.0))) == 1.0

    def test_near_integer_zeros(self):
        # weights at nonzero integers are ~0 (not exactly 0: f32 pi)
        w = lanczos_weight(jnp.array([1.0, 2.0, -1.0, -2.0]))
        assert np.all(np.abs(np.asarray(w)) < 1e-6)

    def test_symmetry(self):
        x = jnp.array([0.3, 0.7, 1.5, 2.9])
        np.testing.assert_array_equal(
            np.asarray(lanczos_weight(x)), np.asarray(lanczos_weight(-x))
        )


class TestLanczosScale:
    def test_identity_roundtrip_uint8(self, rng):
        # identity scale (in == out) reproduces input modulo UNORM8 round-trip
        img = random_frame(rng, 24, 40)
        out = lanczos_scale(jnp.asarray(img), 24, 40)
        np.testing.assert_array_equal(
            np.asarray(quantize_unorm8(out)),
            np.asarray(quantize_unorm8(jnp.asarray(img))),
        )

    def test_constant_preserved(self):
        # partition-of-unity: constant image stays constant (incl. edges)
        img = jnp.full((17, 23, 4), 0.5, jnp.float32)
        out = lanczos_scale(img, 34, 46)
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)

    def test_upscale_shape_and_range(self, rng):
        img = random_frame(rng, 18, 32)
        out = lanczos_scale(jnp.asarray(img), 36, 64)
        assert out.shape == (36, 64, 4)
        # Lanczos ringing can overshoot [0,1] but not wildly
        assert float(out.min()) > -0.3 and float(out.max()) < 1.3

    def test_downscale(self, rng):
        img = random_frame(rng, 32, 48)
        out = lanczos_scale(jnp.asarray(img), 16, 24)
        assert out.shape == (16, 24, 4)

    def test_nonuniform_scale(self, rng):
        img = random_frame(rng, 20, 30)
        out = lanczos_scale(jnp.asarray(img), 50, 33)
        assert out.shape == (50, 33, 4)

    def test_horizontal_gradient_preserved_vertically(self):
        # a pure-horizontal gradient scaled only vertically is unchanged
        w = 32
        col = jnp.linspace(0.1, 0.9, w, dtype=jnp.float32)
        img = jnp.broadcast_to(col[None, :, None], (16, w, 4))
        out = lanczos_scale(img, 32, w)
        np.testing.assert_allclose(
            np.asarray(out[:, :, 0]),
            np.asarray(jnp.broadcast_to(col[None, :], (32, w))),
            atol=2e-6,
        )


class TestMotionSearch:
    def test_constant_pair_tiebreak(self):
        # Faithful shader semantics: every candidate costs 0, strict < keeps
        # the FIRST candidate of the dy-outer/dx-inner scan => (-r, -r),
        # NOT (0,0).  This pins the documented tie-break (motion.comp:49-52).
        prev = jnp.full((12, 12, 4), 0.25, jnp.float32)
        mv = motion_search(prev, prev, block_size=4, search_radius=2)
        np.testing.assert_array_equal(np.asarray(mv[..., 0]), -2.0)
        np.testing.assert_array_equal(np.asarray(mv[..., 1]), -2.0)

    def test_recovers_known_shift(self, rng):
        # curr is prev shifted right+down by (3, 2): block matching must find
        # motion d with curr[q] == prev[q + d], i.e. d = (-3, -2) in the
        # interior (away from edges where clamping perturbs the cost).
        h, w, shift_x, shift_y = 24, 24, 3, 2
        base = random_frame(rng, h + 8, w + 8)
        prev = jnp.asarray(base[4 : 4 + h, 4 : 4 + w])
        curr = jnp.asarray(
            base[4 - shift_y : 4 - shift_y + h, 4 - shift_x : 4 - shift_x + w]
        )
        mv = motion_search(prev, curr, block_size=4, search_radius=4)
        interior = np.asarray(mv[8:-8, 8:-8])
        np.testing.assert_array_equal(interior[..., 0], -float(shift_x))
        np.testing.assert_array_equal(interior[..., 1], -float(shift_y))

    def test_output_bounded_by_radius(self, rng):
        prev = jnp.asarray(random_frame(rng, 16, 16))
        curr = jnp.asarray(random_frame(rng, 16, 16))
        mv = np.asarray(motion_search(prev, curr, block_size=4, search_radius=3))
        assert np.all(np.abs(mv) <= 3.0)


class TestBilinearSample:
    def test_texel_centers_exact(self, rng):
        img = jnp.asarray(random_frame(rng, 8, 8))
        # sampling exactly at texel centers returns the texel
        u = (jnp.arange(8, dtype=jnp.float32)[None, :] + 0.5) / 8.0
        v = (jnp.arange(8, dtype=jnp.float32)[:, None] + 0.5) / 8.0
        out = bilinear_sample(img, jnp.broadcast_to(u, (8, 8)), jnp.broadcast_to(v, (8, 8)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_midpoint_average(self):
        img = jnp.zeros((1, 2, 1), jnp.float32).at[0, 1, 0].set(1.0)
        # halfway between the two texel centers of a 1x2 image: u = 0.5
        out = bilinear_sample(img, jnp.array([[0.5]]), jnp.array([[0.5]]))
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


class TestWarpBlend:
    def test_factor_zero_is_prev(self, rng):
        prev = jnp.asarray(random_frame(rng, 12, 16))
        curr = jnp.asarray(random_frame(rng, 12, 16))
        mv = jnp.zeros((12, 16, 2), jnp.float32)
        out = warp_blend(prev, curr, mv, 0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(prev), atol=1e-6)

    def test_factor_one_is_curr(self, rng):
        prev = jnp.asarray(random_frame(rng, 12, 16))
        curr = jnp.asarray(random_frame(rng, 12, 16))
        mv = jnp.zeros((12, 16, 2), jnp.float32)
        out = warp_blend(prev, curr, mv, 1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(curr), atol=1e-6)

    def test_no_motion_is_crossfade(self, rng):
        prev = jnp.asarray(random_frame(rng, 12, 16))
        curr = jnp.asarray(random_frame(rng, 12, 16))
        out = warp_blend(prev, curr, None, 0.5)
        np.testing.assert_allclose(
            np.asarray(out), 0.5 * (np.asarray(prev) + np.asarray(curr)), atol=1e-6
        )

    def test_oob_returns_transparent_black(self):
        # huge motion pushes every sample off-image: both taps return vec4(0)
        prev = jnp.ones((8, 8, 4), jnp.float32)
        curr = jnp.ones((8, 8, 4), jnp.float32)
        mv = jnp.full((8, 8, 2), 100.0, jnp.float32)
        out = warp_blend(prev, curr, mv, 0.5)
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_perfect_motion_reconstructs(self, rng):
        # curr = prev shifted by (sx, sy).  interpolate.comp's warp offsets
        # (-t for prev, 1-t for curr — interpolate.comp:34-35) are consistent
        # with FORWARD flow m (curr[q] = prev[q - m]); with the true forward
        # flow both warped samples land on the same content.  (Note
        # motion.comp estimates BACKWARD flow — latent reference bug #12,
        # see ops/oracle.py docstring — so the engine negates MVs between
        # motion search and warp.)
        h, w, sx, sy = 16, 16, 4, 2
        base = random_frame(rng, h + 8, w + 8)
        prev = jnp.asarray(base[4 : 4 + h, 4 : 4 + w])
        curr = jnp.asarray(base[4 - sy : 4 - sy + h, 4 - sx : 4 - sx + w])
        mv = jnp.broadcast_to(
            jnp.array([float(sx), float(sy)], jnp.float32), (h, w, 2)
        )
        out = warp_blend(prev, curr, mv, 0.5)
        inner = np.asarray(out[6:-6, 6:-6])
        # prev sampled at p - 0.5*(sx,sy): exact texel since shifts are even
        expected = np.asarray(prev[6 - sy // 2 : -6 - sy // 2,
                                   6 - sx // 2 : -6 - sx // 2])
        np.testing.assert_allclose(inner, expected, atol=1e-5)

    def test_coarse_mv_grid_resampled(self, rng):
        prev = jnp.asarray(random_frame(rng, 16, 16))
        curr = jnp.asarray(random_frame(rng, 16, 16))
        mv_coarse = jnp.zeros((4, 4, 2), jnp.float32)
        out = warp_blend(prev, curr, mv_coarse, 0.5)
        np.testing.assert_allclose(
            np.asarray(out), 0.5 * (np.asarray(prev) + np.asarray(curr)), atol=1e-6
        )


class TestUnorm8:
    def test_roundtrip(self):
        x = jnp.arange(256, dtype=jnp.uint8).reshape(16, 16)
        np.testing.assert_array_equal(
            np.asarray(quantize_unorm8(dequantize_unorm8(x))), np.asarray(x)
        )

    def test_clamps(self):
        x = jnp.array([-0.5, 0.0, 0.5, 1.0, 1.5], jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(quantize_unorm8(x)), [0, 0, 128, 255, 255]
        )

    def test_unit_step(self):
        x = jnp.array([1.0 / 255.0], jnp.float32)
        assert int(quantize_unorm8(x)[0]) == 1
