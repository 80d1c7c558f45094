"""Pallas motion-search kernel vs f32 oracle (CPU interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import random_frame
from tpufg.kernels.motion import motion_search_sites, motion_search_tiled
from tpufg.ops import motion_search


def _pair(rng, h, w, sx, sy, pad=8):
    base = random_frame(rng, h + 2 * pad, w + 2 * pad)
    prev = base[pad : pad + h, pad : pad + w]
    curr = base[pad - sy : pad - sy + h, pad - sx : pad - sx + w]
    return jnp.asarray(prev), jnp.asarray(curr)


def _chw(x):
    return jnp.transpose(x, (2, 0, 1))


class TestExactParity:
    @pytest.mark.parametrize("hw,shift,b,r", [
        ((24, 40), (3, 2), 4, 4),
        ((16, 16), (0, 0), 4, 2),
        ((40, 24), (-2, 3), 8, 4),   # taller than wide, b=8
        ((24, 150), (1, -1), 4, 2),  # crosses the 128-lane tile boundary
    ])
    def test_bitwise_equal_to_oracle(self, rng, hw, shift, b, r):
        prev, curr = _pair(rng, *hw, *shift)
        ref = _chw(motion_search(prev, curr, block_size=b, search_radius=r))
        out = motion_search_tiled(_chw(prev), _chw(curr),
                                  block_size=b, search_radius=r)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_constant_pair_tiebreak(self):
        # all-candidate tie: strict < keeps the first (-r,-r) — motion.comp:49
        const = jnp.full((4, 16, 16), 0.3, jnp.float32)
        mv = motion_search_tiled(const, const, block_size=4, search_radius=2)
        np.testing.assert_array_equal(np.unique(np.asarray(mv)), [-2.0])


class TestSeparableBox:
    def test_agrees_on_clean_shift(self, rng):
        prev, curr = _pair(rng, 24, 40, 3, 2)
        ref = _chw(motion_search(prev, curr, block_size=4, search_radius=4))
        out = motion_search_tiled(_chw(prev), _chw(curr), block_size=4,
                                  search_radius=4, exact_box=False)
        # separable box-sum reorders f32 adds; on random content with a
        # unique zero-cost optimum the argmin is identical
        assert (np.asarray(out) == np.asarray(ref)).mean() > 0.99


class TestBounds:
    def test_output_bounded_by_radius(self, rng):
        prev = _chw(jnp.asarray(random_frame(rng, 16, 16)))
        curr = _chw(jnp.asarray(random_frame(rng, 16, 16)))
        mv = np.asarray(motion_search_tiled(prev, curr, block_size=4,
                                            search_radius=3))
        assert np.all(np.abs(mv) <= 3.0)
        assert mv.shape == (2, 16, 16)


class TestSitesKernel:
    """Site-row exhaustive kernel: bitwise the per-pixel field's rows."""

    @pytest.mark.parametrize("hw,r", [((64, 256), 4), ((96, 384), 8)])
    def test_bitwise_vs_tiled_subsampled(self, rng, hw, r):
        h, w = hw
        prev = jnp.asarray(rng.random((4, h, w)).astype(np.float32))
        curr = jnp.asarray(np.roll(np.asarray(prev), (3, -2), (1, 2)))
        full = motion_search_tiled(prev, curr, block_size=8,
                                   search_radius=r, exact_box=False)
        sites = motion_search_sites(prev, curr, block_size=8,
                                    search_radius=r, dx_chunk=1)
        np.testing.assert_array_equal(np.asarray(sites),
                                      np.asarray(full)[:, 8::16, :])

    def test_dx_chunk_invariant(self, rng):
        prev = jnp.asarray(rng.random((4, 64, 256)).astype(np.float32))
        curr = jnp.asarray(np.roll(np.asarray(prev), 2, 2))
        a = motion_search_sites(prev, curr, search_radius=4, dx_chunk=1)
        b = motion_search_sites(prev, curr, search_radius=4, dx_chunk=3)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_unsupported_params_rejected(self):
        z = jnp.zeros((4, 64, 256), jnp.float32)
        with pytest.raises(ValueError, match="block_size=8"):
            motion_search_sites(z, z, block_size=4)
        with pytest.raises(ValueError, match="divisible by grid"):
            motion_search_sites(jnp.zeros((4, 72, 256), jnp.float32),
                                jnp.zeros((4, 72, 256), jnp.float32))
