"""Hierarchical pyramid motion search (production path)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpufg.models.pyramid import pyramid_motion_search


def _smooth_pair(rng, h, w, sx, sy, pad=32):
    base = rng.random((h + 2 * pad, w + 2 * pad, 4)).astype(np.float32)
    for k in (1, 2):
        base = (base + np.roll(base, k, 0) + np.roll(base, k, 1)) / 3
    prev = np.transpose(base[pad : pad + h, pad : pad + w], (2, 0, 1))
    curr = np.transpose(
        base[pad - sy : pad - sy + h, pad - sx : pad - sx + w], (2, 0, 1))
    return jnp.asarray(prev.copy()), jnp.asarray(curr.copy())


def test_recovers_large_shift(rng):
    # |shift| > refine radius at full res: only the coarse level can see it
    prev, curr = _smooth_pair(rng, 128, 128, 9, -5)
    mv = np.asarray(pyramid_motion_search(prev, curr, levels=3,
                                          base_radius=4, refine_radius=2))
    inner = mv[:, 2:-2, 2:-2]
    assert np.median(inner[0]) == -9.0
    assert np.median(inner[1]) == 5.0
    assert ((inner[0] == -9.0) & (inner[1] == -5.0 * -1)).mean() > 0.9


def test_zero_motion(rng):
    prev, curr = _smooth_pair(rng, 64, 128, 0, 0)
    mv = np.asarray(pyramid_motion_search(prev, curr, levels=2,
                                          base_radius=2, refine_radius=1))
    assert np.abs(mv).max() <= 1.0
    assert np.median(np.abs(mv)) == 0.0


def test_rejects_bad_divisibility(rng):
    prev, curr = _smooth_pair(rng, 120, 128, 0, 0)  # 120 % 64 != 0
    with pytest.raises(ValueError):
        pyramid_motion_search(prev, curr, levels=3)


def test_grid_shape(rng):
    prev, curr = _smooth_pair(rng, 128, 192, 2, 1)
    mv = pyramid_motion_search(prev, curr, levels=2, grid=16)
    assert mv.shape == (2, 8, 12)


def test_seeded_overreach_fails_descriptively(rng):
    """Any seeded config whose refine warp would exceed the warp kernel's
    halo window gets the descriptive per-level error — including the
    levels=2, skip=0 case that used to escape the old levels>=3 guard and
    die inside warp_blend_matmul with a kernel-internal message."""
    prev, curr = _smooth_pair(rng, 64, 128, 0, 0)
    seed = jnp.zeros((2, 4, 8), jnp.float32)
    with pytest.raises(ValueError, match="skip_finest_refine"):
        pyramid_motion_search(prev, curr, levels=2, base_radius=4,
                              refine_radius=2, grid=16,
                              skip_finest_refine=0, seed=seed)
    # seeded with the refine skipped stays valid
    mv = pyramid_motion_search(prev, curr, levels=2, base_radius=4,
                               refine_radius=2, grid=16,
                               skip_finest_refine=1, seed=seed)
    assert mv.shape == (2, 4, 8)
