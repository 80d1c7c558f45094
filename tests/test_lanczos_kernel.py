"""Pallas Lanczos kernel vs f32 oracle (CPU interpret mode).

Covers SURVEY.md §4's kernel-parity matrix: sizes including non-multiples of
tile size, identity, up/down/non-uniform scaling, and the bf16 SSIM contract.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import random_frame
from tpufg.kernels.lanczos import lanczos_scale_fast
from tpufg.ops import lanczos_scale
from tpufg.utils.quality import ssim


def _oracle_chw(img_chw, out_h, out_w):
    hwc = jnp.transpose(img_chw, (1, 2, 0))
    return jnp.transpose(lanczos_scale(hwc, out_h, out_w), (2, 0, 1))


def _rand_chw(rng, c, h, w):
    return jnp.asarray(
        rng.integers(0, 256, size=(c, h, w)).astype(np.float32) / 255.0
    )


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((24, 40), (48, 80)),      # clean 2x
        ((24, 40), (24, 40)),      # identity
        ((37, 53), (19, 27)),      # odd downscale
        ((30, 50), (75, 33)),      # non-uniform (up y, down x)
        ((16, 16), (300, 300)),    # large ratio, crosses tile boundary
        ((130, 258), (260, 516)),  # > one tile in both axes
    ],
)
def test_matches_oracle_f32(rng, in_hw, out_hw):
    img = _rand_chw(rng, 4, *in_hw)
    ref = _oracle_chw(img, *out_hw)
    out = lanczos_scale_fast(img, *out_hw)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_bf16_ssim_contract(rng):
    img = _rand_chw(rng, 4, 72, 96)
    ref = np.asarray(_oracle_chw(img, 144, 192))
    out = np.asarray(
        lanczos_scale_fast(img.astype(jnp.bfloat16), 144, 192).astype(jnp.float32)
    )
    s = ssim(np.transpose(ref, (1, 2, 0)), np.transpose(out, (1, 2, 0)))
    assert s >= 0.999, f"bf16 SSIM {s} below contract"


def test_three_channel(rng):
    img = _rand_chw(rng, 3, 20, 36)
    ref = _oracle_chw(img, 40, 72)
    out = lanczos_scale_fast(img, 40, 72)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_constant_preserved(rng):
    img = jnp.full((4, 33, 47), 0.5, jnp.float32)
    out = lanczos_scale_fast(img, 66, 94)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)


class TestPackedScale:
    """lanczos_scale_packed: fused scale + UNORM8 quantize + channel pack
    must emit the same bytes as planar_to_frames(lanczos_scale_fast(...))."""

    @pytest.mark.parametrize("in_hw,out_hw", [
        ((64, 96), (128, 192)),     # clean 2x
        ((50, 70), (173, 241)),     # ugly ratio, padded tiles + crop
        ((128, 128), (96, 96)),     # downscale
    ])
    def test_matches_fast_plus_convert(self, rng, in_hw, out_hw):
        from tpufg.kernels.convert import planar_to_frames
        from tpufg.kernels.lanczos import lanczos_scale_packed

        img = _rand_chw(rng, 4, *in_hw)
        for cd in (jnp.float32, jnp.bfloat16):
            ref = np.asarray(planar_to_frames(
                lanczos_scale_fast(img, *out_hw, compute_dtype=cd)))
            got = np.asarray(lanczos_scale_packed(img, *out_hw,
                                                  compute_dtype=cd))
            assert got.shape == (*out_hw, 4)
            # identical math per channel; the only permitted divergence is
            # 1-ulp accumulation from a different tile plan
            d = np.abs(got.astype(int) - ref.astype(int))
            assert d.max() <= 1
            assert (d > 0).mean() < 1e-5

    def test_needs_four_channels(self, rng):
        from tpufg.kernels.lanczos import lanczos_scale_packed
        with pytest.raises(ValueError):
            lanczos_scale_packed(_rand_chw(rng, 3, 16, 16), 32, 32)
