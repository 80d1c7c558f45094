"""Native C++ ingest library (built on demand; skipped without g++)."""

import numpy as np
import pytest

from tpufg.io import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_bgra_swizzle_matches_numpy(rng):
    src = rng.integers(0, 256, (17, 33, 4), dtype=np.uint8)
    out = native.bgra_to_rgba(src)
    np.testing.assert_array_equal(out, src[..., [2, 1, 0, 3]])


def test_yuv444_roundtrip(rng):
    rgba = rng.integers(0, 256, (16, 24, 4), dtype=np.uint8)
    y, u, v = native.rgba_to_yuv444(rgba)
    back = native.yuv_to_rgba(y, u, v)
    err = np.abs(back[..., :3].astype(int) - rgba[..., :3].astype(int))
    assert err.max() <= 4  # limited-range quantization
    assert (back[..., 3] == 255).all()


def test_yuv_matches_python_reference(rng):
    from tpufg.io.sources import _bt601_to_rgb
    y = rng.integers(16, 236, (8, 12), dtype=np.uint8)
    u = rng.integers(16, 240, (8, 12), dtype=np.uint8)
    v = rng.integers(16, 240, (8, 12), dtype=np.uint8)
    nat = native.yuv_to_rgba(y, u, v)[..., :3].astype(int)
    ref = _bt601_to_rgb(y, u, v).astype(np.uint8).astype(int)
    assert np.abs(nat - ref).max() <= 1  # fixed-point vs float rounding


def test_prefetch_ring(tmp_path, rng):
    frames = [rng.integers(0, 256, (8, 16, 4), dtype=np.uint8)
              for _ in range(7)]
    p = tmp_path / "v.raw"
    p.write_bytes(b"".join(f.tobytes() for f in frames))
    ring = native.NativeRawRing(str(p), 16, 8, n_slots=3)
    assert len(ring) == 7
    got = [f.copy() for f in ring]
    ring.close()
    assert len(got) == 7
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)


def test_prefetch_ring_bgra(tmp_path, rng):
    frame = rng.integers(0, 256, (8, 16, 4), dtype=np.uint8)
    p = tmp_path / "v.raw"
    p.write_bytes(frame.tobytes())
    ring = native.NativeRawRing(str(p), 16, 8, src_is_bgra=True)
    got = next(iter(ring)).copy()
    ring.close()
    np.testing.assert_array_equal(got, frame[..., [2, 1, 0, 3]])


def test_clock_paces():
    import time
    clk = native.NativeClock(200.0)  # 5 ms period
    t0 = time.perf_counter()
    for _ in range(10):
        clk.pace()
    dt = time.perf_counter() - t0
    clk.close()
    assert 0.04 <= dt <= 0.3
