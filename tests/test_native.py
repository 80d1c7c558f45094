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


def test_egress_yuv444_matches_python_bytes(rng):
    """Sink egress contract: the native converter and the numpy fallback
    compute the SAME 16.16 fixed-point BT.601 math — byte-identical."""
    from tpufg.io.sinks import _rgb_to_bt601
    rgba = rng.integers(0, 256, (23, 37, 4), dtype=np.uint8)
    ny, nu, nv = native.rgba_to_yuv444(rgba)
    py, pu, pv = _rgb_to_bt601(rgba[..., :3])
    np.testing.assert_array_equal(ny, py)
    np.testing.assert_array_equal(nu, pu)
    np.testing.assert_array_equal(nv, pv)


def test_down2x2_matches_python_bytes(rng):
    from tpufg.io.sinks import _down2x2
    plane = rng.integers(0, 256, (24, 36), dtype=np.uint8)
    np.testing.assert_array_equal(native.down2x2(plane), _down2x2(plane))


def test_y4m_sink_native_vs_fallback_bytes(tmp_path, rng, monkeypatch):
    """A y4m file written through the native egress is byte-identical to
    one written through the pure-python fallback (both chroma modes)."""
    from tpufg.io import sinks

    frames = [rng.integers(0, 256, (24, 32, 4), dtype=np.uint8)
              for _ in range(3)]
    for chroma in ("444", "420"):
        paths = []
        for tag, disable in (("nat", False), ("py", True)):
            p = str(tmp_path / f"{tag}_{chroma}.y4m")
            if disable:
                monkeypatch.setattr(native, "rgba_to_yuv444",
                                    lambda *_: None)
                monkeypatch.setattr(native, "down2x2", lambda *_: None)
            else:
                monkeypatch.undo()
            with sinks.Y4MSink(p, 32, 24, fps=30, chroma=chroma) as sink:
                for f in frames:
                    sink.write(f)
            paths.append(p)
        a, b = (open(p, "rb").read() for p in paths)
        assert a == b and len(a) > 0
