"""Frame source/sink round-trips."""

import io
import numpy as np
import pytest

from tpufg.io.sinks import (NullSink, PNGDirSink, RawVideoSink, Y4MSink,
                            encode_png, open_sink)
from tpufg.io.sources import (RawVideoSource, SourceError, StdinSource,
                              SyntheticSource, Y4MSource, open_source)


@pytest.fixture
def frames(rng):
    return [rng.integers(0, 256, (24, 32, 4), dtype=np.uint8)
            for _ in range(4)]


class TestRaw:
    def test_roundtrip(self, tmp_path, frames):
        p = str(tmp_path / "v.raw")
        with RawVideoSink(p) as sink:
            for f in frames:
                sink.write(f)
        src = RawVideoSource(p, 32, 24)
        assert src.size == (32, 24)
        out = list(src)
        assert len(out) == 4
        np.testing.assert_array_equal(out[2], frames[2])
        src.close()

    def test_bgra_normalized(self, tmp_path, frames):
        p = str(tmp_path / "v.raw")
        with RawVideoSink(p) as sink:
            sink.write(frames[0][..., [2, 1, 0, 3]])  # write as BGRA
        src = RawVideoSource(p, 32, 24, channel_order="bgra")
        np.testing.assert_array_equal(next(iter(src)), frames[0])

    def test_bad_size_rejected(self, tmp_path):
        p = tmp_path / "bad.raw"
        p.write_bytes(b"\x00" * 1000)
        with pytest.raises(SourceError):
            RawVideoSource(str(p), 32, 24)

    def test_needs_explicit_size(self, tmp_path):
        p = tmp_path / "v.raw"
        p.write_bytes(b"\x00" * (32 * 24 * 4))
        with pytest.raises(SourceError):
            RawVideoSource(str(p), 0, 0)


class TestStdin:
    def test_stream(self, frames):
        buf = io.BytesIO(b"".join(f.tobytes() for f in frames))
        src = StdinSource(32, 24, stream=buf)
        out = list(src)
        assert len(out) == 4
        np.testing.assert_array_equal(out[0], frames[0])


class TestY4M:
    def test_roundtrip_444(self, tmp_path, frames):
        p = str(tmp_path / "v.y4m")
        with Y4MSink(p, 32, 24, fps=30) as sink:
            for f in frames:
                sink.write(f)
        src = Y4MSource(p)
        assert src.size == (32, 24)
        assert src.fps == 30.0
        out = list(src)
        assert len(out) == 4
        # BT.601 limited-range roundtrip loses a little; alpha forced opaque
        err = np.abs(out[1][..., :3].astype(int) - frames[1][..., :3].astype(int))
        assert err.max() <= 4
        assert (out[1][..., 3] == 255).all()
        src.close()


class TestPNG:
    def test_valid_signature_and_dir(self, tmp_path, frames):
        sink = PNGDirSink(str(tmp_path / "pngs"))
        sink.write(frames[0])
        sink.write(frames[1])
        files = sorted((tmp_path / "pngs").iterdir())
        assert len(files) == 2
        data = files[0].read_bytes()
        assert data.startswith(b"\x89PNG\r\n\x1a\n")
        assert b"IHDR" in data and b"IEND" in data

    def test_png_decodable(self, frames):
        # decode with zlib manually: IDAT inflates to h*(1+w*4) bytes
        import struct, zlib
        data = encode_png(frames[0])
        idat_off = data.index(b"IDAT") + 4
        length = struct.unpack(">I", data[data.index(b"IDAT") - 4:
                                          data.index(b"IDAT")])[0]
        raw = zlib.decompress(data[idat_off:idat_off + length])
        assert len(raw) == 24 * (1 + 32 * 4)


class TestSynthetic:
    def test_pan_moves(self):
        src = SyntheticSource(64, 48, n_frames=3, pattern="pan",
                              velocity=(2.0, 1.0))
        f = list(src)
        assert f[0].shape == (48, 64, 4)
        # frame 1 is frame 0 shifted by (-2, -1) in content space
        np.testing.assert_array_equal(f[1][:-1, :-2], f[0][1:, 2:])


class TestSpecResolution:
    def test_synthetic_spec(self):
        src = open_source("synthetic:80x60:noise", frames=5)
        assert src.size == (80, 60)

    def test_bad_synthetic_spec(self):
        with pytest.raises(SourceError):
            open_source("synthetic:banana")

    def test_sink_specs(self, tmp_path):
        assert isinstance(open_sink(None, 8, 8), NullSink)
        assert isinstance(open_sink("null", 8, 8), NullSink)
        assert isinstance(open_sink(str(tmp_path) + "/", 8, 8), PNGDirSink)
