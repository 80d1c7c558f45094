"""Frame source/sink round-trips."""

import io
import os

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


class TestNativeIngest:
    """open_source uses the C prefetch ring for raw files when available."""

    def _write(self, tmp_path, frames):
        p = str(tmp_path / "v.raw")
        with RawVideoSink(p) as sink:
            for f in frames:
                sink.write(f)
        return p

    def test_open_source_prefers_native(self, tmp_path, frames):
        from tpufg.io import native
        p = self._write(tmp_path, frames)
        src = open_source(p, 32, 24)
        if native.available():
            from tpufg.io.sources import NativeRawSource
            assert isinstance(src, NativeRawSource)
            assert src.zero_copy
        # frames bitwise-equal to the memmap source either way
        got = [np.array(f) for f in src]  # copy out of recycled slots
        src.close()
        ref = list(RawVideoSource(p, 32, 24))
        assert len(got) == len(ref)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(g, r)

    def test_native_bgra_matches_python(self, tmp_path, frames):
        from tpufg.io import native
        if not native.available():
            pytest.skip("no native lib")
        p = self._write(tmp_path, [f[..., [2, 1, 0, 3]] for f in frames])
        src = open_source(p, 32, 24, channel_order="bgra")
        got = [np.array(f) for f in src]
        src.close()
        for g, r in zip(got, frames):
            np.testing.assert_array_equal(g, r)

    def test_fallback_without_native(self, tmp_path, frames, monkeypatch):
        from tpufg.io import native
        p = self._write(tmp_path, frames)
        monkeypatch.setattr(native, "available", lambda: False)
        src = open_source(p, 32, 24)
        assert isinstance(src, RawVideoSource)
        np.testing.assert_array_equal(next(iter(src)), frames[0])

    def test_bad_size_rejected_native(self, tmp_path):
        p = tmp_path / "bad.raw"
        p.write_bytes(b"\x00" * 1000)
        with pytest.raises(SourceError):
            open_source(str(p), 32, 24)

    def test_cli_raw_ingest(self, tmp_path, frames):
        """End-to-end: raw file in -> engine -> raw file out, through
        whatever ingest path open_source resolves (native ring when the
        toolchain is present)."""
        from tpufg.cli import main
        p = self._write(tmp_path, frames)
        out = str(tmp_path / "out.raw")
        rc = main([p, "--input-width", "32", "--input-height", "24",
                   "--output-width", "64", "--no-pacing", "--output", out])
        assert rc == 0
        data = np.fromfile(out, np.uint8)
        # 4 in -> 1 + 3*2 = 7 out frames at 64x48
        assert data.size == 7 * 48 * 64 * 4


class _ChunkedReader:
    """Stream that returns short reads (like a real pipe under load)."""

    def __init__(self, data: bytes, chunk: int):
        self._buf = io.BytesIO(data)
        self._chunk = chunk

    def read(self, n: int) -> bytes:
        return self._buf.read(min(n, self._chunk))


class TestStdin:
    def test_stream(self, frames):
        buf = io.BytesIO(b"".join(f.tobytes() for f in frames))
        src = StdinSource(32, 24, stream=buf)
        out = list(src)
        assert len(out) == 4
        np.testing.assert_array_equal(out[0], frames[0])

    def test_short_reads_accumulate(self, frames):
        # a pipe returning 1000-byte chunks must still yield whole frames
        # (short reads are not EOF — io.RawIOBase semantics)
        data = b"".join(f.tobytes() for f in frames)
        src = StdinSource(32, 24, stream=_ChunkedReader(data, 1000))
        out = list(src)
        assert len(out) == 4
        for got, ref in zip(out, frames):
            np.testing.assert_array_equal(got, ref)

    def test_trailing_partial_frame_dropped(self, frames):
        data = b"".join(f.tobytes() for f in frames) + b"\x01" * 100
        src = StdinSource(32, 24, stream=_ChunkedReader(data, 777))
        out = list(src)
        assert len(out) == 4  # partial tail dropped (with a warning)


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

    def test_roundtrip_420(self, tmp_path, rng):
        # smooth content: chroma subsampling error stays small
        base = rng.integers(60, 196, (1, 1, 4), dtype=np.uint8)
        smooth = np.tile(base, (24, 32, 1))
        p = str(tmp_path / "v420.y4m")
        with Y4MSink(p, 32, 24, fps=30, chroma="420") as sink:
            sink.write(smooth)
        sz_420 = __import__("os").path.getsize(p)
        with Y4MSink(str(tmp_path / "v444.y4m"), 32, 24, fps=30) as sink:
            sink.write(smooth)
        sz_444 = __import__("os").path.getsize(str(tmp_path / "v444.y4m"))
        assert sz_420 < 0.6 * sz_444  # half the chroma payload
        src = Y4MSource(p)
        out = list(src)
        src.close()
        assert len(out) == 1
        err = np.abs(out[0][..., :3].astype(int) - smooth[..., :3].astype(int))
        assert err.max() <= 4

    def test_stream_input_with_sniffed_header(self, tmp_path, frames):
        """Y4MSource reads from a binary stream (piped ffmpeg output),
        including bytes a sniffer already consumed."""
        import io as _io

        p = str(tmp_path / "v.y4m")
        with Y4MSink(p, 32, 24, fps=30) as sink:
            for f in frames:
                sink.write(f)
        raw = open(p, "rb").read()
        stream = _io.BytesIO(raw[9:])  # sniffer took the signature
        src = Y4MSource(stream, header_prefix=raw[:9])
        assert src.size == (32, 24)
        out = list(src)
        assert len(out) == 4
        src.close()
        assert not stream.closed  # non-owned streams stay open

    def test_open_source_sniffs_y4m_on_stdin(self, tmp_path, frames,
                                             monkeypatch):
        """`tpufg -` with no explicit size auto-detects a piped y4m."""
        import io as _io
        import sys as _sys
        import types

        p = str(tmp_path / "v.y4m")
        with Y4MSink(p, 32, 24, fps=30) as sink:
            for f in frames:
                sink.write(f)
        raw = open(p, "rb").read()
        monkeypatch.setattr(
            _sys, "stdin", types.SimpleNamespace(buffer=_io.BytesIO(raw)))
        src = open_source("-")
        assert src.size == (32, 24)
        assert len(list(src)) == 4

    def test_open_source_raw_stdin_needs_size(self, monkeypatch):
        import io as _io
        import sys as _sys
        import types

        monkeypatch.setattr(
            _sys, "stdin",
            types.SimpleNamespace(buffer=_io.BytesIO(b"\x00" * 64)))
        with pytest.raises(SourceError):
            open_source("-")

    def test_stdout_spec_resolves_to_y4m(self):
        """--output - must stream self-describing y4m (for | mpv -), not
        headerless raw bytes."""
        from tpufg.io.sinks import open_sink
        sink = open_sink("-", 32, 24, fps=30)
        assert isinstance(sink, Y4MSink)

    def test_short_read_stream_accumulates(self, tmp_path, frames):
        """A raw pipe returning short reads mid-stream must not drop
        frames (same contract as StdinSource)."""
        import io as _io

        p = str(tmp_path / "v.y4m")
        with Y4MSink(p, 32, 24, fps=30) as sink:
            for f in frames:
                sink.write(f)
        raw = open(p, "rb").read()

        class Dribble(_io.RawIOBase):
            def __init__(self, data):
                self._d = data
                self._i = 0

            def readable(self):
                return True

            def read(self, n=-1):
                if self._i >= len(self._d):
                    return b""
                n = 37 if n is None or n < 0 else min(n, 37)
                chunk = self._d[self._i:self._i + n]
                self._i += len(chunk)
                return chunk

            def readline(self):
                if self._i >= len(self._d):
                    return b""
                j = self._d.find(b"\n", self._i)
                j = len(self._d) if j < 0 else j + 1
                chunk = self._d[self._i:j]
                self._i = j
                return chunk

        src = Y4MSource(Dribble(raw[9:]), header_prefix=raw[:9])
        assert len(list(src)) == 4

    def test_420_odd_size_falls_back_to_444(self, tmp_path, frames):
        p = str(tmp_path / "odd.y4m")
        with Y4MSink(p, 31, 24, fps=30, chroma="420") as sink:
            sink.write(frames[0][:, :31])
        header = open(p, "rb").readline()
        assert b"C444" in header

    def test_cli_fps_metadata_propagates(self, tmp_path, frames):
        """y4m F tag feeds target_fps when --target-fps is not given; the
        output container advertises fps * multiplier."""
        from tpufg.cli import main
        src_p = str(tmp_path / "in.y4m")
        with Y4MSink(src_p, 32, 24, fps=25) as sink:
            for f in frames:
                sink.write(f)
        out_p = str(tmp_path / "out.y4m")
        rc = main([src_p, "--output-width", "64", "--no-pacing",
                   "--output", out_p, "--y4m-chroma", "420"])
        assert rc == 0
        header = open(out_p, "rb").readline().decode()
        assert "F50000:1000" in header    # 25 fps in -> 50 fps doubled out
        assert "C420jpeg" in header


class TestFollow:
    """Live ingest: tail a growing file while a producer writes it."""

    def _produce(self, path, frames, delay=0.005, mark_end=True,
                 chunked=False):
        """Serialize frames to y4m, then (optionally in ragged chunks,
        with pauses) copy the bytes into ``path`` from a writer thread."""
        import threading
        import time

        part = path + ".part"
        with Y4MSink(part, 32, 24, fps=30) as sink:
            for f in frames:
                sink.write(f)
        with open(part, "rb") as f:
            data = f.read()
        os.remove(part)

        def writer():
            with open(path, "wb") as out:
                step = 997 if chunked else len(data)
                for off in range(0, len(data), step):
                    out.write(data[off:off + step])
                    out.flush()
                    if chunked:
                        time.sleep(delay)
            if mark_end:
                with open(path + ".end", "w"):
                    pass

        t = threading.Thread(target=writer, daemon=True)
        t.start()
        return t

    def test_follow_y4m_growing(self, tmp_path, frames):
        p = str(tmp_path / "live.y4m")
        t = self._produce(p, frames, chunked=True)
        src = open_source(f"follow:{p}:10")
        out = list(src)
        t.join()
        assert len(out) == len(frames)
        err = np.abs(out[0][..., :3].astype(int)
                     - frames[0][..., :3].astype(int))
        assert err.max() <= 4

    def test_follow_idle_timeout_ends_stream(self, tmp_path, frames):
        p = str(tmp_path / "idle.y4m")
        t = self._produce(p, frames[:2], mark_end=False)
        t.join()
        import time
        start = time.monotonic()
        src = open_source(f"follow:{p}:0.3")
        out = list(src)
        assert len(out) == 2
        assert time.monotonic() - start < 5.0  # ended by idle, promptly

    def test_follow_missing_file_times_out(self, tmp_path):
        with pytest.raises(SourceError, match="did not appear"):
            open_source(f"follow:{tmp_path}/nope.y4m:0.2")

    def test_follow_raw_needs_sizes(self, tmp_path):
        p = str(tmp_path / "x.raw")
        open(p, "wb").close()
        with pytest.raises(SourceError, match="width"):
            open_source(f"follow:{p}:0.2")


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


class TestDeferredHeaderAndAsync:
    def test_y4m_header_deferred_to_first_write(self, tmp_path, rng):
        """Opening the sink must not emit the stream header: a consumer
        piped to stdout must not receive a y4m header for a stream that
        dies before its first frame (engine/model startup failures)."""
        p = str(tmp_path / "v.y4m")
        sink = Y4MSink(p, 32, 24, fps=30)
        assert os.path.getsize(p) == 0
        sink.write(rng.integers(0, 256, (24, 32, 4), dtype=np.uint8))
        sink.close()
        data = open(p, "rb").read()
        assert data.startswith(b"YUV4MPEG2 W32 H24 ")

    def test_y4m_empty_stream_has_no_header(self, tmp_path):
        p = str(tmp_path / "v.y4m")
        with Y4MSink(p, 32, 24, fps=30):
            pass
        assert os.path.getsize(p) == 0

    def test_async_sink_preserves_order(self, rng):
        from tpufg.io.sinks import AsyncSink, FrameSink

        got = []

        class Rec(FrameSink):
            def write(self, frame):
                got.append(int(frame[0, 0, 0]))

        frames = [np.full((4, 4, 4), i, np.uint8) for i in range(32)]
        with AsyncSink(Rec(), depth=3) as sink:
            for f in frames:
                sink.write(f)
        assert got == list(range(32))

    def test_async_sink_propagates_worker_error(self):
        from tpufg.io.sinks import AsyncSink, FrameSink

        class Boom(FrameSink):
            def write(self, frame):
                raise OSError("disk full")

        sink = AsyncSink(Boom(), depth=2)
        with pytest.raises(OSError, match="disk full"):
            for _ in range(16):
                sink.write(np.zeros((2, 2, 4), np.uint8))
                import time
                time.sleep(0.01)
            sink.close()


class TestAsyncSinkPermanentFailure:
    def test_async_sink_stays_failed_after_worker_error(self):
        """After the first worker error the sink is permanently failed:
        every subsequent write() re-raises and the inner sink receives
        no further frames (a caller that catches the error cannot resume
        the stream with silently missing frames)."""
        import time
        from tpufg.io.sinks import AsyncSink, FrameSink

        wrote = []

        class BoomOnce(FrameSink):
            def write(self, frame):
                if len(wrote) >= 2:
                    raise OSError("disk full")
                wrote.append(frame)

        sink = AsyncSink(BoomOnce(), depth=1)
        raised = 0
        for _ in range(12):
            try:
                sink.write(np.zeros((2, 2, 4), np.uint8))
            except OSError:
                raised += 1
            time.sleep(0.01)
        assert raised >= 2  # every post-failure write raises, not just one
        assert len(wrote) == 2  # nothing written after the failure
        with pytest.raises(OSError, match="disk full"):
            sink.close()


class TestVideoFile:
    """OpenCV-decoded video sources and encoded sinks (soft dependency:
    present in this image; skipped cleanly when absent)."""

    @staticmethod
    def _frames(rng, n=6, h=48, w=64):
        # genuinely smooth content (low-frequency sinusoids): DCT codecs
        # keep this near-lossless, so the roundtrip tolerance stays tight
        del rng
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        fs = []
        for i in range(n):
            f = np.empty((h, w, 4), np.uint8)
            f[..., 0] = (110 + 90 * np.sin((xs + 3 * i) / 17)).astype(np.uint8)
            f[..., 1] = (120 + 80 * np.cos((ys + 2 * i) / 23)).astype(np.uint8)
            f[..., 2] = (128 + 60 * np.sin((xs + ys + 4 * i) / 31)
                         ).astype(np.uint8)
            f[..., 3] = 255
            fs.append(f)
        return fs

    def test_sink_source_roundtrip(self, tmp_path, rng):
        pytest.importorskip("cv2")
        from tpufg.io.sinks import VideoFileSink
        from tpufg.io.sources import VideoFileSource

        path = str(tmp_path / "clip.mp4")
        frames = self._frames(rng)
        with VideoFileSink(path, 64, 48, fps=24.0) as sink:
            for f in frames:
                sink.write(f)
        src = VideoFileSource(path)
        assert src.size == (64, 48)
        assert abs(src.fps - 24.0) < 0.5
        assert src.const_alpha is True
        got = list(src)
        src.close()
        assert len(got) == len(frames)
        for g, f in zip(got, frames):
            assert g.shape == f.shape and g.dtype == np.uint8
            assert (g[..., 3] == 255).all()
            # mp4v is lossy: content should match to codec noise
            d = np.abs(g[..., :3].astype(np.float32)
                       - f[..., :3].astype(np.float32)).mean()
            assert d < 12.0, d

    def test_spec_resolution(self, tmp_path, rng):
        pytest.importorskip("cv2")
        from tpufg.io.sinks import VideoFileSink
        from tpufg.io.sources import VideoFileSource

        path = str(tmp_path / "clip.avi")
        with VideoFileSink(path, 64, 48, fps=30.0) as sink:
            for f in self._frames(rng, n=3):
                sink.write(f)
        src = open_source(path)
        assert isinstance(src, VideoFileSource)
        src.close()
        src = open_source("video:" + path)
        assert isinstance(src, VideoFileSource)
        src.close()
        assert isinstance(open_sink(str(tmp_path / "o.mp4"), 64, 48),
                          VideoFileSink)

    def test_missing_file_is_source_error(self):
        pytest.importorskip("cv2")
        with pytest.raises(SourceError):
            open_source(str("/nonexistent/clip.mp4"))

    def test_bad_sink_extension(self, tmp_path):
        pytest.importorskip("cv2")
        from tpufg.io.sinks import VideoFileSink
        with pytest.raises(ValueError):
            VideoFileSink(str(tmp_path / "clip.webm"), 64, 48)
