"""Live HTTP preview — the headless analog of the reference's SDL window
(src/scaler.cpp:404-418, 538-609): latest-frame publishing, long-polling,
stats, the TeeSink fan-out, and the CLI flag end-to-end."""

import json
import struct
import threading
import time
import urllib.error
import urllib.request
import zlib

import numpy as np
import pytest

from tpufg.io.preview import PreviewSink, TeeSink, parse_preview_spec
from tpufg.io.sinks import NullSink


def _get(url, timeout=10.0):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, dict(r.headers), r.read()


def _png_size(body):
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", body[16:24])
    return w, h


def _frame(i, h=24, w=32):
    f = np.zeros((h, w, 4), np.uint8)
    f[..., 0] = i
    f[..., 3] = 255
    return f


class TestParseSpec:
    def test_port_only_defaults_loopback(self):
        assert parse_preview_spec("8000") == ("127.0.0.1", 8000)

    def test_host_port(self):
        assert parse_preview_spec("0.0.0.0:81") == ("0.0.0.0", 81)

    @pytest.mark.parametrize("bad", ["", "eight", "1.2.3.4", "x:y:1"])
    def test_bad_specs(self, bad):
        with pytest.raises(ValueError):
            parse_preview_spec(bad)


class TestPreviewSink:
    def test_serves_latest_frame_and_stats(self):
        with PreviewSink(0) as sink:
            base = sink.url
            # before any frame: empty stats, long-poll misses (204)
            st = json.loads(_get(base + "stats.json")[2])
            assert st == {"frames": 0, "width": 0, "height": 0, "fps": 0.0}

            sink.write(_frame(7))
            sink.write(_frame(9))
            status, headers, body = _get(base + "frame.png")
            assert status == 200
            assert headers["X-Frame-Index"] == "1"
            assert _png_size(body) == (32, 24)
            # decode the scanlines back: the latest frame, not the first
            raw = zlib.decompress(body[41:-16])  # strip IDAT crc + IEND
            assert raw[1] == 9  # first pixel's R channel (after filter byte)

            st = json.loads(_get(base + "stats.json")[2])
            assert st["frames"] == 2 and (st["width"], st["height"]) == (32, 24)

    def test_long_poll_wakes_on_write(self):
        with PreviewSink(0) as sink:
            sink.write(_frame(1))
            got = {}

            def poll():
                got["r"] = _get(sink.url + "frame.png?after=0")

            t = threading.Thread(target=poll)
            t.start()
            time.sleep(0.2)          # poller is parked on the condition
            sink.write(_frame(2))
            t.join(timeout=5)
            assert not t.is_alive()
            status, headers, _ = got["r"]
            assert status == 200 and headers["X-Frame-Index"] == "1"

    def test_down_decimates(self):
        with PreviewSink(0) as sink:
            sink.write(_frame(3, h=24, w=32))
            _, _, body = _get(sink.url + "frame.png?down=2")
            assert _png_size(body) == (16, 12)

    def test_unknown_path_404(self):
        with PreviewSink(0) as sink:
            sink.write(_frame(0))
            with pytest.raises(urllib.error.HTTPError) as e:
                _get(sink.url + "nope")
            assert e.value.code == 404


class TestTeeSink:
    def test_fans_out_and_forces_rgba_wire(self):
        a, b = NullSink(), NullSink()
        tee = TeeSink(a, b)
        assert tee.wire_format == "rgba"
        assert tee.needs_host is False  # both children decline host frames
        tee.write(_frame(0))
        assert a.count == 1 and b.count == 1

    def test_needs_host_if_any_child_does(self):
        with PreviewSink(0) as p:
            tee = TeeSink(NullSink(), p)
            assert tee.needs_host is True


class TestCliPreview:
    def test_end_to_end_run_serves_frames(self, tmp_path, monkeypatch):
        # grab the ephemeral port from the constructed sink
        import tpufg.io.preview as pv
        made = {}
        orig = pv.PreviewSink

        def capture(port, host="127.0.0.1"):
            made["sink"] = orig(port, host)
            return made["sink"]

        monkeypatch.setattr(pv, "PreviewSink", capture)
        from tpufg.cli import main
        rc = main(["synthetic:32x32", "--frames", "3", "--no-pacing",
                   "--motion-mode", "none", "--output", "null",
                   "--dtype", "f32", "--preview", "127.0.0.1:0"])
        assert rc == 0
        sink = made["sink"]
        # the server outlives run_stream only until close(); main() closed
        # it — but the written state remains inspectable
        assert sink._index + 1 == 5  # 1 + 2*2 crossfade outputs

    def test_bad_spec_exits_one(self):
        from tpufg.cli import main
        rc = main(["synthetic:16x16", "--frames", "2", "--no-pacing",
                   "--output", "null", "--preview", "not-a-port"])
        assert rc == 1
