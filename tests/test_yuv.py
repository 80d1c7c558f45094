"""Device-side y4m egress conversion (kernels/yuv.py).

Contract: the payload bytes leaving the device are IDENTICAL to the host
egress path (io/sinks.py numpy mirrors of native/fgio.cpp), so the sink is
bitwise independent of which leg converted each frame.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpufg.kernels.yuv import (payload_shape, rgba_to_y4m_payload,
                               y4m_wire_ok)
from tpufg.io.sinks import _down2x2, _rgb_to_bt601


def _host_payload(frame: np.ndarray, chroma: str) -> bytes:
    y, u, v = _rgb_to_bt601(frame[..., :3])
    if chroma == "420":
        u, v = _down2x2(u), _down2x2(v)
    return y.tobytes() + u.tobytes() + v.tobytes()


class TestPayloadBytes:
    @pytest.mark.parametrize("chroma", ["420", "444"])
    @pytest.mark.parametrize("hw", [(24, 32), (64, 128), (36, 52)])
    def test_matches_host_path_bytes(self, rng, chroma, hw):
        h, w = hw
        frame = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        dev = np.asarray(rgba_to_y4m_payload(jnp.asarray(frame), chroma))
        assert dev.shape == payload_shape(h, w, chroma)
        assert dev.tobytes() == _host_payload(frame, chroma)

    def test_i32_wire_input_same_bytes(self, rng):
        frame = rng.integers(0, 256, (16, 32, 4), dtype=np.uint8)
        i32 = jnp.asarray(frame.view(np.int32).reshape(16, 32))
        a = np.asarray(rgba_to_y4m_payload(i32, "420"))
        b = np.asarray(rgba_to_y4m_payload(jnp.asarray(frame), "420"))
        assert a.tobytes() == b.tobytes()

    def test_extreme_codes(self):
        """Clip boundaries: pure saturated colors drive the fixed-point
        accumulators to both clip edges."""
        colors = [(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 255, 0),
                  (0, 0, 255), (255, 255, 0), (0, 255, 255), (255, 0, 255)]
        frame = np.zeros((8, 8, 4), np.uint8)
        for i, c in enumerate(colors):
            frame[i, :, :3] = c
        frame[..., 3] = 255
        dev = np.asarray(rgba_to_y4m_payload(jnp.asarray(frame), "444"))
        assert dev.tobytes() == _host_payload(frame, "444")

    def test_wire_ok_gate(self):
        assert y4m_wire_ok(2160, 3840, "420")
        assert not y4m_wire_ok(30, 64, "420")   # H % 4 != 0
        assert not y4m_wire_ok(32, 63, "420")   # W odd
        assert y4m_wire_ok(30, 63, "444")


class TestEngineY4MWire:
    def test_stream_bytes_identical_to_host_egress(self, tmp_path, rng):
        """A y4m transcode through the device-payload wire produces a
        byte-identical file to the RGBA-wire + host-conversion path."""
        from tpufg.config import EngineConfig, resolve_sizes
        from tpufg.engine.runner import run_stream
        from tpufg.io.sinks import Y4MSink
        from tpufg.io.sources import SyntheticSource

        cfg = resolve_sizes(EngineConfig(
            input_width=64, input_height=48, output_width=128,
            output_height=96, motion_mode="pyramid", dtype="f32"))

        class ForceRGBA:
            """Claims RGBA-only so the engine reads back RGBA frames and
            the inner Y4MSink converts them on host."""
            wire_format = "rgba"
            needs_host = True

            def __init__(self, inner):
                self._inner = inner

            def write(self, f):
                self._inner.write(f)

            def close(self):
                self._inner.close()

        def transcode(path, force_rgba):
            sink = Y4MSink(path, 128, 96, fps=60, chroma="420")
            if force_rgba:
                sink = ForceRGBA(sink)
            src = SyntheticSource(64, 48, n_frames=5, seed=3)
            run_stream(cfg, src, sink, paced=False)
            sink.close()

        transcode(str(tmp_path / "dev.y4m"), force_rgba=False)
        transcode(str(tmp_path / "host.y4m"), force_rgba=True)
        a = (tmp_path / "dev.y4m").read_bytes()
        b = (tmp_path / "host.y4m").read_bytes()
        assert len(a) > 0 and a == b
