"""Frame sinks — the TPU-host replacement for the reference's SDL display.

The reference blits each output frame into an SDL window with a stats
overlay (src/scaler.cpp:536-609); headless TPU hosts write to files/streams
instead: packed raw RGBA, YUV4MPEG2 (plays in mpv/ffplay), per-frame PNGs
(pure-python encoder, no deps), or a null sink for benchmarking.
"""

from __future__ import annotations

import os
import struct
import sys
import zlib
from typing import IO, Optional

import numpy as np


class FrameSink:
    #: sinks that serialize frames need them on the host; NullSink doesn't,
    #: letting the engine skip the device->host readback entirely
    needs_host = True

    def write(self, frame: np.ndarray) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class NullSink(FrameSink):
    needs_host = False

    def __init__(self):
        self.count = 0

    def write(self, frame):
        self.count += 1


class RawVideoSink(FrameSink):
    """Packed RGBA8 frames, no header."""

    def __init__(self, path: str):
        self._f: IO[bytes] = (sys.stdout.buffer if path == "-"
                              else open(path, "wb"))
        self._own = path != "-"

    def write(self, frame):
        self._f.write(np.ascontiguousarray(frame).tobytes())

    def close(self):
        if self._own:
            self._f.close()


def _rgb_to_bt601(rgb: np.ndarray):
    """Full-range RGB -> limited-range BT.601 YCbCr planes (uint8)."""
    r = rgb[..., 0].astype(np.float32)
    g = rgb[..., 1].astype(np.float32)
    b = rgb[..., 2].astype(np.float32)
    y = 16.0 + (65.481 * r + 128.553 * g + 24.966 * b) / 255.0
    u = 128.0 + (-37.797 * r - 74.203 * g + 112.0 * b) / 255.0
    v = 128.0 + (112.0 * r - 93.786 * g - 18.214 * b) / 255.0
    return (np.clip(y, 0, 255).astype(np.uint8),
            np.clip(u, 0, 255).astype(np.uint8),
            np.clip(v, 0, 255).astype(np.uint8))


class Y4MSink(FrameSink):
    """YUV4MPEG2 writer (BT.601 limited range; C444 or C420).

    C420 (2x2 box-averaged chroma) halves the file size vs C444 and is what
    players/encoders expect by default; C444 is lossless in chroma.  C420
    needs even dimensions — odd sizes fall back to C444 (with a warning).
    """

    def __init__(self, path: str, width: int, height: int, fps: float = 60.0,
                 chroma: str = "444"):
        if chroma not in ("444", "420"):
            raise ValueError(f"y4m chroma must be 444 or 420, got {chroma!r}")
        if chroma == "420" and (width % 2 or height % 2):
            from tpufg.utils.logging import get_logger
            get_logger().warning(
                f"C420 needs even dimensions, got {width}x{height}: "
                f"writing C444")
            chroma = "444"
        self._chroma = chroma
        self._f = sys.stdout.buffer if path == "-" else open(path, "wb")
        self._own = path != "-"
        num = int(round(fps * 1000))
        tag = "C444" if chroma == "444" else "C420jpeg"
        self._f.write(
            f"YUV4MPEG2 W{width} H{height} F{num}:1000 Ip A1:1 {tag}\n"
            .encode())

    def write(self, frame):
        y, u, v = _rgb_to_bt601(frame[..., :3])
        if self._chroma == "420":
            # 2x2 box average (centered siting, "420jpeg")
            def down(p):
                p16 = p.astype(np.uint16)
                s = (p16[0::2, 0::2] + p16[0::2, 1::2]
                     + p16[1::2, 0::2] + p16[1::2, 1::2])
                return ((s + 2) >> 2).astype(np.uint8)
            u, v = down(u), down(v)
        self._f.write(b"FRAME\n")
        self._f.write(y.tobytes())
        self._f.write(u.tobytes())
        self._f.write(v.tobytes())

    def close(self):
        if self._own:
            self._f.close()


def encode_png(rgba: np.ndarray) -> bytes:
    """Minimal RGBA8 PNG encoder (pure python: zlib + struct)."""
    h, w = rgba.shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + rgba[i].tobytes() for i in range(h))
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


class PNGDirSink(FrameSink):
    def __init__(self, directory: str, prefix: str = "frame"):
        os.makedirs(directory, exist_ok=True)
        self._dir = directory
        self._prefix = prefix
        self._i = 0

    def write(self, frame):
        path = os.path.join(self._dir, f"{self._prefix}_{self._i:06d}.png")
        with open(path, "wb") as f:
            f.write(encode_png(np.ascontiguousarray(frame)))
        self._i += 1


def open_sink(spec: Optional[str], width: int, height: int,
              fps: float = 60.0, y4m_chroma: str = "444") -> FrameSink:
    """Resolve an --output spec: null/none, ``-`` (y4m to stdout),
    *.y4m, directory/ (PNGs), raw file."""
    if spec is None or spec in ("null", "none"):
        return NullSink()
    if spec == "-":
        # stdout is for piping (| mpv -): a self-describing y4m stream,
        # not headerless raw bytes nothing can identify
        return Y4MSink("-", width, height, fps, chroma=y4m_chroma)
    if spec.endswith(".y4m"):
        return Y4MSink(spec, width, height, fps, chroma=y4m_chroma)
    if spec.endswith("/") or os.path.isdir(spec):
        return PNGDirSink(spec.rstrip("/"))
    return RawVideoSink(spec)
