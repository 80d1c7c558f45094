"""Streaming engine + pipeline integration (BASELINE configs on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpufg.config import EngineConfig, resolve_sizes
from tpufg.engine.pipeline import make_interp_step, make_scale_step
from tpufg.engine.runner import run_stream
from tpufg.io.sinks import NullSink
from tpufg.io.sources import SyntheticSource
from tpufg.ops import oracle
from tpufg.utils.quality import ssim


def _cfg(**kw):
    base = dict(input_width=64, input_height=64,
                output_width=128, output_height=128, dtype="f32")
    base.update(kw)
    return resolve_sizes(EngineConfig(**base))


class TestScaleStep:
    def test_matches_oracle(self, rng):
        # config 1: Lanczos-only path vs oracle through uint8 round-trip
        cfg = _cfg()
        step = make_scale_step(cfg)
        frame = rng.integers(0, 256, (64, 64, 4), dtype=np.uint8)
        out = np.asarray(step(jnp.asarray(frame)))
        ref = np.asarray(oracle.quantize_unorm8(oracle.lanczos_scale(
            oracle.dequantize_unorm8(jnp.asarray(frame)), 128, 128)))
        # fast path differs from oracle by ~1e-6 pre-quantization; allow
        # off-by-one codes at rounding boundaries
        diff = np.abs(out.astype(int) - ref.astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.01

    def test_bf16_ssim(self, rng):
        cfg = _cfg(dtype="bf16")
        step = make_scale_step(cfg)
        frame = rng.integers(0, 256, (64, 64, 4), dtype=np.uint8)
        out = np.asarray(step(jnp.asarray(frame))).astype(np.float32) / 255.0
        ref = np.asarray(oracle.lanczos_scale(
            oracle.dequantize_unorm8(jnp.asarray(frame)), 128, 128))
        assert ssim(np.clip(ref, 0, 1), out) >= 0.999


class TestInterpStep:
    def test_crossfade_mode(self, rng):
        # config 2: fixed blend, no motion
        cfg = _cfg(motion_mode="none")
        step = make_interp_step(cfg)
        a = rng.integers(0, 256, (64, 64, 4), dtype=np.uint8)
        b = rng.integers(0, 256, (64, 64, 4), dtype=np.uint8)
        out_i, out_c = step(jnp.asarray(a), jnp.asarray(b))
        assert out_i.shape == (128, 128, 4)
        assert out_c.shape == (128, 128, 4)

    def test_pyramid_mode_shapes(self, rng):
        cfg = _cfg(motion_mode="pyramid")
        step = make_interp_step(cfg)
        a = rng.integers(0, 256, (64, 64, 4), dtype=np.uint8)
        b = rng.integers(0, 256, (64, 64, 4), dtype=np.uint8)
        out_i, out_c = step(jnp.asarray(a), jnp.asarray(b))
        assert out_i.shape == (128, 128, 4)

    def test_nonaligned_size_padding(self, rng):
        # 72x88 is not divisible by the 64-px pyramid lattice: exercises
        # the engine's pad/crop path
        cfg = _cfg(input_width=88, input_height=72,
                   output_width=176, output_height=144,
                   motion_mode="pyramid")
        step = make_interp_step(cfg)
        a = rng.integers(0, 256, (72, 88, 4), dtype=np.uint8)
        b = rng.integers(0, 256, (72, 88, 4), dtype=np.uint8)
        out_i, _ = step(jnp.asarray(a), jnp.asarray(b))
        assert out_i.shape == (144, 176, 4)

    def test_exact_mode_is_oracle(self, rng):
        cfg = _cfg(motion_mode="none", block_size=4, search_radius=2)
        step = make_interp_step(cfg, "exact")
        a = rng.integers(0, 256, (64, 64, 4), dtype=np.uint8)
        b = rng.integers(0, 256, (64, 64, 4), dtype=np.uint8)
        out_i, out_c = step(jnp.asarray(a), jnp.asarray(b))
        pa = oracle.dequantize_unorm8(jnp.asarray(a))
        pb = oracle.dequantize_unorm8(jnp.asarray(b))
        ref = oracle.quantize_unorm8(oracle.lanczos_scale(
            oracle.warp_blend(pa, pb, None, 0.5), 128, 128))
        # the step is one fused jit program; XLA fusion can flip the last
        # ulp pre-quantization vs separately-jitted oracle calls, moving
        # isolated pixels by one code at rounding boundaries
        diff = np.abs(np.asarray(out_i).astype(int)
                      - np.asarray(ref).astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-3


class TestStreaming:
    def test_frame_doubling_count(self):
        cfg = _cfg(motion_mode="none")
        src = SyntheticSource(64, 64, n_frames=5)
        sink = NullSink()
        stats = run_stream(cfg, src, sink, paced=False)
        assert stats.frames_in == 5
        assert stats.frames_out == 9  # 1 + 4*2
        assert sink.count == 9
        assert stats.latency["n"] == 5

    def test_no_interp_passthrough_count(self):
        cfg = _cfg(enable_interpolation=False)
        src = SyntheticSource(64, 64, n_frames=4)
        sink = NullSink()
        stats = run_stream(cfg, src, sink, paced=False)
        assert stats.frames_out == 4

    def test_max_frames(self):
        cfg = _cfg(enable_interpolation=False)
        src = SyntheticSource(64, 64, n_frames=100)
        stats = run_stream(cfg, src, NullSink(), max_frames=3, paced=False)
        assert stats.frames_in == 3
