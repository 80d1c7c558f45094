"""On-TPU regression lane: compiled Mosaic kernels on the real chip.

Run with ``TPUFG_TEST_TPU=1 python -m pytest tests/ -m tpu -q`` (any other
invocation skips these).  The rest of the suite exercises the kernels in
interpret mode on CPU; this lane pins the PRODUCTION artifact — the
Mosaic-compiled kernels — against the same oracles, automating the
PARITY.md ladder as a repeatable regression instead of a one-off:

- Lanczos kernel vs f32 oracle (<= 2e-6), bf16 SSIM >= 0.999
- motion kernel f32 BITWISE parity vs oracle (tie-break/scan order)
- warp_blend_matmul vs oracle to f32 rounding
- one full production step (shapes + y4m payload byte parity vs host)

Sizes here are moderate (compile time on the chip dominates); the 1080p
r=16 full-scale parity run stays documented in PARITY.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import ON_TPU

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module", autouse=True)
def _require_tpu():
    if not ON_TPU:
        pytest.skip("TPUFG_TEST_TPU not set")
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip(f"not a TPU backend: {jax.default_backend()}")


def _rand_chw(rng, c, h, w):
    return jnp.asarray(
        rng.integers(0, 256, size=(c, h, w)).astype(np.float32) / 255.0)


class TestLanczosOnChip:
    def test_f32_matches_oracle(self, rng):
        from tpufg.kernels.lanczos import lanczos_scale_fast
        from tpufg.ops import lanczos_scale
        img = _rand_chw(rng, 4, 72, 96)
        ref = jnp.transpose(
            lanczos_scale(jnp.transpose(img, (1, 2, 0)), 144, 192),
            (2, 0, 1))
        out = lanczos_scale_fast(img, 144, 192, interpret=False)
        # on-chip f32 matmuls run as split bf16 passes (HIGHEST): ~1 ulp
        # looser than interpret mode's exact f32 dots (measured 5.9e-6;
        # PARITY.md scopes the per-backend contract)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_bf16_ssim_contract(self, rng):
        from tpufg.kernels.lanczos import lanczos_scale_fast
        from tpufg.ops import lanczos_scale
        from tpufg.utils.quality import ssim
        img = _rand_chw(rng, 4, 72, 96)
        ref = np.asarray(jnp.transpose(
            lanczos_scale(jnp.transpose(img, (1, 2, 0)), 144, 192),
            (2, 0, 1)))
        out = np.asarray(lanczos_scale_fast(
            img.astype(jnp.bfloat16), 144, 192,
            interpret=False).astype(jnp.float32))
        s = ssim(np.transpose(ref, (1, 2, 0)), np.transpose(out, (1, 2, 0)))
        assert s >= 0.999, s

    def test_packed_bytes_match_unpacked(self, rng):
        from tpufg.kernels.convert import planar_to_frames
        from tpufg.kernels.lanczos import (lanczos_scale_fast,
                                           lanczos_scale_packed)
        img = _rand_chw(rng, 4, 64, 128)
        a = np.asarray(planar_to_frames(
            lanczos_scale_fast(img, 128, 256, interpret=False)))
        b = np.asarray(lanczos_scale_packed(img, 128, 256, interpret=False))
        np.testing.assert_array_equal(a, b)


class TestMotionOnChip:
    def test_f32_bitwise_parity(self, rng):
        """Compiled motion kernel == oracle, bitwise, incl. tie-break
        (first-found most-negative dy-then-dx scan, motion.comp:27-52)."""
        from tpufg.kernels.motion import motion_search_tiled
        from tpufg.ops import oracle
        h, w = 128, 256
        base = rng.random((h + 24, w + 24, 4)).astype(np.float32)
        p_hwc = base[8:8 + h, 8:8 + w]
        c_hwc = base[3:3 + h, 12:12 + w]
        p = jnp.asarray(np.transpose(p_hwc, (2, 0, 1)).copy())
        c = jnp.asarray(np.transpose(c_hwc, (2, 0, 1)).copy())
        ref = oracle.motion_search(
            jnp.asarray(p_hwc.copy()), jnp.asarray(c_hwc.copy()),
            block_size=8, search_radius=16)
        out = motion_search_tiled(p, c, block_size=8, search_radius=16,
                                  interpret=False)
        # oracle is [H, W, 2] channel-last
        np.testing.assert_array_equal(
            np.asarray(out), np.transpose(np.asarray(ref), (2, 0, 1)))

    def test_sites_kernel_bitwise_compiled(self, rng):
        """The site-row exhaustive kernel (engine config-3 path) must be
        bitwise the per-pixel field's site rows when Mosaic-compiled —
        earlier site-kernel attempts miscompiled only on hardware."""
        from tpufg.kernels.motion import (motion_search_sites,
                                          motion_search_tiled)
        prev = jnp.asarray(rng.random((4, 128, 384)).astype(np.float32))
        curr = jnp.asarray(np.roll(np.asarray(prev), (3, -2), (1, 2)))
        full = motion_search_tiled(prev, curr, block_size=8,
                                   search_radius=8, exact_box=False)
        sites = motion_search_sites(prev, curr, block_size=8,
                                    search_radius=8, dx_chunk=1)
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(sites)),
            np.asarray(jax.device_get(full))[:, 8::16, :])

    def test_lattice_matches_tiled_subsampled(self, rng):
        from tpufg.kernels.motion import motion_search_tiled
        from tpufg.kernels.motion_xla import motion_search_lattice
        p = _rand_chw(rng, 4, 64, 128)
        c = _rand_chw(rng, 4, 64, 128)
        full = motion_search_tiled(p, c, block_size=8, search_radius=4,
                                   exact_box=False, interpret=False)
        lat = motion_search_lattice(p, c, grid=16, block_size=8,
                                    search_radius=4)
        np.testing.assert_array_equal(
            np.asarray(full)[:, 8::16, 8::16], np.asarray(lat))


class TestWarpOnChip:
    def test_warp_matches_oracle_f32(self, rng):
        from tpufg.kernels.warp_matmul import warp_blend_matmul
        from tpufg.ops import oracle
        h, w, g = 64, 128, 16
        p = _rand_chw(rng, 4, h, w)
        c = _rand_chw(rng, 4, h, w)
        mv = jnp.asarray(
            rng.uniform(-5, 5, (2, h // g, w // g)).astype(np.float32))
        out = warp_blend_matmul(p, c, mv, factor=0.5, block=g,
                                search_radius=8)
        # oracle reads the lattice field per-pixel NEAREST when warping
        # block-granular: expand to per-pixel by repetition
        mv_pp = np.repeat(np.repeat(np.asarray(mv), g, 1), g, 2)
        ref = oracle.warp_blend(
            jnp.transpose(p, (1, 2, 0)), jnp.transpose(c, (1, 2, 0)),
            jnp.asarray(np.transpose(mv_pp, (1, 2, 0))), 0.5)
        np.testing.assert_allclose(
            np.asarray(out), np.transpose(np.asarray(ref), (2, 0, 1)),
            atol=3e-6)


class TestWarpIntegerDomainOnChip:
    def test_equal_size_bf16_bitwise_f32_compiled(self, rng):
        """The integer-code-domain claim (kernels/warp_matmul.py u8_exact)
        must hold on the real MXU, not just in interpret mode: default
        equal-size pyramid config, bf16 output bytes == f32's."""
        from tpufg.config import EngineConfig, resolve_sizes
        from tpufg.engine.pipeline import make_interp_step

        prev = rng.integers(0, 256, (64, 128, 4), dtype=np.uint8)
        curr = np.roll(prev, (4, -6), (0, 1))
        outs = {}
        for dt in ("bf16", "f32"):
            cfg = resolve_sizes(EngineConfig(
                input_width=128, input_height=64, output_width=128,
                output_height=64, dtype=dt, motion_mode="pyramid"))
            outs[dt] = [np.asarray(jax.device_get(o)) for o in
                        make_interp_step(cfg)(jnp.asarray(prev),
                                              jnp.asarray(curr))]
        for a, b in zip(outs["bf16"], outs["f32"]):
            np.testing.assert_array_equal(a, b)


class TestConvOnChip:
    def test_encoder_conv_bitwise_vs_lax(self, rng):
        """Mosaic-compiled Pallas conv == lax.conv bf16 on the real MXU
        (the selection-matmul formulation must survive compilation, not
        just interpret mode — see the lattice-kernel miscompile history
        in engine/pipeline.py)."""
        from tpufg.kernels.conv import conv3x3_s2
        from tpufg.models import rife

        x = jnp.asarray(rng.random((8, 128, 256), np.float32))
        w = jnp.asarray(rng.normal(0, 0.2, (32, 8, 3, 3)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.1, (32,)).astype(np.float32))
        ref = rife._conv(x[None], w, b, 2, jnp.bfloat16)[0]
        got = conv3x3_s2(x, w, b, compute_dtype=jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(jax.device_get(got)),
                                      np.asarray(jax.device_get(ref)))


class TestStepOnChip:
    def test_production_step_and_y4m_payload(self, rng):
        """One full compiled production step (pyramid + warp + scale) on
        the chip: output shapes, plus device-side y4m payload bytes ==
        host-side conversion of the RGBA output."""
        from tpufg.config import EngineConfig, resolve_sizes
        from tpufg.engine.pipeline import make_interp_step
        from tpufg.io.sinks import _down2x2, _rgb_to_bt601

        cfg = resolve_sizes(EngineConfig(
            input_width=128, input_height=96, output_width=256,
            output_height=192, dtype="bf16", motion_mode="pyramid"))
        step_rgba = make_interp_step(cfg, wire="i32")
        step_y4m = make_interp_step(cfg, wire="i32", sink_wire="y4m420")

        a = rng.integers(0, 256, (96, 128, 4), dtype=np.uint8)
        b = rng.integers(0, 256, (96, 128, 4), dtype=np.uint8)
        ai = jnp.asarray(a.view(np.int32).reshape(96, 128))
        bi = jnp.asarray(b.view(np.int32).reshape(96, 128))
        outs = step_rgba(ai, bi)
        assert all(o.shape == (192, 256) for o in outs)
        pay = step_y4m(ai, bi)
        assert all(p.shape == (192 * 3 // 2, 256) for p in pay)
        for o, p in zip(outs, pay):
            rgba = np.asarray(jax.device_get(o)).view(np.uint8).reshape(
                192, 256, 4)
            y, u, v = _rgb_to_bt601(rgba[..., :3])
            host = y.tobytes() + _down2x2(u).tobytes() + _down2x2(v).tobytes()
            assert np.asarray(jax.device_get(p)).tobytes() == host


class TestLearnedDefaultOnChip:
    def test_v3_bundled_head_stream_bitwise(self, rng):
        """The SHIPPING default (bundled v3 streaming head, bf16
        production config) compiled on the chip: the q_feed streamed
        step (quarter frame + per-frame encoder features threaded
        between pairs) is bitwise-identical to the plain 2-arg step,
        and outputs are valid frames.  Pins the default config-5 path
        as deployed — real weights, not random init."""
        import os

        from tpufg.config import EngineConfig, resolve_sizes
        from tpufg.engine.pipeline import make_interp_step, make_q_init
        from tpufg.models import rife

        ckpt = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "checkpoints", "head64_v3.npz")
        params = rife.load_params(ckpt)
        assert rife.is_v3(params)
        cfg = resolve_sizes(EngineConfig(
            input_width=128, input_height=96, output_width=128,
            output_height=96, dtype="bf16", motion_mode="learned"))
        plain = make_interp_step(cfg, model_params=params)
        qstep = make_interp_step(cfg, model_params=params, q_feed=True)
        frames = [rng.integers(0, 256, (96, 128, 4), dtype=np.uint8)
                  for _ in range(3)]
        fa = [jnp.asarray(f) for f in frames]
        fb = [jnp.asarray(f) for f in frames]
        q = make_q_init(cfg, model_params=params)(fb[0])
        for i in range(2):
            ref = plain(fa[i], fa[i + 1])
            *outs, q = qstep(fb[i], fb[i + 1], q)
            assert len(outs) == len(ref)
            for r, o in zip(ref, outs):
                r, o = np.asarray(r), np.asarray(o)
                assert r.shape == (96, 128, 4) and r.dtype == np.uint8
                assert (r == o).all()


class TestWarpPrepSplitOnChip:
    def test_prepare_banded_bitwise_compiled(self, rng):
        """The split single-mode warp (warp_single_prepare +
        warp_single_banded, the k>2 learned-tail path) compiled on the
        chip is bitwise the inline single-mode warp, in the production
        bf16 fractional domain AND the v1 integer-code domain — the
        CPU-interpret parity (TestSinglePrepareBanded) re-pinned on the
        Mosaic-compiled artifact."""
        from tpufg.kernels.warp_matmul import (warp_blend_matmul,
                                               warp_single_banded,
                                               warp_single_prepare)
        f = jnp.asarray(
            np.round(rng.random((4, 64, 256)).astype(np.float32) * 255)
            / np.float32(255))
        for io, u8 in ((False, False), (True, True)):
            mv = rng.uniform(-8, 8, (2, 4, 16)).astype(np.float32)
            if io:
                mv = np.round(mv)
            mv = jnp.asarray(mv)
            kw = dict(block=16, search_radius=8, dtype=jnp.bfloat16,
                      integer_offsets=io, u8_exact=u8)
            a = warp_blend_matmul(f, f, mv, single=True, **kw)
            b = warp_single_banded(warp_single_prepare(f, **kw), mv, **kw)
            assert np.array_equal(np.asarray(a), np.asarray(b)), (io, u8)

    def test_multi_t_tails_bitwise_compiled(self, rng):
        """tails_fast at three time points == per-t tail_fast, compiled:
        the k>2 engine path's shared-prep form against the one-t form,
        with the bundled default head's shapes (random v3 weights —
        structure parity, the bundled-weights test above covers values)."""
        from tpufg.models import rife
        params = rife.init_params3(jax.random.PRNGKey(3), hidden=16)
        prev = jnp.asarray(rng.random((4, 48, 128)).astype(np.float32))
        curr = jnp.asarray(rng.random((4, 48, 128)).astype(np.float32))
        out = rife.trunk_fast(params, prev, curr)
        ts = (1.0 / 3.0, 0.5, 2.0 / 3.0)
        multi = rife.tails_fast(params, out, prev, curr, ts)
        for t, m in zip(ts, multi):
            single = rife.tail_fast(params, out, prev, curr, t)
            assert np.array_equal(np.asarray(m), np.asarray(single)), t
