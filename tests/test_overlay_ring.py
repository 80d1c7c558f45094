"""Stats overlay, device ingest ring, checkpointing, training CLI."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpufg.engine.overlay import draw_stats, render_text
from tpufg.engine.ring import DeviceIngestRing
from tpufg.utils.checkpoint import load_pytree, save_pytree


class TestOverlay:
    def test_render_text_shape(self):
        m = render_text("FPS: 60.0", scale=2)
        assert m.shape == (14, 9 * 6 * 2)
        assert m.any()

    def test_draw_stats_marks_pixels(self):
        frame = np.zeros((64, 512, 4), np.uint8)
        out = draw_stats(frame, 59.9, (1920, 1080), (3840, 2160))
        assert (out == 255).any()
        # text starts at (10,10) like the reference (scaler.cpp:600)
        assert not out[:10].any() and not out[:, :10].any()

    def test_draw_stats_small_frame_no_crash(self):
        frame = np.zeros((12, 16, 4), np.uint8)
        draw_stats(frame, 1.0, (1, 1), (2, 2))


class TestIngestRing:
    def test_order_and_completeness(self, rng):
        frames = [rng.integers(0, 256, (8, 16, 4), dtype=np.uint8)
                  for _ in range(7)]
        ring = DeviceIngestRing(iter(frames), depth=3)
        out = [np.asarray(x) for x in ring]
        assert len(out) == 7
        for a, b in zip(out, frames):
            np.testing.assert_array_equal(a, b)

    def test_bad_depth(self):
        with pytest.raises(ValueError):
            DeviceIngestRing(iter([]), depth=0)


class TestCheckpoint:
    def test_roundtrip_bitwise(self, tmp_path, rng):
        tree = {"a": {"w": jnp.asarray(rng.random((3, 4), np.float32))},
                "b": [jnp.arange(5), jnp.asarray(2.5)]}
        p = str(tmp_path / "ckpt.npz")
        save_pytree(p, tree)
        like = jax.tree_util.tree_map(jnp.zeros_like, tree)
        back = load_pytree(p, like)
        for x, y in zip(jax.tree_util.tree_leaves(tree),
                        jax.tree_util.tree_leaves(back)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_shape_mismatch_rejected(self, tmp_path):
        p = str(tmp_path / "ckpt.npz")
        save_pytree(p, {"w": jnp.zeros((2, 2))})
        with pytest.raises(ValueError):
            load_pytree(p, {"w": jnp.zeros((3, 3))})


class TestTrainCLI:
    def test_trains_and_checkpoints(self, tmp_path):
        from tpufg.models.train import main as train_main
        ckpt = str(tmp_path / "m.npz")
        rc = train_main(["synthetic:96x128", "--steps", "4", "--batch", "2",
                        "--crop", "64x64", "--hidden", "16",
                        "--checkpoint", ckpt, "--log-every", "2"])
        assert rc == 0
        from tpufg.models import rife
        params = rife.load_params(ckpt)
        assert params["enc2"]["w"].shape[0] == 16

    def test_bad_crop_rejected(self):
        from tpufg.models.train import main as train_main
        assert train_main(["synthetic:32x32", "--crop", "banana"]) == 1
        from tpufg.utils.logging import get_logger
        get_logger().clear_error()


class TestLearnedEngineMode:
    def test_learned_step(self, tmp_path, rng):
        from tpufg.config import EngineConfig, resolve_sizes
        from tpufg.engine.pipeline import make_interp_step
        from tpufg.models import rife

        params = rife.init_params(jax.random.PRNGKey(0), hidden=16)
        cfg = resolve_sizes(EngineConfig(
            input_width=64, input_height=48, output_width=128,
            output_height=96, dtype="f32", motion_mode="learned"))
        step = make_interp_step(cfg, model_params=params)
        a = rng.integers(0, 256, (48, 64, 4), dtype=np.uint8)
        b = rng.integers(0, 256, (48, 64, 4), dtype=np.uint8)
        out_i, out_c = step(jnp.asarray(a), jnp.asarray(b))
        assert out_i.shape == (96, 128, 4)

    def test_learned_requires_params(self):
        from tpufg.config import EngineConfig, resolve_sizes
        from tpufg.engine.pipeline import make_interp_step
        cfg = resolve_sizes(EngineConfig(
            input_width=64, input_height=48, motion_mode="learned"))
        with pytest.raises(ValueError):
            make_interp_step(cfg)

    def test_v2_qfeed_stream_bitwise(self, rng):
        """q_feed streaming (quarter-frame cache threaded between pairs,
        each frame downsampled once) is bitwise-identical to the plain
        2-arg step: the cached quarter IS a fresh downsample of the same
        frame.  Runs a 3-pair stream at identity size so donation of
        prev AND q_seed is exercised."""
        from tpufg.config import EngineConfig, resolve_sizes
        from tpufg.engine.pipeline import make_interp_step, make_q_init
        from tpufg.models import rife

        params = rife.init_params2(jax.random.PRNGKey(1), hidden=16)
        cfg = resolve_sizes(EngineConfig(
            input_width=64, input_height=48, output_width=64,
            output_height=48, dtype="f32", motion_mode="learned"))
        plain = make_interp_step(cfg, model_params=params)
        qstep = make_interp_step(cfg, model_params=params, q_feed=True)
        frames = [rng.integers(0, 256, (48, 64, 4), dtype=np.uint8)
                  for _ in range(4)]
        # separate device copies per step: identity size donates prev
        fa = [jnp.asarray(f) for f in frames]
        fb = [jnp.asarray(f) for f in frames]
        q = make_q_init(cfg)(fb[0])
        assert q.shape == (4, 48 // 4, 64 // 4)
        for i in range(3):
            ref = plain(fa[i], fa[i + 1])
            *outs, q = qstep(fb[i], fb[i + 1], q)
            assert len(outs) == len(ref)
            for r, o in zip(ref, outs):
                assert (np.asarray(r) == np.asarray(o)).all()

    def test_qfeed_noop_for_v1(self, rng):
        """q_feed is silently dropped for a v1 head: the step keeps the
        2-arg API (nothing to cache — v1 has no stage-2 quarter feed)."""
        from tpufg.config import EngineConfig, resolve_sizes
        from tpufg.engine.pipeline import make_interp_step
        from tpufg.models import rife

        params = rife.init_params(jax.random.PRNGKey(0), hidden=16)
        cfg = resolve_sizes(EngineConfig(
            input_width=64, input_height=48, output_width=64,
            output_height=48, dtype="f32", motion_mode="learned"))
        step = make_interp_step(cfg, model_params=params, q_feed=True)
        a = jnp.asarray(rng.integers(0, 256, (48, 64, 4), dtype=np.uint8))
        b = jnp.asarray(rng.integers(0, 256, (48, 64, 4), dtype=np.uint8))
        out_i, out_c = step(a, b)
        assert out_i.shape == (48, 64, 4)

    def test_v3_qfeed_stream_bitwise(self, rng):
        """v3 streaming cache (quarter frame + per-frame encoder
        features threaded between pairs) is bitwise-identical to the
        plain 2-arg step — each cached piece is the same function on the
        same frame.  Identity size so donation of prev and the seed
        tuple is exercised."""
        from tpufg.config import EngineConfig, resolve_sizes
        from tpufg.engine.pipeline import make_interp_step, make_q_init
        from tpufg.models import rife

        params = rife.init_params3(jax.random.PRNGKey(2), hidden=16)
        cfg = resolve_sizes(EngineConfig(
            input_width=64, input_height=48, output_width=64,
            output_height=48, dtype="f32", motion_mode="learned"))
        plain = make_interp_step(cfg, model_params=params)
        qstep = make_interp_step(cfg, model_params=params, q_feed=True)
        frames = [rng.integers(0, 256, (48, 64, 4), dtype=np.uint8)
                  for _ in range(4)]
        fa = [jnp.asarray(f) for f in frames]
        fb = [jnp.asarray(f) for f in frames]
        q = make_q_init(cfg, model_params=params)(fb[0])
        q4, f4 = q
        assert q4.shape == (4, 48 // 4, 64 // 4)
        assert f4.shape == (8, 48 // 4, 64 // 4)  # hidden//2 features
        for i in range(3):
            ref = plain(fa[i], fa[i + 1])
            *outs, q = qstep(fb[i], fb[i + 1], q)
            assert len(outs) == len(ref)
            for r, o in zip(ref, outs):
                assert (np.asarray(r) == np.asarray(o)).all()
