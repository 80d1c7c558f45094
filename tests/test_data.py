"""tpufg.data.corpus: windowed rendering, analytic flow, trainer feed.

The analytic-flow contract is the load-bearing one: the trainer
supervises the learned head with Scene.flow, so a sign/convention error
there poisons training silently.  The warp-consistency test catches any
such error: warping frame(te) backward by flow(tm->te) must reconstruct
frame(tm) on valid pixels (reference for the protocol: the corpus is the
stand-in for the real app windows the reference upscales, SURVEY.md §4).
"""

import numpy as np
import pytest

from tpufg.data.corpus import NaturalCorpus, Scene, synthetic_triplets


def _bilinear(img, py, px):
    h, w = img.shape[:2]
    py = np.clip(py, 0, h - 1)
    px = np.clip(px, 0, w - 1)
    y0 = np.floor(py).astype(int)
    x0 = np.floor(px).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (py - y0)[..., None]
    fx = (px - x0)[..., None]
    return ((img[y0, x0] * (1 - fx) + img[y0, x1] * fx) * (1 - fy)
            + (img[y1, x0] * (1 - fx) + img[y1, x1] * fx) * fy)


class TestRenderer:
    def test_window_equals_crop(self):
        c = NaturalCorpus(320, 192, 5)
        full = c.frame(2.0)
        win = c.frame(2.0, window=(40, 70, 48, 64))
        assert np.array_equal(win, full[40:88, 70:134])

    def test_deterministic(self):
        a = NaturalCorpus(160, 96, 3).frame(1.5)
        b = NaturalCorpus(160, 96, 3).frame(1.5)
        assert np.array_equal(a, b)


class TestAnalyticFlow:
    @pytest.mark.parametrize("rich", [True, False])
    @pytest.mark.parametrize("te_off", [-0.5, 0.5, 1.0])
    def test_warp_consistency(self, rich, te_off):
        """Backward-warping frame(te) by flow(tm->te) reconstructs
        frame(tm) on valid pixels (residual = bilinear softening + u8
        rounding only)."""
        sc = Scene(2, 320, 192, rich=rich)
        tm = 3.0
        te = tm + te_off
        ys, xs = np.mgrid[0:192, 0:320].astype(np.float32)
        flow, valid = sc.flow(tm, te, ys, xs)
        img_m = sc.render(tm).astype(np.float64)
        img_e = sc.render(te).astype(np.float64)
        rec = _bilinear(img_e, ys + flow[1], xs + flow[0])
        err = np.abs(rec[..., :3] - img_m[..., :3])
        assert valid.mean() > 0.85
        assert err[valid].mean() < 1.5          # u8 LSB-scale residual
        # the flow is genuinely informative: zero-flow (frame difference)
        # is much worse wherever motion exists
        zero_err = np.abs(img_e[..., :3] - img_m[..., :3])
        assert err[valid].mean() < 0.5 * zero_err[valid].mean()

    def test_occlusion_marked_invalid(self):
        """Pixels whose content is covered by a mover at te are invalid."""
        sc = Scene(2, 320, 192, rich=True)
        ys, xs = np.mgrid[0:192, 0:320].astype(np.float32)
        flow, valid = sc.flow(3.0, 6.0, ys, xs)
        # bg pixels at tm whose ADVECTED position lands inside ob2 at te
        # are occluded there — every one must be invalid
        a1m, a2m, a3m = sc._alphas(3.0, ys, xs)
        bg_at_tm = (a1m < 0.1) & (a2m < 0.1) & (a3m < 0.1)
        a1e, a2e, a3e = sc._alphas(6.0, ys + flow[1], xs + flow[0])
        covered = bg_at_tm & (a2e >= 0.9)
        assert covered.sum() > 50  # mover overlaps bg in this layout
        assert not valid[covered].any()

    def test_cut_rejected(self):
        c = NaturalCorpus(160, 96, 1, cut_at=3.0)
        with pytest.raises(ValueError):
            c.flow(2.5, 3.5, np.zeros((2, 2)), np.zeros((2, 2)))


class TestSyntheticTriplets:
    def test_shapes_and_determinism(self):
        g1 = synthetic_triplets(32, 48, 2, seed=7, scene_w=160, scene_h=96)
        g2 = synthetic_triplets(32, 48, 2, seed=7, scene_w=160, scene_h=96)
        b1, b2 = next(g1), next(g2)
        assert b1["prev"].shape == (2, 4, 32, 48)
        assert b1["flow4"].shape == (2, 4, 8, 12)
        assert b1["vp4"].shape == (2, 1, 8, 12)
        assert b1["flow8"].shape == (2, 4, 4, 6)
        for k in b1:
            assert np.array_equal(b1[k], b2[k]), k
        # fresh scenes: the next batch differs
        b3 = next(g1)
        assert not np.array_equal(b1["prev"], b3["prev"])

    def test_flow_targets_match_scene(self):
        """The quarter-res targets are Scene.flow at (4i+1.5) centers in
        quarter units — the exact coordinates the head's outputs live at."""
        g = synthetic_triplets(32, 48, 1, seed=1, scene_w=160, scene_h=96,
                               grain_p=0.0, gap2_p=0.0)
        b = next(g)
        # magnitudes: flows are px/4 of sub-5.3 px/frame motion at t=0.5
        assert np.abs(b["flow4"]).max() < 2.0
        assert 0.2 < b["vp4"].mean() <= 1.0


class TestSupervisedTraining:
    def test_supervised_step_learns_flow(self):
        """15 supervised steps from zero-init flow heads must cut the
        flow loss (the analytic targets are a direct regression signal,
        unlike the photometric loss this guards against regressing to)."""
        import jax

        from tpufg.models import rife

        init_state, step, _ = rife.make_train_step(
            1e-3, arch="v2", flow_weight=0.1)
        params, opt = init_state(jax.random.PRNGKey(0), 16)
        gen = synthetic_triplets(32, 48, 2, seed=3, scene_w=160, scene_h=96,
                                 grain_p=0.0)
        first = last = None
        for i, b in zip(range(15), gen):
            sup = {k: b[k] for k in ("flow4", "vp4", "vc4", "flow8",
                                     "vp8", "vc8")}
            params, opt, (loss, photo, flow) = step(
                params, opt, b["prev"], b["curr"], b["target"], sup)
            if first is None:
                first = float(flow)
            last = float(flow)
        assert np.isfinite(last)
        assert last < 0.8 * first

    def test_sup_and_ft_exclusive(self):
        from tpufg.models import rife
        with pytest.raises(ValueError):
            rife.make_train_step(1e-4, arch="v2", ft=True, flow_weight=0.1)
