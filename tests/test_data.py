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


class TestPhotoCorpus:
    """Round-5 photometric axes (Scene photo=True): motion blur, fast
    exposure flicker, sensor-noise mismatch, perspective background —
    each present AND the analytic flow still exact under all of them."""

    def test_photo_warp_consistency(self):
        """The homography bg flow + blurred/flickered content: warping
        frame(te) by flow(tm->te) must still beat zero-flow decisively
        (residual floor is now blur + flicker, not just bilinear)."""
        sc = Scene(2, 320, 192, photo=True)
        tm, te = 3.0, 4.0
        ys, xs = np.mgrid[0:192, 0:320].astype(np.float32)
        flow, valid = sc.flow(tm, te, ys, xs)
        img_m = sc.render(tm).astype(np.float64)
        img_e = sc.render(te).astype(np.float64)
        rec = _bilinear(img_e, ys + flow[1], xs + flow[0])
        err = np.abs(rec[..., :3] - img_m[..., :3])
        zero_err = np.abs(img_e[..., :3] - img_m[..., :3])
        assert valid.mean() > 0.8
        assert err[valid].mean() < 6.0
        assert err[valid].mean() < 0.5 * zero_err[valid].mean()

    def test_motion_blur_softens(self):
        """The shutter-integrated frame has measurably less gradient
        energy than the sharp render at the same time."""
        sc = Scene(4, 256, 160, photo=True)
        ys, xs = sc._grid(None)
        sharp = np.clip(np.round(sc._render_sharp(5.0, ys, xs)), 0,
                        255)[..., :3]
        blurred = sc.render(5.0)[..., :3].astype(np.float64)
        ge = lambda im: np.abs(np.diff(im.astype(np.float64),
                                       axis=1)).mean()
        assert ge(blurred) < 0.97 * ge(sharp)

    def test_flicker_changes_interframe_gain(self):
        """Consecutive photo frames differ in mean brightness by more
        than the slow drift alone allows (0.03 over 180 frames is ~0.1%
        per frame; the fast flicker is percents)."""
        sc_p = Scene(6, 256, 160, photo=True)
        means = [sc_p.render(float(t))[..., :3].mean() for t in range(6)]
        rel = np.abs(np.diff(means)) / np.mean(means)
        assert rel.max() > 0.01, rel

    def test_noise_level_mismatch(self):
        """The grain strength oscillates: measure the injected-noise std
        at the modulation peak and trough times — they must differ."""
        sc = Scene(8, 256, 160, photo=True)
        na, period, ph = sc.noise_mod
        t_hi = period * ((np.pi / 2 - ph) / (2 * np.pi) % 1.0)
        t_lo = period * ((3 * np.pi / 2 - ph) / (2 * np.pi) % 1.0)

        def noise_std(t):
            clean = sc.render(t).astype(np.float64)
            noisy = sc.render(t, grain_rng=np.random.default_rng(1),
                              grain=3.0).astype(np.float64)
            return (noisy - clean)[..., :3].std()

        hi, lo = noise_std(t_hi), noise_std(t_lo)
        # clipping/rounding eat some of the 1±na ratio; still far apart
        assert hi > 1.3 * lo, (hi, lo)

    def test_perspective_background_flow(self):
        """The bg flow is projective: its horizontal gradient (scale
        change across the frame) is non-constant in a way the pan+zoom
        similarity can't produce — and photo=False stays affine."""
        ys, xs = np.mgrid[0:192, 0:320].astype(np.float32)

        def bg_flow_row(sc):
            flow, valid = sc.flow(0.0, 20.0, ys, xs)
            a1, a2, a3 = sc._alphas(0.0, ys, xs)
            bg = (a1 < 0.1) & (a2 < 0.1) & (a3 < 0.1) & valid
            row = np.where(bg[96], flow[0][96], np.nan)
            return row

        row_p = bg_flow_row(Scene(3, 320, 192, photo=True))
        # second difference of dx along x: zero for affine, nonzero for
        # projective (use widely spaced samples to beat f32 rounding)
        pts = [20, 160, 300]
        if not np.isnan(row_p[pts]).any():
            d2 = row_p[pts[2]] - 2 * row_p[pts[1]] + row_p[pts[0]]
            assert abs(d2) > 0.05, d2
        row_a = bg_flow_row(Scene(3, 320, 192, photo=False))
        if not np.isnan(row_a[pts]).any():
            d2a = row_a[pts[2]] - 2 * row_a[pts[1]] + row_a[pts[0]]
            assert abs(d2a) < 0.02, d2a

    def test_photo_default_off_and_deterministic(self):
        """photo=False scenes carry no photo state; photo=True renders
        are deterministic (exact t-closed-form, seeded grain)."""
        assert not hasattr(Scene(1, 64, 48, photo=False), "shutter")
        a = NaturalCorpus(160, 96, 3, photo=True).frame(1.5)
        b = NaturalCorpus(160, 96, 3, photo=True).frame(1.5)
        assert np.array_equal(a, b)

    def test_triplets_photo_p(self):
        g = synthetic_triplets(32, 48, 2, seed=7, scene_w=160, scene_h=96,
                               photo_p=1.0)
        b = next(g)
        assert b["prev"].shape == (2, 4, 32, 48)
        assert np.isfinite(b["flow4"]).all()
        # photo_p=0 must not perturb the existing stream (no extra draws)
        g0 = synthetic_triplets(32, 48, 2, seed=7, scene_w=160, scene_h=96)
        gd = synthetic_triplets(32, 48, 2, seed=7, scene_w=160, scene_h=96,
                                photo_p=0.0)
        b0, bd = next(g0), next(gd)
        for k in b0:
            assert np.array_equal(b0[k], bd[k]), k


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
