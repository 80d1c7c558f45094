"""Natural-content validation corpus (procedural, analytically sampled).

The image ships no video footage and no decoder (no ffmpeg), so natural-
CONTENT evaluation uses a renderer built to exhibit what the synthetic
pan/noise family lacks and real video has:

- 1/f-spectrum textures (multi-octave value noise — natural image
  statistics, unlike white noise or pure sinusoids);
- layered parallax: background + two textured foreground objects at
  different velocities -> occlusion and revealed content at the edges;
- NON-INTEGER subpixel motion everywhere, plus a slow zoom on the
  background (divergent flow — no single translation explains any block);
- film grain (temporally uncorrelated sensor noise) and a slow luminance
  drift (auto-exposure);
- a hard scene cut to a different layout mid-sequence.

Everything is evaluated analytically at arbitrary float time t, so exact
ground-truth middle frames exist at t + 0.5 — the proper interpolation
evaluation protocol (feed integer-t frames, compare the engine's
in-betweens against rendered half-step truth), with no resampling
artifacts in the truth itself.

Usage:
    python tools/corpus.py out.y4m --width 640 --height 384 --frames 60
        [--half-rate] [--no-grain] [--cut-at 30] [--seed 1] [--fps 30]

``--half-rate`` renders frames at t = 0, 0.5, 1, ... (2N-1 frames) so the
odd frames are ground truth for fps-doubling the even ones.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _lattice(rng, gh, gw, octaves):
    return [rng.random((gh * 2 ** k + 2, gw * 2 ** k + 2))
            .astype(np.float32) for k in range(octaves)]


def _sample_noise(lat, ys, xs, octaves, persistence=0.55):
    """Multi-octave value noise at float coords (bilinear per octave)."""
    out = np.zeros(ys.shape, np.float32)
    amp, norm = 1.0, 0.0
    for k in range(octaves):
        g = lat[k]
        gy = ys * (2 ** k) * 0.05
        gx = xs * (2 ** k) * 0.05
        gy = np.mod(gy, g.shape[0] - 2)
        gx = np.mod(gx, g.shape[1] - 2)
        y0 = gy.astype(np.int32)
        x0 = gx.astype(np.int32)
        fy = gy - y0
        fx = gx - x0
        # smoothstep fade (classic value noise)
        fy = fy * fy * (3 - 2 * fy)
        fx = fx * fx * (3 - 2 * fx)
        v = ((g[y0, x0] * (1 - fx) + g[y0, x0 + 1] * fx) * (1 - fy)
             + (g[y0 + 1, x0] * (1 - fx) + g[y0 + 1, x0 + 1] * fx) * fy)
        out += amp * v
        norm += amp
        amp *= persistence
    return out / norm


class Scene:
    """One shot: background + two occluding movers, all subpixel.

    ``rich=True`` (round 4) adds the motion classes the original corpus
    was thinnest on (VERDICT r3 item 6): the first mover ROTATES about
    its center (non-translational block motion — no single translation
    explains its blocks), a THIN BAR occluder sweeps the frame (blocks
    straddling it see two motions at once), and a REPEATED diagonal
    grating rides the background (the aperture trap: every period-offset
    displacement matches equally well).  All remain analytic in float t.
    """

    def __init__(self, seed, w, h, rich=True):
        rng = np.random.default_rng(seed)
        self.w, self.h = w, h
        self.rich = rich
        self.bg = _lattice(rng, 8, 8, 4)
        self.ob1 = _lattice(rng, 6, 6, 3)
        self.ob2 = _lattice(rng, 6, 6, 3)
        # velocities in px/frame — deliberately non-integer
        self.v_bg = rng.uniform(0.6, 2.4, 2) * rng.choice([-1, 1], 2)
        self.v1 = rng.uniform(1.1, 3.7, 2) * rng.choice([-1, 1], 2)
        self.v2 = rng.uniform(2.2, 5.3, 2) * rng.choice([-1, 1], 2)
        self.zoom = rng.uniform(0.0005, 0.002)     # divergence per frame
        self.c1 = rng.uniform(0.25, 0.75, 2) * [h, w]
        self.c2 = rng.uniform(0.25, 0.75, 2) * [h, w]
        self.r1 = rng.uniform(0.12, 0.2) * min(h, w)
        self.r2 = rng.uniform(0.08, 0.14) * min(h, w)
        # per-channel color transforms of the same luminance texture
        self.tint = rng.uniform(0.5, 1.0, (3, 3)).astype(np.float32)
        if rich:
            # ob1 spin: ~0.5-1.5 px/frame of tangential motion at the rim
            self.omega1 = rng.uniform(0.008, 0.022) * rng.choice([-1, 1])
            # thin bar: 2-5 px half-width, fast sweep, slow tumble
            self.bar_c = rng.uniform(0.3, 0.7, 2) * [h, w]
            self.bar_v = rng.uniform(2.5, 6.0, 2) * rng.choice([-1, 1], 2)
            self.bar_hw = rng.uniform(2.0, 5.0)
            self.bar_hl = rng.uniform(0.25, 0.45) * min(h, w)
            self.bar_phi = rng.uniform(0, np.pi)
            self.bar_omega = rng.uniform(-0.01, 0.01)
            # repeated grating locked to the background flow: period well
            # inside the 16-px block so ±period displacements alias
            self.gr_period = rng.uniform(9.0, 13.0)
            self.gr_angle = rng.uniform(0, np.pi)
            self.gr_c = rng.uniform(0.2, 0.8, 2) * [h, w]
            self.gr_r = rng.uniform(0.18, 0.28) * min(h, w)

    def render(self, t, grain_rng=None, grain=3.0):
        h, w = self.h, self.w
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        # background: pan + slow zoom about the frame center
        s = 1.0 + self.zoom * t
        by = (ys - h / 2) * s + h / 2 + self.v_bg[0] * t
        bx = (xs - w / 2) * s + w / 2 + self.v_bg[1] * t
        lum_bg = _sample_noise(self.bg, by, bx, 4)
        if self.rich:
            # repeated diagonal grating, advected with the background
            # (soft disk region): the classic aperture trap
            u = by * np.sin(self.gr_angle) + bx * np.cos(self.gr_angle)
            grating = 0.5 + 0.5 * np.sin(2 * np.pi * u / self.gr_period)
            gd = np.sqrt((ys - self.gr_c[0]) ** 2 + (xs - self.gr_c[1]) ** 2)
            g_a = np.clip((self.gr_r - gd) / 6.0, 0.0, 1.0) * 0.55
            lum_bg = lum_bg * (1 - g_a) + grating * g_a

        def obj(lat, c, r, v, octs, omega=0.0):
            cy = c[0] + v[0] * t
            cx = c[1] + v[1] * t
            # textured soft-edged disk, texture locked to the object
            dy = ys - cy
            dx = xs - cx
            alpha = np.clip((r - np.sqrt(dy * dy + dx * dx)) / 1.5, 0.0, 1.0)
            if omega:
                # texture sampled in the object's ROTATING frame
                th = omega * t
                dy, dx = (np.cos(th) * dy + np.sin(th) * dx,
                          -np.sin(th) * dy + np.cos(th) * dx)
            lum = _sample_noise(lat, dy, dx, octs)
            return lum, alpha

        l1, a1 = obj(self.ob1, self.c1, self.r1, self.v1, 3,
                     omega=self.omega1 if self.rich else 0.0)
        l2, a2 = obj(self.ob2, self.c2, self.r2, self.v2, 3)
        lum = lum_bg * (1 - a1) + (0.3 + 0.7 * l1) * a1
        lum = lum * (1 - a2) + (0.15 + 0.7 * l2) * a2
        if self.rich:
            # thin tumbling bar occluder (distance to a rotating segment)
            bcy = self.bar_c[0] + self.bar_v[0] * t
            bcx = self.bar_c[1] + self.bar_v[1] * t
            phi = self.bar_phi + self.bar_omega * t
            dy = ys - bcy
            dx = xs - bcx
            along = dy * np.sin(phi) + dx * np.cos(phi)
            across = dy * np.cos(phi) - dx * np.sin(phi)
            a3 = (np.clip((self.bar_hw - np.abs(across)) / 1.0, 0.0, 1.0)
                  * np.clip((self.bar_hl - np.abs(along)) / 3.0, 0.0, 1.0))
            l3 = _sample_noise(self.ob2, along * 0.7, across * 0.7, 2)
            lum = lum * (1 - a3) + (0.55 + 0.45 * l3) * a3

        # slow exposure drift
        gain = 1.0 + 0.03 * np.sin(2 * np.pi * t / 180.0)
        frame = np.empty((h, w, 4), np.float32)
        for ch in range(3):
            m = self.tint[ch]
            frame[..., ch] = (m[0] * lum + m[1] * lum_bg * 0.3
                              + m[2] * 0.1) * gain
        frame[..., :3] *= 255.0 / 1.4
        if grain_rng is not None and grain > 0:
            frame[..., :3] += grain_rng.normal(0.0, grain, (h, w, 3))
        frame[..., 3] = 255.0
        return np.clip(np.round(frame), 0, 255).astype(np.uint8)


class NaturalCorpus:
    """Frame factory with optional scene cuts.

    ``cut_at``: a time, or a LIST of times (multiple cuts — each starts a
    fresh independently-seeded scene).  ``rich=False`` reproduces the r3
    corpus exactly (no rotation/bar/grating)."""

    def __init__(self, w=640, h=384, seed=1, cut_at=None, rich=True):
        cuts = ([] if cut_at is None
                else list(cut_at) if hasattr(cut_at, "__iter__")
                else [cut_at])
        self.cuts = sorted(float(c) for c in cuts)
        self.scenes = [Scene(seed + 1000 * k, w, h, rich=rich)
                       for k in range(len(self.cuts) + 1)]
        # back-compat: the single-cut attribute older callers read
        self.cut_at = self.cuts[0] if self.cuts else None

    def frame(self, t, grain_rng=None, grain=3.0):
        k = sum(1 for c in self.cuts if t >= c)
        return self.scenes[k].render(t, grain_rng=grain_rng, grain=grain)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("output")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--half-rate", action="store_true",
                   help="render at t = 0, 0.5, 1, ... (ground-truth "
                        "in-betweens interleaved)")
    p.add_argument("--no-grain", action="store_true")
    p.add_argument("--cut-at", default=None,
                   help="scene-cut time(s) in frame units — a number or "
                        "comma-separated list for multiple cuts")
    p.add_argument("--classic", action="store_true",
                   help="reproduce the r3 corpus (no rotation / thin-bar "
                        "occluder / repeated-grating aperture trap)")
    args = p.parse_args(argv)

    from tpufg.io.sinks import open_sink

    cuts = ([float(c) for c in str(args.cut_at).split(",")]
            if args.cut_at is not None else None)
    corpus = NaturalCorpus(args.width, args.height, args.seed,
                           cut_at=cuts, rich=not args.classic)
    grain_rng = None if args.no_grain else np.random.default_rng(args.seed)
    grain = 0.0 if args.no_grain else 3.0
    step = 0.5 if args.half_rate else 1.0
    n = args.frames * 2 - 1 if args.half_rate else args.frames
    sink = open_sink(args.output, args.width, args.height, fps=args.fps)
    for i in range(n):
        sink.write(corpus.frame(i * step, grain_rng=grain_rng, grain=grain))
    sink.close()
    print(f"wrote {n} frames to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
