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
    """One shot: background + two occluding movers, all subpixel."""

    def __init__(self, seed, w, h):
        rng = np.random.default_rng(seed)
        self.w, self.h = w, h
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

    def render(self, t, grain_rng=None, grain=3.0):
        h, w = self.h, self.w
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        # background: pan + slow zoom about the frame center
        s = 1.0 + self.zoom * t
        by = (ys - h / 2) * s + h / 2 + self.v_bg[0] * t
        bx = (xs - w / 2) * s + w / 2 + self.v_bg[1] * t
        lum_bg = _sample_noise(self.bg, by, bx, 4)

        def obj(lat, c, r, v, octs):
            cy = c[0] + v[0] * t
            cx = c[1] + v[1] * t
            # textured soft-edged disk, texture locked to the object
            d2 = (ys - cy) ** 2 + (xs - cx) ** 2
            alpha = np.clip((r - np.sqrt(d2)) / 1.5, 0.0, 1.0)
            lum = _sample_noise(lat, ys - cy, xs - cx, octs)
            return lum, alpha

        l1, a1 = obj(self.ob1, self.c1, self.r1, self.v1, 3)
        l2, a2 = obj(self.ob2, self.c2, self.r2, self.v2, 3)
        lum = lum_bg * (1 - a1) + (0.3 + 0.7 * l1) * a1
        lum = lum * (1 - a2) + (0.15 + 0.7 * l2) * a2

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
    """Frame factory with an optional scene cut."""

    def __init__(self, w=640, h=384, seed=1, cut_at=None):
        self.a = Scene(seed, w, h)
        self.b = Scene(seed + 1000, w, h) if cut_at is not None else None
        self.cut_at = cut_at

    def frame(self, t, grain_rng=None, grain=3.0):
        sc = (self.b if self.cut_at is not None and t >= self.cut_at
              else self.a)
        return sc.render(t, grain_rng=grain_rng, grain=grain)


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
    p.add_argument("--cut-at", type=float, default=None,
                   help="scene-cut time (in frame units)")
    args = p.parse_args(argv)

    from tpufg.io.sinks import open_sink

    corpus = NaturalCorpus(args.width, args.height, args.seed,
                           cut_at=args.cut_at)
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
