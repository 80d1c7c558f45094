"""Timing ladder of v2-head trunk variants at 4K (config 5b shape).

The v2 two-stage head lands 37.46 ms/pair at 4K->4K vs the 33.3 ms
(60 output fps) target (docs/DESIGN.md 5b r4).  Timing needs no trained
weights, so this tool measures candidate trunk restructurings with
random parameters THROUGH THE PRODUCTION STEP (make_interp_step, i32
wire, streamed quarter cache) and reports ms/pair for each; only a
variant that clears the budget is worth a training campaign.

Variants (monkeypatched rife._head2_raw; inference path only):
  v1        single-stage reference point (the 60 fps incumbent)
  v2        shipping two-stage trunk (baseline)
  nowarp    stage-2 consumes UNWARPED quarter frames (bounds the coarse
            block-warp's in-context cost; quality would need retraining
            and likely loses large motion)
  warp8     coarse warp at 8-px blocks on the quarter frame (half the
            band count; 32-px full-res granularity)
  nof4      stage-2 input without the shared f4 features (13 ch instead
            of 77: bounds r_in's cost share)
  narrow48  stage-2 convs at width 48 (r_in/r_body/r_head)
  s16       stage 1 at 1/16 (extra stride-2 enc4; two _up2 hops)

    python tools/v2_speed_ladder.py [-n 10] [--only v2,warp8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _variant_params(rng_key, kind, hidden=64):
    import jax
    import jax.numpy as jnp

    from tpufg.models import rife

    params = rife.init_params2(rng_key, hidden)
    h = hidden
    kinds = set(kind.split("+"))

    def he(k, shape):
        fan_in = int(np.prod(shape[1:]))
        return jax.random.normal(k, shape, jnp.float32) * np.sqrt(
            2.0 / fan_in)

    ks = jax.random.split(jax.random.fold_in(rng_key, 1), 4)
    if "siam" in kinds:
        # per-frame encoder: enc1 4ch -> 32 @1/2, enc2 32 -> 32 @1/4;
        # the pair features are the concat (64, same as v2's f4 width)
        params["enc1"] = {"w": he(ks[3], (32, 4, 3, 3)),
                          "b": jnp.zeros((32,), jnp.float32)}
        params["enc2"] = {"w": he(jax.random.fold_in(ks[3], 1),
                                  (32, 32, 3, 3)),
                          "b": jnp.zeros((32,), jnp.float32)}
    if "nof4" in kinds:
        params["r_in"] = {"w": he(ks[0], (h, 13, 3, 3)),
                          "b": jnp.zeros((h,), jnp.float32)}
    if "narrow48" in kinds:
        hn = 48
        params["r_in"] = {"w": he(ks[0], (hn, h + 13, 3, 3)),
                          "b": jnp.zeros((hn,), jnp.float32)}
        params["r_body"] = {"w": he(ks[1], (hn, hn, 3, 3)),
                            "b": jnp.zeros((hn,), jnp.float32)}
        params["r_head"] = {"w": jnp.zeros((5, hn, 3, 3), jnp.float32),
                            "b": jnp.zeros((5,), jnp.float32)}
    if "s16" in kinds:
        params["enc4"] = {"w": he(ks[0], (h, h, 3, 3)),
                          "b": jnp.zeros((h,), jnp.float32)}
    return params


def _make_head2(kind):
    """Variant _head2_raw with the same signature as rife's."""
    import jax
    import jax.numpy as jnp

    from tpufg.models import rife

    F32 = jnp.float32

    kinds = set(kind.split("+"))

    def head2(params, prev, curr, dtype=F32, fast=False, ft=False,
              p4=None, c4=None):
        assert fast and not ft, "ladder variants are inference-only"
        from tpufg.kernels.conv import conv3x3_s2
        if "siam" in kinds:
            # siamese per-frame encoder, cached between steps: in the
            # streaming engine prev's features are LAST step's curr
            # features (the q_feed idiom), so the per-step cost is ONE
            # frame's encoder.  The ladder simulates the cache with a
            # stand-in roll of curr's features (timing-only).
            h1c = jax.nn.relu(conv3x3_s2(curr[0].astype(F32),
                                         params["enc1"]["w"],
                                         params["enc1"]["b"],
                                         compute_dtype=dtype)[None])
            f4c = jax.nn.relu(rife._conv(h1c, params["enc2"]["w"],
                                         params["enc2"]["b"], 2, dtype))
            f4p = jnp.roll(f4c, 3, -1)      # cached-prev stand-in
            f4 = jnp.concatenate([f4p, f4c], axis=1)
        else:
            x = jnp.concatenate([prev, curr], axis=1).astype(F32)
            h1 = jax.nn.relu(conv3x3_s2(x[0], params["enc1"]["w"],
                                        params["enc1"]["b"],
                                        compute_dtype=dtype)[None])
            f4 = jax.nn.relu(rife._conv(h1, params["enc2"]["w"],
                                        params["enc2"]["b"], 2, dtype))
        f8 = jax.nn.relu(rife._conv(f4, params["enc3"]["w"],
                                    params["enc3"]["b"], 2, dtype))
        if "s16" in kinds:
            f8 = jax.nn.relu(rife._conv(f8, params["enc4"]["w"],
                                        params["enc4"]["b"], 2, dtype))
        g = jax.nn.relu(rife._conv(f8, params["c_body"]["w"],
                                   params["c_body"]["b"], 1, dtype))
        out0 = rife._conv(g, params["c_head"]["w"], params["c_head"]["b"])
        out0_4 = rife._up2(out0)
        if "s16" in kinds:
            out0_4 = rife._up2(out0_4)
        if p4 is None:
            p4 = rife._down4_mean(prev.astype(F32))
        if c4 is None:
            c4 = rife._down4_mean(curr.astype(F32))
        if "nowarp" in kinds:
            p4w, c4w = p4, c4
        else:
            from tpufg.kernels.warp_matmul import warp_blend_matmul
            blk = 8 if "warp8" in kinds else 4
            off = blk // 2
            hq = p4.shape[2]
            hpad = (-hq) % blk
            lat = out0_4[0, :, off::blk, off::blk]
            fp4 = jnp.round(lat[0:2])
            fc4 = jnp.round(lat[2:4])
            p4b, c4b = p4, c4
            if hpad:  # 1/4-res rows not a blk multiple (e.g. 540 @ blk 8)
                p4b = jnp.pad(p4, ((0, 0), (0, 0), (0, hpad), (0, 0)),
                              mode="edge")
                c4b = jnp.pad(c4, ((0, 0), (0, 0), (0, hpad), (0, 0)),
                              mode="edge")
                nby = p4b.shape[2] // blk
                rpad = nby - fp4.shape[1]
                if rpad:
                    fp4 = jnp.pad(fp4, ((0, 0), (0, rpad), (0, 0)),
                                  mode="edge")
                    fc4 = jnp.pad(fc4, ((0, 0), (0, rpad), (0, 0)),
                                  mode="edge")
            kw = dict(single=True, block=blk, search_radius=4, dtype=dtype,
                      integer_offsets=True)
            p4w = warp_blend_matmul(p4b[0], p4b[0], fp4, **kw)[None, :, :hq]
            c4w = warp_blend_matmul(c4b[0], c4b[0], fc4, **kw)[None, :, :hq]
        if "nof4" in kinds:
            r = jnp.concatenate([p4w, c4w, out0_4], axis=1)
        else:
            r = jnp.concatenate([f4, p4w, c4w, out0_4], axis=1)
        r = jax.nn.relu(rife._conv(r, params["r_in"]["w"],
                                   params["r_in"]["b"], 1, dtype))
        r = jax.nn.relu(rife._conv(r, params["r_body"]["w"],
                                   params["r_body"]["b"], 1, dtype))
        res = rife._conv(r, params["r_head"]["w"], params["r_head"]["b"])
        return out0_4 + res, out0

    return head2


def time_step(tag, model_params, n, w=3840, h=2160):
    import jax
    import jax.numpy as jnp

    from tpufg.config import EngineConfig, resolve_sizes
    from tpufg.engine.pipeline import make_interp_step, make_q_init

    cfg = resolve_sizes(EngineConfig(
        input_width=w, input_height=h, output_width=w,
        output_height=h, dtype="bf16", motion_mode="learned"))
    step_raw = make_interp_step(cfg, wire="i32", model_params=model_params,
                                motion_skip_alpha=True, q_feed=True)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (h + 32, w + 32, 4), dtype=np.uint8)
    base[..., 3] = 255

    def as_i32(x):
        return jnp.asarray(
            np.ascontiguousarray(x).view(np.int32).reshape(x.shape[:2]))

    pairs = []
    for i in range(n + 4):
        j = i % 16
        pairs.append((as_i32(base[j:h + j, 2 * j:w + 2 * j]),
                      as_i32(base[j + 1:h + 1 + j, 2 * j + 2:w + 2 + 2 * j])))

    from tpufg.models import rife
    if rife.is_v2(model_params) or rife.is_v3(model_params):
        qinit = make_q_init(cfg, model_params=model_params)
        qh = {"q": None}

        def step(p, c):
            if qh["q"] is None:
                qh["q"] = qinit(p)
            *outs, qh["q"] = step_raw(p, c, qh["q"])
            return tuple(outs)
    else:
        step = step_raw

    def sync(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        _ = np.asarray(leaf[tuple(slice(0, 1) for _ in leaf.shape)])

    it = iter(pairs)
    sync(step(*next(it)))
    t0 = time.perf_counter()
    last = None
    for _ in range(n):
        last = step(*next(it))
    sync(last)
    dt = time.perf_counter() - t0
    ms = dt / n * 1e3
    print(f"| {tag} | {ms:.2f} | {2 * n / dt:.0f} |", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=10)
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names")
    ap.add_argument("--width", type=int, default=3840)
    ap.add_argument("--height", type=int, default=2160)
    args = ap.parse_args()
    sel = ([s.strip() for s in args.only.split(",")] if args.only
           else ["v1", "v2", "nowarp", "warp8", "nof4", "narrow48", "s16"])

    import jax

    from tpufg.models import rife
    key = jax.random.PRNGKey(0)
    print("| variant (learned id-size, random weights) | ms/pair "
          "| output fps |")
    print("|---|---|---|")
    orig = rife._head2_raw
    for kind in sel:
        try:
            if kind == "v1":
                time_step(kind, rife.init_params(key), args.n,
                          args.width, args.height)
            elif kind == "v2":
                rife._head2_raw = orig
                time_step(kind, rife.init_params2(key), args.n,
                          args.width, args.height)
            else:
                rife._head2_raw = _make_head2(kind)
                time_step(kind, _variant_params(key, kind), args.n,
                          args.width, args.height)
        except Exception as e:
            print(f"| {kind} | FAILED {type(e).__name__}: {str(e)[:90]} "
                  f"| — |", flush=True)
        finally:
            rife._head2_raw = orig


if __name__ == "__main__":
    main()
