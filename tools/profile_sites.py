"""Ablation profile of the config-3 sites kernel (dev tool, real chip).

motion_search_sites measures ~38 ms at 1088p r=16 — an order of magnitude
above a VPU-arithmetic-bound estimate, so the bottleneck is structural
(rolls / unaligned lane slices / VMEM traffic), not FLOPs.  This tool
times a local copy of the kernel with individual cost components ablated
(each ablation BREAKS correctness — it exists only to attribute time):

    python tools/profile_sites.py [--radius 16] [--n 10]

Ablations: full (= production, verified bitwise against the library
kernel first), no_sqrt, no_colsum (skip the 7-add x box-sum), no_rowsum,
no_roll (reuse an unshifted slice: removes the per-chunk lane roll AND
the unaligned k-slices), no_dd (skip subtract/square), dd_only (just the
roll + slice + subtract, no reduction), loads_only (DMA + band gather
per dy, no candidate math).
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufg.kernels.common import cdiv, round_up, use_interpret
from tpufg.kernels.motion import motion_search_sites, sites_tile_w

F32 = jnp.float32


def _kernel(prev_ref, curr_ref, out_ref, prev_s, curr_s, sem,
            *, W, TW, r, b, n_ch, pspan, cspan, dx_chunk, ablate):
    tg = pl.program_id(0)
    tx = pl.program_id(1)
    anchor = b // 2
    ext = TW + b - 1

    cdma = pltpu.make_async_copy(
        curr_ref.at[:, :, pl.ds(pl.multiple_of(tg * 8, 8), 8),
                    pl.ds(pl.multiple_of(tx * TW, 128), cspan)],
        curr_s, sem.at[0])
    pdma = pltpu.make_async_copy(
        prev_ref.at[:, :, pl.ds(pl.multiple_of(tg * 8, 8), 8),
                    pl.ds(pl.multiple_of(tx * TW, 128), pspan)],
        prev_s, sem.at[1])
    cdma.start()
    pdma.start()
    cdma.wait()
    pdma.wait()

    curr_c = [curr_s[c].reshape(8 * b, cspan)[:, 0:ext].astype(F32)
              for c in range(n_ch)]
    gj = jax.lax.broadcasted_iota(jnp.int32, (8 * b, ext), 1) \
        + (tx * TW - anchor)
    mask = ((gj >= 0) & (gj < W)).astype(F32)
    curr_all = jnp.concatenate(curr_c, axis=0)

    def dy_body(dy_idx, state):
        dyf = (dy_idx - r).astype(F32)
        rows = [prev_s[c, pl.ds(u + dy_idx, 1)].reshape(8, pspan)
                for c in range(n_ch) for u in range(b)]
        shifted = jnp.concatenate(rows, axis=0)
        if ablate == "loads_only":
            # consume the gather so it isn't DCE'd; skip all candidates
            bc, bx, by = state
            return (bc + shifted[0:8, 0:TW], bx, by)

        chunk = dx_chunk if dx_chunk else 1
        rows8 = 8 * b

        def dx_chunk_body(ch_idx, st):
            if ablate == "no_roll":
                rolled = shifted
            else:
                rolled = pltpu.roll(shifted, -(ch_idx * chunk), 1)
            for k in range(chunk):
                best_cost, best_dx, best_dy = st
                dxf = (ch_idx * chunk + k - r).astype(F32)
                if ablate == "no_roll":
                    sl = rolled[:, 0:ext]
                else:
                    sl = rolled[:, k:k + ext]
                if ablate == "no_dd":
                    dd = sl
                else:
                    dd = curr_all - sl
                    dd = dd * dd
                acc = dd[0:rows8]
                for c in range(1, n_ch):
                    acc = acc + dd[c * rows8:(c + 1) * rows8]
                if ablate == "dd_only":
                    upd = acc[0:8, 0:TW] < best_cost
                    best_cost = jnp.where(upd, acc[0:8, 0:TW], best_cost)
                    st = (best_cost, best_dx, best_dy)
                    continue
                if ablate == "no_sqrt":
                    dist = acc * mask
                else:
                    dist = jnp.sqrt(acc) * mask
                if ablate == "no_colsum":
                    colsum = dist[:, 0:TW]
                else:
                    colsum = dist[:, 0:TW]
                    for kx in range(1, b):
                        colsum = colsum + dist[:, kx:kx + TW]
                if ablate == "no_rowsum":
                    cost = colsum[0:8, :]
                else:
                    cost = colsum[0:8, :]
                    for u in range(1, b):
                        cost = cost + colsum[u * 8:u * 8 + 8, :]
                upd = cost < best_cost
                best_cost = jnp.where(upd, cost, best_cost)
                best_dx = jnp.where(upd, dxf, best_dx)
                best_dy = jnp.where(upd, dyf, best_dy)
                st = (best_cost, best_dx, best_dy)
            return st

        return jax.lax.fori_loop(0, (2 * r + 1) // chunk,
                                 dx_chunk_body, state)

    init = (jnp.full((8, TW), 1e10, F32),
            jnp.zeros((8, TW), F32),
            jnp.zeros((8, TW), F32))
    _, best_dx, best_dy = jax.lax.fori_loop(0, 2 * r + 1, dy_body, init)
    out_ref[0] = best_dx
    out_ref[1] = best_dy


@functools.partial(jax.jit, static_argnames=(
    "search_radius", "tile_w", "dx_chunk", "ablate"))
def sites_variant(prev, curr, search_radius=16, tile_w=1024, dx_chunk=3,
                  ablate="full"):
    b, g = 8, 16
    n_ch, H, W = prev.shape
    r = int(search_radius)
    anchor = b // 2
    m = H // g
    m_pad = round_up(m, 8)
    TW = min(tile_w, round_up(W, 128))
    n_tx = cdiv(W, TW)
    n_tg = m_pad // 8
    n_o = 2 * r + b
    cspan = round_up(TW + b - 1 + anchor, 128)
    pspan = round_up(TW + b - 1 + 2 * r, 128)
    w_cpad = (n_tx - 1) * TW + cspan
    w_ppad = (n_tx - 1) * TW + pspan

    lo = g // 2 - anchor
    cur4 = curr.astype(F32).reshape(n_ch, m, g, W)[:, :, lo:lo + b]
    cur4 = jnp.transpose(cur4, (0, 2, 1, 3))
    cur4 = jnp.pad(cur4, ((0, 0), (0, 0), (0, m_pad - m),
                          (anchor, w_cpad - W - anchor)))
    prev_p = jnp.pad(prev.astype(F32), ((0, 0), (r, r + g),
                                        (r + anchor, 0)), mode="edge")
    prev_p = jnp.pad(prev_p, ((0, 0), (0, 0),
                              (0, w_ppad - prev_p.shape[2])), mode="edge")
    bands = [prev_p[:, lo + o:lo + o + g * m:g, :][:, :m]
             for o in range(n_o)]
    pre4 = jnp.stack(bands, axis=1)
    pre4 = jnp.pad(pre4, ((0, 0), (0, 0), (0, m_pad - m), (0, 0)),
                   mode="edge")

    kernel = functools.partial(
        _kernel, W=W, TW=TW, r=r, b=b, n_ch=n_ch, pspan=pspan,
        cspan=cspan, dx_chunk=dx_chunk, ablate=ablate)
    out = pl.pallas_call(
        kernel,
        grid=(n_tg, n_tx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((2, 8, TW), lambda tg, tx: (0, tg, tx)),
        out_shape=jax.ShapeDtypeStruct((2, m_pad, n_tx * TW), F32),
        scratch_shapes=[
            pltpu.VMEM((n_ch, n_o, 8, pspan), F32),
            pltpu.VMEM((n_ch, b, 8, cspan), F32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=use_interpret(),
    )(pre4, cur4)
    return out[:, :m, :W]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--radius", type=int, default=16)
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--nch", type=int, default=3,
                    help="3 = the engine's alpha-skip path")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.random(
        (args.nch, args.height, args.width)).astype(np.float32))
    curr = jnp.asarray(np.roll(np.asarray(prev), (3, -2), (1, 2)))
    tw = sites_tile_w(args.radius, n_ch=args.nch)

    def sync(o):
        _ = np.asarray(o[0:1, 0:1, 0:1])

    # sanity: the local copy's full variant is bitwise the library kernel
    ref = np.asarray(motion_search_sites(
        prev, curr, search_radius=args.radius, tile_w=tw, dx_chunk=3))
    full = np.asarray(sites_variant(prev, curr, search_radius=args.radius,
                                    tile_w=tw, dx_chunk=3, ablate="full"))
    print(f"local copy bitwise vs library: {(ref == full).all()}",
          flush=True)

    for ablate in ("full", "no_sqrt", "no_colsum", "no_rowsum", "no_roll",
                   "no_dd", "dd_only", "loads_only"):
        try:
            t0 = time.perf_counter()
            out = sites_variant(prev, curr, search_radius=args.radius,
                                tile_w=tw, dx_chunk=3, ablate=ablate)
            sync(out)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.n):
                out = sites_variant(prev, curr, search_radius=args.radius,
                                    tile_w=tw, dx_chunk=3, ablate=ablate)
            sync(out)
            ms = (time.perf_counter() - t0) / args.n * 1e3
            print(f"{ablate:>11}: {ms:7.1f} ms  (compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report and keep ablating
            print(f"{ablate:>11}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
