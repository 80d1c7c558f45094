"""Tiled exhaustive block-matching motion search as a Pallas TPU kernel.

TPU-first redesign of the reference's ``motion.comp`` (shaders/motion.comp:16-57,
dispatched at src/frame_manager.cpp:323-344 with blockSize=8, searchRadius=16).

The GLSL evaluates, per output pixel, (2r+1)^2 candidate displacements, each
scored by an 8x8 block sum of per-pixel RGBA Euclidean distances — ~70k
texel-pair HBM reads per pixel on the GPU.  The TPU formulation inverts the
loop: for each candidate displacement d the per-pixel distance field

    D_d(q) = ||curr[q] - prev[q + d]||   (masked to 0 for out-of-image q)

is computed once over the whole tile from VMEM-resident data, and the block
cost is an 8x8 box-sum of D_d (the block anchored at p - blockSize/2 is
exactly a shifted box window).  Each tile's curr (+block halo) and prev
(+search+block halo) are DMA'd from HBM once — the ~70k reads/pixel collapse
into one halo load per tile plus VPU arithmetic.

Conventions (identical to the oracle, tpufg.ops.oracle.motion_search):
out-of-image block pixels contribute nothing (validity mask); the prev fetch
is clamp-to-edge (edge-replicated halo padding); argmin is strict ``<`` with
first-found-wins over the dy-outer/dx-inner scan from -r to r; cost
accumulation order matches the shader's y-outer/x-inner block loop, so in
f32 the cost fields — and therefore the argmin MV field — are bitwise equal
to the oracle's.

Grid: (row_tiles, col_tiles); candidate dy iterated with a
``lax.fori_loop`` (dynamic sublane slice into the prev halo), dx statically
unrolled (static lane offsets — Mosaic has no dynamic lane slicing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufg.kernels.common import cdiv, round_up, use_interpret

F32 = jnp.float32


def _motion_kernel(prev_ref, curr_ref, out_ref, prev_s, curr_s, sem,
                   *, H, W, TH, TW, r, b, n_ch, pr_rows, pr_cols,
                   cu_rows, cu_cols, exact_box, dx_chunk=0):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    anchor = b // 2
    ext = TW + b - 1  # block-pixel extent per axis (rows use TH + b - 1)
    ext_r = TH + b - 1

    row0 = pl.multiple_of(ty * TH, 8)
    col0 = pl.multiple_of(tx * TW, 128)

    cdma = pltpu.make_async_copy(
        curr_ref.at[:, pl.ds(row0, cu_rows), pl.ds(col0, cu_cols)],
        curr_s, sem.at[0])
    pdma = pltpu.make_async_copy(
        prev_ref.at[:, pl.ds(row0, pr_rows), pl.ds(col0, pr_cols)],
        prev_s, sem.at[1])
    cdma.start()
    pdma.start()
    cdma.wait()
    pdma.wait()

    # validity of block pixel q (global row ty*TH - anchor + i, col likewise):
    # out-of-image q is skipped by the shader (motion.comp:36-39) -> weight 0
    gi = jax.lax.broadcasted_iota(jnp.int32, (ext_r, ext), 0) + (ty * TH - anchor)
    gj = jax.lax.broadcasted_iota(jnp.int32, (ext_r, ext), 1) + (tx * TW - anchor)
    mask = ((gi >= 0) & (gi < H) & (gj >= 0) & (gj < W)).astype(F32)

    curr_c = [curr_s[c, 0:ext_r, 0:ext].astype(F32) for c in range(n_ch)]

    def dy_body(dy_idx, state):
        dyf = (dy_idx - r).astype(F32)
        # prev rows for block pixel i at displacement dy live at halo row
        # i + r + dy = i + dy_idx.  Mosaic only allows sublane-aligned
        # dynamic slices, so load an 8-aligned window and resolve the
        # residue with an 8-way static-slice switch.
        q8 = (dy_idx // 8) * 8
        jres = dy_idx % 8
        shifted = []
        for c in range(n_ch):
            win = prev_s[c, pl.ds(pl.multiple_of(q8, 8), ext_r + 8), :]
            shifted.append(jax.lax.switch(
                jres,
                [(lambda bb, kk=kk: bb[kk:kk + ext_r, :]) for kk in range(8)],
                win,
            ))

        # dx iterated in chunks: one dynamic lane roll per CHUNK (rolls
        # lower to multi-stage lane rotates — the dominant per-candidate
        # cost), static column slices resolve the within-chunk offset.
        # chunk size 3 divides 2r+1 for integer r.
        # (exact mode and large tiles keep chunk=1: Mosaic does not reuse
        # unrolled temporaries, and 3 unrolled candidates at 256^2 tiles
        # measured 17.8 MB of scoped VMEM vs the 16 MB limit)
        n_dx = 2 * r + 1
        if dx_chunk:
            chunk = dx_chunk
        else:
            chunk = (3 if (not exact_box and n_dx % 3 == 0
                           and TH * TW <= 128 * 128) else 1)

        def dx_chunk_body(ch_idx, st):
            rolled = [pltpu.roll(shifted[c], -(ch_idx * chunk), 1)
                      for c in range(n_ch)]
            for k in range(chunk):
                best_cost, best_dx, best_dy = st
                dxf = (ch_idx * chunk + k - r).astype(F32)
                d = curr_c[0] - rolled[0][:, k:k + ext]
                acc = d * d
                for c in range(1, n_ch):
                    d = curr_c[c] - rolled[c][:, k:k + ext]
                    acc = acc + d * d
                dist = jnp.sqrt(acc) * mask
                if exact_box:
                    # 8x8 box-sum in the shader's exact y-outer/x-inner
                    # order (motion.comp:33-34) -> f32-bitwise cost parity
                    cost = dist[0:TH, 0:TW]
                    for ky in range(b):
                        for kx in range(b):
                            if ky == 0 and kx == 0:
                                cost = dist[0:TH, 0:TW]
                            else:
                                cost = cost + dist[ky:ky + TH, kx:kx + TW]
                else:
                    # separable box-sum: same value to rounding, 2b adds
                    colsum = dist[0:ext_r, 0:TW]
                    for kx in range(1, b):
                        colsum = colsum + dist[0:ext_r, kx:kx + TW]
                    cost = colsum[0:TH, :]
                    for ky in range(1, b):
                        cost = cost + colsum[ky:ky + TH, :]
                upd = cost < best_cost  # strict <: first found wins
                best_cost = jnp.where(upd, cost, best_cost)
                best_dx = jnp.where(upd, dxf, best_dx)
                best_dy = jnp.where(upd, dyf, best_dy)
                st = (best_cost, best_dx, best_dy)
            return st

        return jax.lax.fori_loop(0, n_dx // chunk, dx_chunk_body, state)

    init = (
        jnp.full((TH, TW), 1e10, F32),   # motion.comp:25
        jnp.zeros((TH, TW), F32),        # motion.comp:24
        jnp.zeros((TH, TW), F32),
    )
    _, best_dx, best_dy = jax.lax.fori_loop(0, 2 * r + 1, dy_body, init)
    out_ref[0] = best_dx
    out_ref[1] = best_dy


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "search_radius", "tile_h", "tile_w",
                     "interpret", "exact_box", "dx_chunk"),
)
def motion_search_tiled(
    prev: jax.Array,
    curr: jax.Array,
    block_size: int = 8,
    search_radius: int = 16,
    tile_h: int = 128,
    tile_w: int = 128,
    interpret: bool | None = None,
    exact_box: bool = True,
    dx_chunk: int = 0,
) -> jax.Array:
    """Exhaustive block-matching motion estimation.

    ``prev``/``curr``: planar [C, H, W] f32 (bf16 inputs are computed in f32).
    Returns f32 [2, H, W]: plane 0 = dx, plane 1 = dy, pixel units (the
    best displacement, backward flow: curr[q] ~= prev[q + mv]).
    """
    if interpret is None:
        interpret = use_interpret()
    n_ch, H, W = prev.shape
    b = int(block_size)
    r = int(search_radius)
    anchor = b // 2

    TH = min(tile_h, round_up(H, 8))
    TW = min(tile_w, round_up(W, 128))
    n_ty = cdiv(H, TH)
    n_tx = cdiv(W, TW)

    # spans loaded per tile (rows sublane-aligned, cols lane-aligned)
    cu_rows = round_up(TH + b - 1, 8)
    cu_cols = round_up(TW + b - 1 + anchor, 128)
    # +8: the aligned-window/switch access pattern over-reads one sublane group
    pr_rows = round_up(TH + b - 1 + 2 * r + 8, 8)
    pr_cols = round_up(TW + b - 1 + 2 * r, 128)

    # pad curr so tile DMA starts (= tile origin in padded coords) are the
    # aligned tile corners: top/left margin = anchor
    curr_p = jnp.pad(
        curr.astype(F32),
        ((0, 0), (anchor, (n_ty - 1) * TH + cu_rows - H - anchor),
         (anchor, (n_tx - 1) * TW + cu_cols - W - anchor)),
    )
    # prev: clamp-to-edge => edge-replicated margin of (r + anchor)
    prev_p = jnp.pad(
        prev.astype(F32),
        ((0, 0), (r + anchor, (n_ty - 1) * TH + pr_rows - H - r - anchor),
         (r + anchor, (n_tx - 1) * TW + pr_cols - W - r - anchor)),
        mode="edge",
    )

    if dx_chunk and (2 * r + 1) % dx_chunk:
        raise ValueError(f"dx_chunk {dx_chunk} must divide 2r+1 = {2*r+1}")
    kernel = functools.partial(
        _motion_kernel, H=H, W=W, TH=TH, TW=TW, r=r, b=b, n_ch=n_ch,
        pr_rows=pr_rows, pr_cols=pr_cols, cu_rows=cu_rows, cu_cols=cu_cols,
        exact_box=exact_box, dx_chunk=dx_chunk,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_ty, n_tx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((2, TH, TW), lambda ty, tx: (0, ty, tx)),
        out_shape=jax.ShapeDtypeStruct((2, n_ty * TH, n_tx * TW), F32),
        scratch_shapes=[
            pltpu.VMEM((n_ch, pr_rows, pr_cols), F32),
            pltpu.VMEM((n_ch, cu_rows, cu_cols), F32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(prev_p, curr_p)
    return out[:, :H, :W]
