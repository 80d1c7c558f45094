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
                    # separable box-sum, rows-then-x: same value to
                    # rounding, 2b adds.  The y window first (sublane
                    # shifts — cheap), then the x window on the row-sum:
                    # the lane-unaligned shifted adds (the r4 profiler's
                    # dominant sites-kernel cost) run on the REDUCED
                    # array.  Association matches motion_search_sites and
                    # motion_search_lattice (bitwise family).
                    rowsum = dist[0:TH, :]
                    for ky in range(1, b):
                        rowsum = rowsum + dist[ky:ky + TH, :]
                    cost = rowsum[:, 0:TW]
                    for kx in range(1, b):
                        cost = cost + rowsum[:, kx:kx + TW]
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


def _sites_kernel(prev_ref, curr_ref, out_ref, prev_s, curr_s, sem,
                  *, W, TW, r, b, n_ch, m_real, grid, pspan, cspan,
                  n_tg, n_tx, dx_chunk):
    tg = pl.program_id(0)
    tx = pl.program_id(1)
    anchor = b // 2
    ext = TW + b - 1
    n_o = 2 * r + b          # prev row-band count (o = u + dy + r)

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

    # u-major stack: row u*8 + i is block row u of tile-group i's site
    curr_c = [curr_s[c].reshape(8 * b, cspan)[:, 0:ext].astype(F32)
              for c in range(n_ch)]

    # block-pixel validity: site rows are always in-image (the engine
    # pads to the lattice), so only columns mask (motion.comp:36-39)
    gj = jax.lax.broadcasted_iota(jnp.int32, (8 * b, ext), 1) \
        + (tx * TW - anchor)
    mask = ((gj >= 0) & (gj < W)).astype(F32)

    # channel-stacked curr [n_ch*b*8, ext]: one subtract/square per
    # candidate instead of n_ch (the per-channel add order below is
    # unchanged, so costs stay bitwise)
    curr_all = jnp.concatenate(curr_c, axis=0)

    def dy_body(dy_idx, state):
        dyf = (dy_idx - r).astype(F32)
        # prev rows for stacked block row (u, i): band o = u + dy_idx of
        # tile-group i — a dynamic index on the BAND axis (no sublane
        # arithmetic; bands are pre-stacked in XLA).  All channels stack
        # into ONE [n_ch*b*8, pspan] value so each chunk pays a single
        # lane roll — the dominant per-candidate cost — instead of n_ch.
        rows = [prev_s[c, pl.ds(u + dy_idx, 1)].reshape(8, pspan)
                for c in range(n_ch) for u in range(b)]
        shifted = jnp.concatenate(rows, axis=0)      # [n_ch*b*8, pspan]

        n_dx = 2 * r + 1
        chunk = dx_chunk if dx_chunk else 1
        rows8 = 8 * b

        def dx_chunk_body(ch_idx, st):
            rolled = pltpu.roll(shifted, -(ch_idx * chunk), 1)
            for k in range(chunk):
                best_cost, best_dx, best_dy = st
                dxf = (ch_idx * chunk + k - r).astype(F32)
                dd = curr_all - rolled[:, k:k + ext]
                dd = dd * dd                          # [n_ch*b*8, ext]
                # per-pixel channel sum in the original c=0..n_ch-1 order:
                # ((d0^2 + d1^2) + d2^2) + d3^2, bitwise the unstacked loop
                acc = dd[0:rows8]
                for c in range(1, n_ch):
                    acc = acc + dd[c * rows8:(c + 1) * rows8]
                dist = jnp.sqrt(acc) * mask
                # separable box-sum, rows-then-x (same association as the
                # tiled kernel's exact_box=False path): the b block rows
                # first — each a static ALIGNED [8, ext] u-slab in the
                # u-major stack — then the x window on the [8, ext]
                # row-sum.  The r4 ablation profiler attributed ~20 of
                # 35 ms to the old x-first box-sum's lane-unaligned
                # shifted adds over all 64 stacked rows; rows-first runs
                # that phase on 8 rows — an 8x cut of the dominant cost
                rowsum = dist[0:8, :]
                for u in range(1, b):
                    rowsum = rowsum + dist[u * 8:u * 8 + 8, :]
                cost = rowsum[:, 0:TW]
                for kx in range(1, b):
                    cost = cost + rowsum[:, kx:kx + TW]
                upd = cost < best_cost  # strict <: first found wins
                best_cost = jnp.where(upd, cost, best_cost)
                best_dx = jnp.where(upd, dxf, best_dx)
                best_dy = jnp.where(upd, dyf, best_dy)
                st = (best_cost, best_dx, best_dy)
            return st

        return jax.lax.fori_loop(0, n_dx // chunk, dx_chunk_body, state)

    init = (
        jnp.full((8, TW), 1e10, F32),    # motion.comp:25
        jnp.zeros((8, TW), F32),         # motion.comp:24
        jnp.zeros((8, TW), F32),
    )
    _, best_dx, best_dy = jax.lax.fori_loop(0, 2 * r + 1, dy_body, init)
    out_ref[0] = best_dx
    out_ref[1] = best_dy


def sites_tile_w(search_radius: int, n_ch: int = 4, b: int = 8,
                 budget_bytes: int = 12 << 20) -> int:
    """Largest sites-kernel tile width whose VMEM scratch fits the budget.

    The prev scratch scales as n_ch * (2r+b) * 8 * pspan f32s, so the
    tile_w that is optimal at the reference radius (1024 at r=16 — see
    the tuning record on motion_search_sites) blows past the ~16 MB VMEM
    budget at radii config.validate() still accepts (e.g. r=80 at factor
    0.5 needs ~27 MB at tile_w=1024).  Walk tile_w down in 128-lane steps
    until prev+curr scratch fit a conservative budget; 128 is the floor
    (it fits every radius the warp envelope allows, r <= 108 -> ~11 MB).
    """
    n_o = 2 * int(search_radius) + b
    for tw in range(1024, 127, -128):
        pspan = round_up(tw + b - 1 + 2 * int(search_radius), 128)
        cspan = round_up(tw + b - 1 + b // 2, 128)
        if n_ch * 8 * (n_o * pspan + b * cspan) * 4 <= budget_bytes:
            return tw
    return 128


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "search_radius", "grid", "tile_w",
                     "interpret", "dx_chunk"),
)
def motion_search_sites(
    prev: jax.Array,
    curr: jax.Array,
    block_size: int = 8,
    search_radius: int = 16,
    grid: int = 16,
    tile_w: int = 512,
    interpret: bool | None = None,
    dx_chunk: int = 3,
) -> jax.Array:
    """Exhaustive block matching evaluated only at the MV-lattice SITE ROWS.

    The engine consumes the exhaustive field subsampled to the ``grid``
    lattice (engine/pipeline.py config 3), yet the per-pixel kernel
    scores every row: rows outside a site's 8-row block window are pure
    waste (~2.2x at grid=16, b=8).  This kernel pre-compacts, in XLA, the
    b block rows of each lattice cell (u-major: stacked row u*8+i is
    block row u of tile-group i) and the 2r+b prev row-bands each cell
    can read (band o = u+dy, a dynamic BAND index in-kernel — no sublane
    arithmetic, the class that miscompiled earlier site kernels), then
    runs the same inverted candidate loop as motion_search_tiled.

    Distance values, separable box-sum association, scan order and
    tie-break are identical to ``motion_search_tiled(exact_box=False)``,
    so the output is bitwise that kernel's field at rows
    ``grid//2 + grid*k`` (tested).  Returns f32 [2, H//grid, W] (site
    rows, all columns — subsample columns ``grid//2::grid`` for the
    lattice).  Requires H % grid == 0, b == 8, grid == 16.

    Tuning record (1088p r=16, one v5e): tile_w 1024 + dx_chunk 3 =
    41 ms (the shipping config; 512 = 44).  Larger chunks would cut the
    dominant lane rolls but dx_chunk 11/33 at tile_w >= 512 crashes this
    environment's remote compile helper (3/3 HTTP 500), and chunk 11 at
    tile_w 256 compiles but measures 49 ms — narrower tiles cost more
    than the saved rolls.
    """
    if interpret is None:
        interpret = use_interpret()
    n_ch, H, W = prev.shape
    b = int(block_size)
    r = int(search_radius)
    g = int(grid)
    if b != 8 or g != 16:
        raise ValueError("motion_search_sites supports block_size=8, "
                         f"grid=16 (got b={b}, grid={g})")
    if H % g:
        raise ValueError(f"H={H} must be divisible by grid={g}")
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

    # curr block-row bands, u-major: [C, b(u), m_pad(g), W+margins].
    # Site row s = g/2 + g*k; block rows s-anchor .. s+b-1-anchor have
    # residues (g//2 - anchor) .. (+b-1) within each g-row cell.
    lo = g // 2 - anchor
    cur4 = curr.astype(F32).reshape(n_ch, m, g, W)[:, :, lo:lo + b]
    cur4 = jnp.transpose(cur4, (0, 2, 1, 3))              # [C, b, m, W]
    cur4 = jnp.pad(cur4, ((0, 0), (0, 0), (0, m_pad - m),
                          (anchor, w_cpad - W - anchor)))

    # prev row-bands: band o (= u + dy + r) of cell k is original row
    # g*k + lo + (o - r), clamp-to-edge via the padded frame
    prev_p = jnp.pad(prev.astype(F32), ((0, 0), (r, r + g),
                                        (r + anchor, 0)), mode="edge")
    prev_p = jnp.pad(prev_p, ((0, 0), (0, 0),
                              (0, w_ppad - prev_p.shape[2])), mode="edge")
    bands = [prev_p[:, lo + o:lo + o + g * m:g, :][:, :m]
             for o in range(n_o)]
    pre4 = jnp.stack(bands, axis=1)                       # [C, n_o, m, Wp]
    pre4 = jnp.pad(pre4, ((0, 0), (0, 0), (0, m_pad - m), (0, 0)),
                   mode="edge")

    if dx_chunk and (2 * r + 1) % dx_chunk:
        raise ValueError(f"dx_chunk {dx_chunk} must divide 2r+1 = {2*r+1}")
    kernel = functools.partial(
        _sites_kernel, W=W, TW=TW, r=r, b=b, n_ch=n_ch, m_real=m,
        grid=g, pspan=pspan, cspan=cspan, n_tg=n_tg, n_tx=n_tx,
        dx_chunk=dx_chunk)
    out = pl.pallas_call(
        kernel,
        grid=(n_tg, n_tx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((2, 8, TW), lambda tg, tx: (0, tg, tx)),
        out_shape=jax.ShapeDtypeStruct((2, m_pad, n_tx * TW), F32),
        scratch_shapes=[
            pltpu.VMEM((n_ch, n_o, 8, pspan), F32),
            pltpu.VMEM((n_ch, b, 8, cspan), F32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(pre4, cur4)
    return out[:, :m, :W]


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
