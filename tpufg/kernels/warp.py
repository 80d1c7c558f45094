"""Motion-compensated warp + blend as a Pallas TPU kernel.

TPU-first redesign of the reference's ``interpolate.comp``
(shaders/interpolate.comp:15-40, dispatched at src/frame_manager.cpp:351-366).
Per output pixel the shader samples prev at uv + m*(-t) and curr at
uv + m*(1-t) (bilinear, transparent-black outside [0,1]) and blends with
``mix(prev, curr, t)``.

Per-pixel dynamic gather does not exist on TPU (no dynamic lane addressing),
so the production kernel is **block-granular**: the MV field is one vector
per GxG block (the natural output granularity of the hierarchical pyramid
search; video codecs make the same choice).  Within a block the displacement
is constant, so the integer part becomes a dynamic window (sublane
aligned-window + 8-way switch for rows, dynamic lane roll for columns) and
the fractional part a fixed 4-tap bilinear blend — all vectorized over the
block.  The per-pixel parity path is the jnp oracle
(tpufg.ops.oracle.warp_blend); the engine uses it in "exact" mode.

Conventions match the oracle: MVs in pixel units, divided by the frame size
at warp time (units fix, reference bug §2.3.1); samples whose uv leaves
[0,1] return transparent black (interpolate.comp:17-21); in-range bilinear
taps clamp to edge (edge-replicated halo).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufg.kernels.common import cdiv, round_up, use_interpret

F32 = jnp.float32


def _warp_kernel(mv_ref, prev_ref, curr_ref, out_ref, prev_s, curr_s, sem,
                 *, H, W, TH, TW, G, halo_r, halo_c, ex_rows, ex_cols,
                 n_ch, t, r, single):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    row0 = pl.multiple_of(ty * TH, 8)
    col0 = pl.multiple_of(tx * TW, 128)

    pdma = pltpu.make_async_copy(
        prev_ref.at[:, pl.ds(row0, ex_rows), pl.ds(col0, ex_cols)],
        prev_s, sem.at[0])
    cdma = pltpu.make_async_copy(
        curr_ref.at[:, pl.ds(row0, ex_rows), pl.ds(col0, ex_cols)],
        curr_s, sem.at[1])
    pdma.start()
    cdma.start()
    pdma.wait()
    cdma.wait()

    nby = TH // G
    nbx = TW // G
    tf = F32(t)

    def sample_block(src_s, by, bx, off_x, off_y):
        """Bilinear GxG patch of one frame at constant block offset."""
        ix0 = jnp.floor(off_x)
        iy0 = jnp.floor(off_y)
        fx = off_x - ix0
        fy = off_y - iy0
        # ext-array row of tap row i (global tile0+by*G+i+iy0):
        ridx = by * G + halo_r + iy0.astype(jnp.int32)
        q8 = (ridx // 8) * 8
        jres = ridx % 8
        cshift = bx * G + halo_c + ix0.astype(jnp.int32)
        chans = []
        for c in range(n_ch):
            win = src_s[c, pl.ds(pl.multiple_of(q8, 8), G + 9), :]
            patch = jax.lax.switch(
                jres,
                [(lambda bb, kk=kk: bb[kk:kk + G + 1, :]) for kk in range(8)],
                win,
            )
            rolled = pltpu.roll(patch, -cshift, 1)
            c00 = rolled[0:G, 0:G]
            c10 = rolled[0:G, 1:G + 1]
            c01 = rolled[1:G + 1, 0:G]
            c11 = rolled[1:G + 1, 1:G + 1]
            top = c00 * (F32(1.0) - fx) + c10 * fx
            bot = c01 * (F32(1.0) - fx) + c11 * fx
            chans.append(top * (F32(1.0) - fy) + bot * fy)
        return chans

    def block_mask(by, bx, off_x, off_y):
        """Shader OOB test: sample uv outside [0,1] -> transparent black.

        uv = (p + 0.5 + off)/size; out of range iff p + off < -0.5 or
        > size - 0.5 in either axis.
        """
        gi = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0).astype(F32)
        gj = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1).astype(F32)
        py = gi + F32(ty * TH) + F32(by * G) + off_y
        px = gj + F32(tx * TW) + F32(bx * G) + off_x
        ok = ((px >= F32(-0.5)) & (px <= F32(W) - F32(0.5))
              & (py >= F32(-0.5)) & (py <= F32(H) - F32(0.5)))
        return ok.astype(F32)

    def by_body(by, _):
        def bx_body(bx, band):
            gby = ty * nby + by   # mv passed whole in SMEM (block specs
            gbx = tx * nbx + bx   # can't tile a ragged MV grid)
            mdx = jnp.clip(mv_ref[0, gby, gbx], -F32(r), F32(r))
            mdy = jnp.clip(mv_ref[1, gby, gbx], -F32(r), F32(r))
            if single:
                # pure warp: prev sampled at p + m (clamped at edges, no OOB
                # blanking — used by the pyramid's residual refinement)
                pcols = sample_block(prev_s, by, bx, mdx, mdy)
                placed = []
                for c in range(n_ch):
                    row = jnp.pad(pcols[c], ((0, 0), (0, TW - G)))
                    placed.append(pltpu.roll(row, bx * G, 1))
                return band + jnp.stack(placed, axis=0)
            pox = mdx * (-tf)            # prev offset (interpolate.comp:34)
            poy = mdy * (-tf)
            cox = mdx * (F32(1.0) - tf)  # curr offset (interpolate.comp:35)
            coy = mdy * (F32(1.0) - tf)
            pcols = sample_block(prev_s, by, bx, pox, poy)
            ccols = sample_block(curr_s, by, bx, cox, coy)
            pmask = block_mask(by, bx, pox, poy)
            cmask = block_mask(by, bx, cox, coy)
            placed = []
            for c in range(n_ch):
                blended = (pcols[c] * pmask * (F32(1.0) - tf)
                           + ccols[c] * cmask * tf)
                # place the GxG block into its band column via zero-pad +
                # dynamic lane roll (no dynamic lane stores on TPU)
                row = jnp.pad(blended, ((0, 0), (0, TW - G)))
                placed.append(pltpu.roll(row, bx * G, 1))
            return band + jnp.stack(placed, axis=0)

        band = jax.lax.fori_loop(
            0, nbx, bx_body, jnp.zeros((n_ch, G, TW), F32))
        out_ref[:, pl.ds(pl.multiple_of(by * G, 8), G), :] = (
            band.astype(out_ref.dtype))
        return 0

    jax.lax.fori_loop(0, nby, by_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("factor", "block", "search_radius", "tile_h", "tile_w",
                     "interpret", "single"),
)
def warp_blend_block(
    prev: jax.Array,
    curr: jax.Array,
    mv: jax.Array,
    factor: float = 0.5,
    block: int = 16,
    search_radius: int = 16,
    tile_h: int = 128,
    tile_w: int = 128,
    interpret: bool | None = None,
    single: bool = False,
) -> jax.Array:
    """Block-granular motion-compensated blend.

    ``prev``/``curr``: planar [C, H, W] f32; ``mv``: [2, H//block, W//block]
    f32 pixel-unit MVs (plane 0 = dx, 1 = dy), **forward flow** (the engine
    negates backward-flow MVs from motion search — reference bug #12).
    Returns [C, H, W] f32.  H and W must be multiples of ``block``.
    """
    if interpret is None:
        interpret = use_interpret()
    n_ch, H, W = prev.shape
    G = int(block)
    r = int(search_radius)
    if H % G or W % G:
        raise ValueError(f"frame {H}x{W} not a multiple of block {G}")

    TH = min(tile_h, round_up(H, 8))
    TW = min(tile_w, round_up(W, 128))
    if TH % G or TW % G:
        raise ValueError(f"tile {TH}x{TW} not a multiple of block {G}")
    n_ty = cdiv(H, TH)
    n_tx = cdiv(W, TW)

    halo_r = round_up(r + 2, 8)
    halo_c = round_up(r + 2, 8)
    ex_rows = round_up(TH + 2 * halo_r + 16, 8)
    ex_cols = round_up(TW + 2 * halo_c, 128)

    def pad_frame(x):
        return jnp.pad(
            x.astype(F32),
            ((0, 0), (halo_r, (n_ty - 1) * TH + ex_rows - H - halo_r),
             (halo_c, (n_tx - 1) * TW + ex_cols - W - halo_c)),
            mode="edge",
        )

    prev_p = pad_frame(prev)
    curr_p = pad_frame(curr)

    nby_t, nbx_t = TH // G, TW // G
    mv_p = jnp.pad(
        mv.astype(F32),
        ((0, 0), (0, n_ty * nby_t - mv.shape[1]),
         (0, n_tx * nbx_t - mv.shape[2])),
    )

    kernel = functools.partial(
        _warp_kernel, H=H, W=W, TH=TH, TW=TW, G=G, halo_r=halo_r,
        halo_c=halo_c, ex_rows=ex_rows, ex_cols=ex_cols, n_ch=n_ch,
        t=float(factor), r=r, single=single,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_ty, n_tx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((n_ch, TH, TW), lambda ty, tx: (0, ty, tx)),
        out_shape=jax.ShapeDtypeStruct((n_ch, n_ty * TH, n_tx * TW), F32),
        scratch_shapes=[
            pltpu.VMEM((n_ch, ex_rows, ex_cols), F32),
            pltpu.VMEM((n_ch, ex_rows, ex_cols), F32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(mv_p, prev_p, curr_p)
    return out[:, :H, :W]
