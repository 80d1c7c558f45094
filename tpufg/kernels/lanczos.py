"""Fused separable Lanczos resample as a Pallas TPU kernel.

TPU-first redesign of the reference's ``scale.comp`` (shaders/scale.comp:1-61,
dispatched at src/scaler.cpp:344-362).  The GLSL computes, per output pixel, a
6x6 tap stencil with joint renormalization over in-bounds taps.  Because taps
are skipped per-axis and the 2-D weight is a separable product
``lanczos(dx)*lanczos(dy)`` (scale.comp:41), the whole operation factors
exactly into two 1-D resamples with per-axis normalized weights:

    out = B_y @ img @ B_x

where ``B_x`` [S_x, T_ox] and ``B_y`` [T_oy, S_y] are banded weight matrices
(6 non-zeros per output row/column, renormalized per axis, zeroed for
out-of-range taps).  That turns a gather-heavy stencil into two MXU matmuls
per output tile — the idiomatic TPU formulation (the 16x16 Vulkan workgroup
grid becomes a Pallas grid of (channel, row-tile, col-tile)).

Each grid step DMAs the input span it needs (rows [row_start, row_start+S_y),
cols [col_start, col_start+S_x)) from HBM into VMEM with scalar-prefetched
per-tile starts — spans overlap by the 6-tap halo, so BlockSpec indexing
cannot express them.  Numerical contract: matches the f32 oracle
(tpufg.ops.oracle.lanczos_scale) to ~1e-6 relative in f32 and SSIM >= 0.999
in bf16 (the bit-exact path is the oracle itself; see ops/oracle.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufg.kernels.common import cdiv, pick_tile, round_up, use_interpret

F32 = jnp.float32
_NP_PI = np.float32(3.14159265359)  # scale.comp:18


def _np_lanczos_weight(x: np.ndarray, a: int) -> np.ndarray:
    """Host-side numpy mirror of ops.oracle.lanczos_weight (f32).

    Must stay numpy (not jnp): it runs while tracing under jit, and staged
    ops would leak tracers into the cached plan.
    """
    x = x.astype(np.float32)
    px = _NP_PI * x
    with np.errstate(invalid="ignore", divide="ignore"):
        w = np.float32(a) * np.sin(px) * np.sin(px / np.float32(a)) / (px * px)
    return np.where(x == 0, np.float32(1.0), w).astype(np.float32)


def _np_axis_taps(in_size: int, out_size: int, a: int):
    """Host-side numpy mirror of ops.oracle._axis_taps (f32)."""
    out_idx = np.arange(out_size, dtype=np.float32)
    uv = (out_idx + np.float32(0.5)) / np.float32(out_size)
    pixel_pos = uv * np.float32(in_size) - np.float32(0.5)
    fl = np.floor(pixel_pos)
    frac = (pixel_pos - fl).astype(np.float32)
    start = fl - np.float32(a - 1)
    k = np.arange(2 * a, dtype=np.float32)
    coords = start[:, None] + k[None, :]
    deltas = (k[None, :] - frac[:, None] - np.float32(a - 1)).astype(np.float32)
    valid = (coords >= 0) & (coords <= np.float32(in_size - 1))
    return coords.astype(np.int32), deltas, valid


@functools.lru_cache(maxsize=64)
def _axis_plan(in_size: int, out_size: int, a: int, tile_out: int, lane: int):
    """Banded weight blocks + per-tile span starts for one axis.

    Returns (starts [n_tiles] int32, bands [n_tiles, span, tile_out] f32 np,
    span, n_tiles, padded_in, pad_left).  ``bands[t] @`` an input span
    reproduces the
    oracle's per-axis weighted tap sum with per-axis normalization (exactly
    the joint normalization, since tap validity is per-axis independent).

    Span starts are aligned down to ``lane`` (Mosaic requires HBM slice
    offsets divisible by the memref tiling: 8 for sublanes, 128 for lanes);
    the span is widened to absorb the alignment slack.
    """
    n_tiles = cdiv(out_size, tile_out)

    # per-output-pixel taps, same math as the oracle (numpy mirror)
    coords, deltas, valid = _np_axis_taps(in_size, out_size, a)
    w = _np_lanczos_weight(deltas, a)
    w = np.where(valid, w, np.float32(0.0)).astype(np.float32)
    wsum = np.sum(w, axis=1, keepdims=True, dtype=np.float32)
    w = (w / np.maximum(wsum, np.float32(1e-30))).astype(np.float32)

    # span: widest input window any tile needs
    span_needed = 0
    wants = np.zeros((n_tiles,), np.int64)
    for t in range(n_tiles):
        lo = t * tile_out
        hi = min(out_size, lo + tile_out)
        first = int(coords[lo, 0])
        last = int(coords[hi - 1, 2 * a - 1])
        wants[t] = first
        span_needed = max(span_needed, last - first + 1)

    # Mosaic needs slice starts divisible by `lane`.  If the desired tile
    # starts are all congruent mod lane (uniform phase — any integer or
    # lane-commensurate ratio), shift the whole image with a left pad so
    # they land exactly on lane boundaries; otherwise align down and eat up
    # to lane-1 columns of slack in the span.
    rems = {int(x % lane) for x in wants}
    pad_left = (lane - next(iter(rems))) % lane if len(rems) == 1 else 0
    slack = 0 if len(rems) == 1 else lane
    in_pad = round_up(in_size + pad_left, lane)
    span = min(round_up(span_needed + 2 + slack, lane), in_pad)

    starts = np.zeros((n_tiles,), np.int32)
    bands = np.zeros((n_tiles, span, tile_out), np.float32)
    for t in range(n_tiles):
        lo = t * tile_out
        hi = min(out_size, lo + tile_out)
        start = max(0, min(int(wants[t]) + pad_left, in_pad - span))
        start = (start // lane) * lane  # alignment for Mosaic HBM slicing
        starts[t] = start
        for j in range(lo, hi):
            for k in range(2 * a):
                c = int(coords[j, k])
                if 0 <= c < in_size and w[j, k] != 0.0:
                    bands[t, c + pad_left - start, j - lo] += w[j, k]
    return starts, bands, span, n_tiles, in_pad, pad_left


def _scale_kernel(row_start_ref, col_start_ref, img_ref, by_ref, bx_ref,
                  out_ref, span_ref, sem, *, span_y, span_x, compute_dtype,
                  n_c, n_ty, n_tx):
    c = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)

    # double-buffered span DMA: start the NEXT grid step's load while
    # computing this one's (the kernel is DMA-bound; scratch and
    # semaphores persist across grid steps)
    def start_dma(ci, tyi, txi, slot):
        rs = pl.multiple_of(row_start_ref[tyi], 8)
        cs = pl.multiple_of(col_start_ref[txi], 128)
        pltpu.make_async_copy(
            img_ref.at[ci, pl.ds(rs, span_y), pl.ds(cs, span_x)],
            span_ref.at[slot], sem.at[slot],
        ).start()

    lin = (c * n_ty + ty) * n_tx + tx
    slot = jax.lax.rem(lin, 2)
    n_total = n_c * n_ty * n_tx

    @pl.when(lin == 0)
    def _():
        start_dma(c, ty, tx, slot)

    @pl.when(lin + 1 < n_total)
    def _():
        nxt = lin + 1
        ntx = jax.lax.rem(nxt, n_tx)
        nty = jax.lax.rem(nxt // n_tx, n_ty)
        nc = nxt // (n_tx * n_ty)
        start_dma(nc, nty, ntx, 1 - slot)

    pltpu.make_async_copy(
        img_ref.at[c, pl.ds(pl.multiple_of(row_start_ref[ty], 8), span_y),
                   pl.ds(pl.multiple_of(col_start_ref[tx], 128), span_x)],
        span_ref.at[slot], sem.at[slot],
    ).wait()
    span_ref = span_ref.at[slot]
    # both operands must keep >= 8-bit-code precision: a single-pass bf16
    # matmul costs +-1/2 uint8 code, and bf16-rounded WEIGHTS carry a
    # systematic per-output-pixel gain error (their per-axis sum lands
    # ~2^-9 off 1) that the SSIM gate catches on smooth natural content
    # (r3: 0.9987 measured with split-image/bf16-weight passes).  Each
    # pass therefore splits BOTH operands into bf16 hi+lo halves and
    # takes the three significant products (hi*hi + hi*lo + lo*hi, f32
    # accumulate — ~2^-18 accuracy; Mosaic has no Precision.HIGH); the
    # kernel is DMA-bound, so the third MXU pass is largely hidden.
    if compute_dtype == jnp.bfloat16 and span_ref.dtype == jnp.float32:
        def split_dot(a_f32, b_f32, swap=False):
            ah = a_f32.astype(jnp.bfloat16)
            al = (a_f32 - ah.astype(F32)).astype(jnp.bfloat16)
            bh = b_f32.astype(jnp.bfloat16)
            bl = (b_f32 - bh.astype(F32)).astype(jnp.bfloat16)
            if swap:
                return (jnp.dot(bh, ah, preferred_element_type=F32)
                        + jnp.dot(bl, ah, preferred_element_type=F32)
                        + jnp.dot(bh, al, preferred_element_type=F32))
            return (jnp.dot(ah, bh, preferred_element_type=F32)
                    + jnp.dot(ah, bl, preferred_element_type=F32)
                    + jnp.dot(al, bh, preferred_element_type=F32))

        tmp = split_dot(span_ref[:], bx_ref[0])           # [S_y, T_ox]
        out = split_dot(tmp, by_ref[0], swap=True)        # [T_oy, T_ox]
    else:
        prec = (jax.lax.Precision.HIGHEST
                if span_ref.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        # horizontal pass: [S_y, S_x] @ [S_x, T_ox] -> [S_y, T_ox]
        tmp = jnp.dot(span_ref[:], bx_ref[0], preferred_element_type=F32,
                      precision=prec)
        # vertical pass: [T_oy, S_y] @ [S_y, T_ox] -> [T_oy, T_ox]
        out = jnp.dot(by_ref[0], tmp, preferred_element_type=F32,
                      precision=prec)
    out_ref[0] = out.astype(out_ref.dtype)


def _scale_packed_kernel(row_start_ref, col_start_ref, img_ref, by_ref,
                         bx_ref, out_ref, span_ref, sem, *, span_y, span_x,
                         compute_dtype, n_c, n_ty, n_tx, add_half):
    """Fused scale + UNORM8 quantize + channel pack.

    One grid step computes ALL channels of an output tile (one span DMA
    covers the channel stack), quantizes each to its uint8 code, and packs
    the four codes into one int32 lane (r | g<<8 | b<<16 | a<<24) — the
    step's output is final wire bytes, so the big f32 intermediate and the
    strided channel transpose never touch HBM (the "touch HBM once"
    north-star item for the scale path).
    """
    ty = pl.program_id(0)
    tx = pl.program_id(1)

    def start_dma(tyi, txi, slot):
        rs = pl.multiple_of(row_start_ref[tyi], 8)
        cs = pl.multiple_of(col_start_ref[txi], 128)
        pltpu.make_async_copy(
            img_ref.at[:, pl.ds(rs, span_y), pl.ds(cs, span_x)],
            span_ref.at[slot], sem.at[slot],
        ).start()

    lin = ty * n_tx + tx
    slot = jax.lax.rem(lin, 2)

    @pl.when(lin == 0)
    def _():
        start_dma(ty, tx, slot)

    @pl.when(lin + 1 < n_ty * n_tx)
    def _():
        nxt = lin + 1
        start_dma(nxt // n_tx, jax.lax.rem(nxt, n_tx), 1 - slot)

    pltpu.make_async_copy(
        img_ref.at[:, pl.ds(pl.multiple_of(row_start_ref[ty], 8), span_y),
                   pl.ds(pl.multiple_of(col_start_ref[tx], 128), span_x)],
        span_ref.at[slot], sem.at[slot],
    ).wait()
    sp = span_ref.at[slot]

    def one_channel(ci):
        ch = sp[ci]
        if compute_dtype == jnp.bfloat16 and ch.dtype == jnp.float32:
            # split-dot: same math as _scale_kernel (see rationale there
            # — both operands split, three significant products)
            def split_dot(a_f32, b_f32, swap=False):
                ah = a_f32.astype(jnp.bfloat16)
                al = (a_f32 - ah.astype(F32)).astype(jnp.bfloat16)
                bh = b_f32.astype(jnp.bfloat16)
                bl = (b_f32 - bh.astype(F32)).astype(jnp.bfloat16)
                if swap:
                    return (jnp.dot(bh, ah, preferred_element_type=F32)
                            + jnp.dot(bl, ah, preferred_element_type=F32)
                            + jnp.dot(bh, al, preferred_element_type=F32))
                return (jnp.dot(ah, bh, preferred_element_type=F32)
                        + jnp.dot(ah, bl, preferred_element_type=F32)
                        + jnp.dot(al, bh, preferred_element_type=F32))

            tmp = split_dot(ch, bx_ref[0])
            out = split_dot(tmp, by_ref[0], swap=True)
        else:
            prec = (jax.lax.Precision.HIGHEST if ch.dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT)
            tmp = jnp.dot(ch, bx_ref[0], preferred_element_type=F32,
                          precision=prec)
            out = jnp.dot(by_ref[0], tmp, preferred_element_type=F32,
                          precision=prec)
        if add_half:
            out = out + F32(0.5)
        return jnp.round(
            jnp.clip(out, F32(0.0), F32(1.0)) * F32(255.0)).astype(jnp.int32)

    packed = one_channel(0)
    for ci in range(1, n_c):
        packed = packed | (one_channel(ci) << (8 * ci))
    out_ref[...] = packed


def lanczos_scale_packed(
    img: jax.Array,
    out_h: int,
    out_w: int,
    a: int = 3,
    tile_out: int = 256,
    interpret: bool | None = None,
    compute_dtype=None,
    raw_i32: bool = False,
) -> jax.Array:
    """Lanczos resample fused with UNORM8 quantization and channel packing.

    ``img``: [4, H, W] f32/bf16 planar.  Returns uint8 [out_h, out_w, 4] —
    the same bytes as ``planar_to_frames(lanczos_scale_fast(...))`` (the
    int32 lanes bitcast little-endian, channel 0 in byte 0) without the
    f32 intermediate or the strided transpose ever reaching HBM.

    ``raw_i32``: return the packed int32 [out_h, out_w] wire directly.
    The final i32->u8 bitcast is a real T(8,128)->T(4,128)(4,1) relayout
    on TPU (~0.16 ms per 4K frame); the host views the same bytes as
    uint8 [H, W, 4] for free.
    """
    if interpret is None:
        interpret = use_interpret()
    c, in_h, in_w = img.shape
    if c != 4:
        raise ValueError(f"packed scale needs 4 channels, got {c}")
    dtype = img.dtype
    if compute_dtype is None:
        compute_dtype = dtype

    t_ox = pick_tile(out_w, 128, min(tile_out, round_up(out_w, 128)))
    t_oy = pick_tile(out_h, 8, min(tile_out, round_up(out_h, 8)))
    col_starts, bx, span_x, n_tx, in_wp, pad_l = _axis_plan(
        in_w, out_w, a, t_ox, 128)
    row_starts, by_t, span_y, n_ty, in_hp, pad_t = _axis_plan(
        in_h, out_h, a, t_oy, 8)
    by = np.transpose(by_t, (0, 2, 1)).copy()

    center = compute_dtype == jnp.bfloat16 and dtype == jnp.float32
    # bands stay f32: the kernel's split-dot halves them itself (their
    # bf16 rounding alone costs the 0.999-SSIM gate on smooth content)
    band_dtype = dtype
    if center:
        img = img - jnp.asarray(0.5, dtype)
    img_p = jnp.pad(img, ((0, 0), (pad_t, in_hp - in_h - pad_t),
                          (pad_l, in_wp - in_w - pad_l)))
    out_hp, out_wp = n_ty * t_oy, n_tx * t_ox

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_ty, n_tx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # img (HBM)
            pl.BlockSpec((1, t_oy, span_y), lambda ty, tx, *_: (ty, 0, 0)),
            pl.BlockSpec((1, span_x, t_ox), lambda ty, tx, *_: (tx, 0, 0)),
        ],
        out_specs=pl.BlockSpec((t_oy, t_ox), lambda ty, tx, *_: (ty, tx)),
        scratch_shapes=[
            pltpu.VMEM((2, c, span_y, span_x), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _scale_packed_kernel, span_y=span_y, span_x=span_x,
        compute_dtype=compute_dtype, n_c=c, n_ty=n_ty, n_tx=n_tx,
        add_half=center,
    )
    packed = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_hp, out_wp), jnp.int32),
        interpret=interpret,
    )(
        jnp.asarray(row_starts),
        jnp.asarray(col_starts),
        img_p,
        jnp.asarray(by, dtype=band_dtype),
        jnp.asarray(bx, dtype=band_dtype),
    )
    if (out_hp, out_wp) != (out_h, out_w):
        packed = packed[:out_h, :out_w]  # uncommon: no divisor tile fits
    if raw_i32:
        return packed
    return jax.lax.bitcast_convert_type(packed, jnp.uint8)


def lanczos_scale_fast(
    img: jax.Array,
    out_h: int,
    out_w: int,
    a: int = 3,
    tile_out: int = 256,
    interpret: bool | None = None,
    compute_dtype=None,
) -> jax.Array:
    """Lanczos-``a`` resample of a planar frame stack.

    ``img``: [C, H, W] f32 or bf16 (planar channel-first — the framework's
    internal compute layout).  Returns [C, out_h, out_w] in the same dtype.
    ``compute_dtype``: matmul operand precision (frames can stay f32 in HBM
    while the MXU runs bf16); defaults to the input dtype.
    """
    if interpret is None:
        interpret = use_interpret()
    c, in_h, in_w = img.shape
    dtype = img.dtype
    if compute_dtype is None:
        compute_dtype = dtype

    t_ox = min(tile_out, round_up(out_w, 128))
    t_oy = min(tile_out, round_up(out_h, 8))
    col_starts, bx, span_x, n_tx, in_wp, pad_l = _axis_plan(
        in_w, out_w, a, t_ox, 128)
    row_starts, by_t, span_y, n_ty, in_hp, pad_t = _axis_plan(
        in_h, out_h, a, t_oy, 8)
    # vertical band is used as [T_oy, S_y]: transpose of the axis plan layout
    by = np.transpose(by_t, (0, 2, 1)).copy()

    # centered operands halve bf16 rounding (weights renormalize to 1, so
    # f(x - 1/2) + 1/2 == f(x) to f32 rounding)
    center = compute_dtype == jnp.bfloat16 and dtype == jnp.float32
    # bands stay f32: the kernel's split-dot halves them itself (their
    # bf16 rounding alone costs the 0.999-SSIM gate on smooth content)
    band_dtype = dtype
    if center:
        img = img - jnp.asarray(0.5, dtype)
    img_p = jnp.pad(img, ((0, 0), (pad_t, in_hp - in_h - pad_t),
                          (pad_l, in_wp - in_w - pad_l)))
    out_hp, out_wp = n_ty * t_oy, n_tx * t_ox

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(c, n_ty, n_tx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # img (HBM)
            pl.BlockSpec(                                    # by block
                (1, t_oy, span_y),
                lambda ci, ty, tx, *_: (ty, 0, 0),
            ),
            pl.BlockSpec(                                    # bx block
                (1, span_x, t_ox),
                lambda ci, ty, tx, *_: (tx, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, t_oy, t_ox),
            lambda ci, ty, tx, *_: (ci, ty, tx),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, span_y, span_x), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _scale_kernel, span_y=span_y, span_x=span_x,
        compute_dtype=compute_dtype, n_c=c, n_ty=n_ty, n_tx=n_tx,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, out_hp, out_wp), dtype),
        interpret=interpret,
    )(
        jnp.asarray(row_starts),
        jnp.asarray(col_starts),
        img_p,
        jnp.asarray(by, dtype=band_dtype),
        jnp.asarray(bx, dtype=band_dtype),
    )
    out = out[:, :out_h, :out_w]
    if center:
        out = out + jnp.asarray(0.5, dtype)
    return out
