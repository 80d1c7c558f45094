"""Pallas 3x3 stride-2 conv for the learned head's encoder (config 5).

XLA's conv lowering collapses on the trunk's first layer — a 3x3 stride-2
conv over 8 planar channels at 4K runs at ~5% MXU utilization (16.5 ms on
one v5e; the compiled HLO reshapes width into an 8x484 pseudo-batch).
Reformulations inside XLA all measured worse (per-layer timings recorded
in docs/DESIGN.md): shifted-slice matmuls 215 ms (lane-strided slices),
space-to-depth + stride-1 conv 20 ms, big-K concat 18 ms, NHWC 18 ms.

This kernel makes the strided tap gather MXU work instead of layout work
(Mosaic rejects stride-2 vector slices — verified, "strides confined to
[1, 2)"): one double-buffered DMA of the input span per output tile (the
lanczos kernel's idiom), a static 0/1 column-selection matmul that pulls
all three dx-phases at stride 2, a block-diagonal row-selection matmul
per dy, and a [Cout, Cin] x [Cin, th, tw] mix per tap, f32-accumulated.
Selection matmuls burn cheap MXU FLOPs to avoid unsupported strided
slices — the layer lands memory-bound.  No reference counterpart (the
reference has no model code, SURVEY.md §0); this is the TPU-native path
for BASELINE config 5.
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


def _conv_s2_kernel(img_ref, sxsel_ref, rd_ref, wtap_ref, bias_ref, out_ref,
                    span_ref, sem, *, span_y, span_x, cin, th, tw,
                    n_ty, n_tx, compute_dtype):
    ty = pl.program_id(0)
    tx = pl.program_id(1)

    def start_dma(tyi, txi, slot):
        rs = pl.multiple_of(tyi * (2 * th), 8)
        cs = pl.multiple_of(txi * (2 * tw), 128)
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
        img_ref.at[:, pl.ds(pl.multiple_of(ty * (2 * th), 8), span_y),
                   pl.ds(pl.multiple_of(tx * (2 * tw), 128), span_x)],
        span_ref.at[slot], sem.at[slot],
    ).wait()
    spn = span_ref[slot].reshape(cin * span_y, span_x)    # leading collapse

    # columns: one static 0/1 matmul gathers all three dx phases at
    # stride 2 -> [cin*Sy, 3*tw]
    c_all = jnp.dot(spn, sxsel_ref[:],
                    preferred_element_type=F32).astype(compute_dtype)
    acc = None
    for dy in range(3):
        # rows: block-diagonal (per-channel) 0/1 selection at stride 2
        e = jnp.dot(rd_ref[dy], c_all,
                    preferred_element_type=F32).astype(compute_dtype)
        for dx in range(3):
            s = e[:, dx * tw:(dx + 1) * tw].reshape(cin, th, tw)
            term = jax.lax.dot_general(
                wtap_ref[dy * 3 + dx], s,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=F32)               # [cout, th, tw]
            acc = term if acc is None else acc + term
    out_ref[:] = acc + bias_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("compute_dtype", "tile", "interpret"))
def conv3x3_s2(x: jax.Array, w: jax.Array, b: jax.Array,
               compute_dtype=jnp.bfloat16,
               tile: tuple[int, int] | None = None,
               interpret: bool | None = None) -> jax.Array:
    """SAME-padded 3x3 stride-2 conv, planar layout.

    ``x``: [Cin, H, W] (H, W even); ``w``: [Cout, Cin, 3, 3]; ``b``:
    [Cout].  Returns f32 [Cout, H/2, W/2], identical math to
    ``lax.conv_general_dilated(..., stride 2, SAME)`` with f32 tap
    accumulation (tap order differs only inside the exact-f32 MXU
    accumulate).  Intended for small Cin: the block-diagonal row selector
    scales as Cin^2, so wins shrink with channel count (enc1 Cin=8:
    6.4 vs 16.5 ms at 4K; enc2 Cin=32 at its VMEM-bounded (16, 128)
    tile: 6.8 vs 8.5).
    """
    if interpret is None:
        interpret = use_interpret()
    cin, h, wd = x.shape
    cout = w.shape[0]
    if h % 2 or wd % 2:
        raise ValueError(f"conv3x3_s2 needs even H, W; got {h}x{wd}")
    ho, wo = h // 2, wd // 2
    if tile is None:
        # the row selector [cin*th, cin*(2th+8)] is the VMEM governor
        tile = (32, 128) if cin <= 8 else (16, 128)
    th, tw = tile
    n_ty, n_tx = cdiv(ho, th), cdiv(wo, tw)
    span_y, span_x = 2 * th + 8, 2 * tw + 128
    # SAME stride-2 pad is (0, 1); extend to the tile lattice + span slack
    hp = 2 * n_ty * th + 8
    wp = 2 * n_tx * tw + 128
    dt = compute_dtype if compute_dtype != F32 else x.dtype
    xp = jnp.pad(x.astype(dt), ((0, 0), (0, hp - h), (0, wp - wd)))

    # static selection matrices (0/1 -> exact in any dtype)
    sxsel = np.zeros((span_x, 3 * tw), np.float32)
    for dx in range(3):
        ox = np.arange(tw)
        sxsel[2 * ox + dx, dx * tw + ox] = 1.0
    rd = np.zeros((3, cin * th, cin * span_y), np.float32)
    for dy in range(3):
        for ci in range(cin):
            oy = np.arange(th)
            rd[dy, ci * th + oy, ci * span_y + 2 * oy + dy] = 1.0
    wtap = jnp.transpose(w, (2, 3, 0, 1)).reshape(9, cout, cin)
    bias = b.astype(F32)[:, None, None]

    out = pl.pallas_call(
        functools.partial(_conv_s2_kernel, span_y=span_y, span_x=span_x,
                          cin=cin, th=th, tw=tw, n_ty=n_ty, n_tx=n_tx,
                          compute_dtype=compute_dtype),
        grid=(n_ty, n_tx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # full padded image
            pl.BlockSpec((span_x, 3 * tw), lambda ty, tx: (0, 0)),
            pl.BlockSpec((3, cin * th, cin * span_y), lambda ty, tx: (0, 0, 0)),
            pl.BlockSpec((9, cout, cin), lambda ty, tx: (0, 0, 0)),
            pl.BlockSpec((cout, 1, 1), lambda ty, tx: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((cout, th, tw), lambda ty, tx: (0, ty, tx)),
        out_shape=jax.ShapeDtypeStruct((cout, n_ty * th, n_tx * tw), F32),
        scratch_shapes=[
            pltpu.VMEM((2, cin, span_y, span_x), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, jnp.asarray(sxsel, dt), jnp.asarray(rd, dt),
      wtap.astype(compute_dtype), bias)
    return out[:, :ho, :wo]

def _chain_kernel(img_ref, *refs, span_y, span_x, chans, th, tw,
                  n_ty, n_tx, img_h, img_w, relus, compute_dtype):
    """See conv3x3_chain.  refs = wtap_0..wtap_{L-1}, bias_0..bias_{L-1},
    out_ref, span scratch, DMA sem."""
    L = len(chans) - 1
    wtaps = refs[:L]
    biases = refs[L:2 * L]
    out_ref = refs[2 * L]
    span_ref, sem = refs[2 * L + 1], refs[2 * L + 2]
    ty = pl.program_id(0)
    tx = pl.program_id(1)

    def start_dma(tyi, txi, slot):
        rs = pl.multiple_of(tyi * th, 8)
        cs = pl.multiple_of(txi * tw, 128)
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
        img_ref.at[:, pl.ds(pl.multiple_of(ty * th, 8), span_y),
                   pl.ds(pl.multiple_of(tx * tw, 128), span_x)],
        span_ref.at[slot], sem.at[slot],
    ).wait()

    # activation for layer 0: the DMA'd span, trimmed to the exact halo
    rows = th + 2 * L
    cols = tw + 2 * L
    a = span_ref[slot][:, 0:rows, 0:cols]
    # global image coords of a[:, 0, 0] (xp is L-shifted: xp[r] = x[r-L])
    acc = None
    for i in range(L):
        acc = None
        for dy in range(3):
            for dx in range(3):
                s = a[:, dy:dy + rows - 2, dx:dx + cols - 2]
                term = jax.lax.dot_general(
                    wtaps[i][dy * 3 + dx], s,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=F32)   # [c_{i+1}, rows-2, cols-2]
                acc = term if acc is None else acc + term
        rows -= 2
        cols -= 2
        acc = acc + biases[i][:]
        if relus[i]:
            acc = jnp.maximum(acc, 0.0)
        if i + 1 < L:
            # zero outside the true image: the NEXT conv's SAME padding
            # must read zeros there, but the fused halo carries
            # relu(bias)-class values at out-of-image positions (the
            # lax.conv chain pads each intermediate with zeros instead)
            g0r = ty * th - (L - 1 - i)
            g0c = tx * tw - (L - 1 - i)
            ri = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) + g0r
            ci = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) + g0c
            ok = ((ri >= 0) & (ri < img_h) & (ci >= 0) & (ci < img_w))
            a = jnp.where(ok[None], acc, 0.0).astype(compute_dtype)
    out_ref[:] = acc


@functools.partial(jax.jit,
                   static_argnames=("relus", "compute_dtype", "tile",
                                    "interpret"))
def conv3x3_chain(x: jax.Array, ws: tuple, bs: tuple,
                  relus: tuple = (True, True, False),
                  compute_dtype=jnp.bfloat16,
                  tile: tuple[int, int] | None = None,
                  interpret: bool | None = None) -> jax.Array:
    """A CHAIN of SAME-padded 3x3 stride-1 convs fused in one kernel
    (bias + optional relu between layers), planar layout.

    ``x``: [C0, H, W]; ``ws[i]``: [C_{i+1}, C_i, 3, 3]; ``bs[i]``:
    [C_{i+1}].  Returns f32 [C_L, H, W].

    Built for the v2 learned head's stage-2 refinement (rife.py r_in ->
    r_body -> r_head at 1/4 resolution): XLA lowers those three convs to
    ~0.9-1.5 ms each at 4K (the r4c profile attributes 9.1 ms/step to
    lax.conv overall) while the chain is ~87 GFLOPs ~ sub-ms at MXU
    rates.  Fusing the chain amortizes one HBM read of the wide input
    across all layers — intermediates never leave VMEM — the same
    double-buffered-DMA idiom as conv3x3_s2 above.  Each intermediate is
    re-zeroed OUTSIDE the true image so the next layer's SAME padding
    reads zeros exactly like the unfused lax.conv chain (the fused halo
    would otherwise carry relu(bias) across the border).

    Matches the lax.conv bf16 chain to f32-accumulation re-association
    (tap order differs inside the exact-f32 MXU accumulate); the learned
    path is metric-gated, not bitwise.  Inference-only (no autodiff rule)
    — training keeps lax.conv.  No reference counterpart (the reference
    has no model code, SURVEY.md §0).
    """
    if interpret is None:
        interpret = use_interpret()
    L = len(ws)
    assert len(bs) == L and len(relus) == L
    cin, h, wd = x.shape
    chans = [cin] + [w.shape[0] for w in ws]
    for i, w in enumerate(ws):
        assert w.shape[1] == chans[i], (w.shape, chans)
    if tile is None:
        tile = (16, 256)
    th, tw = tile
    n_ty, n_tx = cdiv(h, th), cdiv(wd, tw)
    span_y = round_up(th + 2 * L, 8)
    span_x = tw + 128
    dt = compute_dtype if compute_dtype != F32 else x.dtype
    # xp[r, c] = x[r-L, c-L], zero outside; slack to the span lattice
    hp = n_ty * th + span_y
    wp = n_tx * tw + span_x
    xp = jnp.pad(x.astype(dt), ((0, 0), (L, hp - h - L), (L, wp - wd - L)))

    wtaps = [jnp.transpose(w, (2, 3, 0, 1)).reshape(9, w.shape[0],
                                                    w.shape[1])
             .astype(compute_dtype) for w in ws]
    biases = [b.astype(F32)[:, None, None] for b in bs]

    out = pl.pallas_call(
        functools.partial(_chain_kernel, span_y=span_y, span_x=span_x,
                          chans=tuple(chans), th=th, tw=tw, n_ty=n_ty,
                          n_tx=n_tx, img_h=h, img_w=wd,
                          relus=tuple(relus), compute_dtype=compute_dtype),
        grid=(n_ty, n_tx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec((9, w.shape[0], w.shape[1]),
                        lambda ty, tx: (0, 0, 0)) for w in ws]
        + [pl.BlockSpec((w.shape[0], 1, 1), lambda ty, tx: (0, 0, 0))
           for w in ws],
        out_specs=pl.BlockSpec((chans[-1], th, tw), lambda ty, tx: (0, ty, tx)),
        out_shape=jax.ShapeDtypeStruct((chans[-1], n_ty * th, n_tx * tw),
                                       F32),
        scratch_shapes=[
            pltpu.VMEM((2, cin, span_y, span_x), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, *wtaps, *biases)
    return out[:, :h, :wd]
