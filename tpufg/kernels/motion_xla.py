"""Small-radius block-matching motion search in pure XLA.

The Pallas kernel (tpufg.kernels.motion) is the full-radius parity engine;
at the pyramid's small radii (r <= 4, so 25-81 candidates) its per-tile DMA
and candidate-loop overheads dominate.  This formulation unrolls the
candidate loop at trace time — each candidate is a static shifted slice of
the padded previous frame, a fused elementwise distance field, and one
additive ``reduce_window`` box-sum — and lets XLA fuse the argmin chain.

Same conventions as the kernel/oracle: curr out-of-image block pixels
contribute nothing (zero padding of the distance field), prev clamp-to-edge
(edge padding), strict-< argmin in dy-outer/dx-inner scan order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

F32 = jnp.float32


@functools.partial(
    jax.jit, static_argnames=("block_size", "search_radius", "metric"))
def motion_search_xla(
    prev: jax.Array,
    curr: jax.Array,
    block_size: int = 8,
    search_radius: int = 4,
    metric: str = "euclidean",
) -> jax.Array:
    """Exhaustive search, XLA path.  Same contract as motion_search_tiled:
    planar [C, H, W] -> f32 [2, H, W] pixel-unit backward-flow MVs.

    ``metric``: "euclidean" is the shader's per-pixel RGBA distance
    (motion.comp:45 — sqrt per pixel); "ssd" drops the sqrt (sum of
    squared differences) — the standard codec cost, cheaper, usually an
    equally good or better argmin.  The production pyramid uses the
    euclidean lattice search (motion_search_lattice) for shader-metric
    consistency; "ssd" is available for experiments.
    """
    n_ch, h, w = prev.shape
    b = int(block_size)
    r = int(search_radius)
    anchor = b // 2
    prev = prev.astype(F32)
    curr = curr.astype(F32)

    prev_p = jnp.pad(prev, ((0, 0), (r, r), (r, r)), mode="edge")

    def box(x):
        # separable block box-sum anchored at pixel - anchor, zero outside
        pad = (anchor, b - 1 - anchor)
        x = jax.lax.reduce_window(x, F32(0.0), jax.lax.add,
                                  (b, 1), (1, 1), (pad, (0, 0)))
        return jax.lax.reduce_window(x, F32(0.0), jax.lax.add,
                                     (1, b), (1, 1), ((0, 0), pad))

    best_cost = jnp.full((h, w), 1e10, F32)
    best_dx = jnp.zeros((h, w), F32)
    best_dy = jnp.zeros((h, w), F32)
    for dy in range(-r, r + 1):          # dy outer — motion.comp:27
        for dx in range(-r, r + 1):      # dx inner — motion.comp:28
            shifted = prev_p[:, r + dy: r + dy + h, r + dx: r + dx + w]
            diff = curr - shifted
            acc = diff[0] * diff[0]
            for ci in range(1, n_ch):
                acc = acc + diff[ci] * diff[ci]
            dist = jnp.sqrt(acc) if metric == "euclidean" else acc
            cost = box(dist)
            upd = cost < best_cost       # strict <: first found wins
            best_cost = jnp.where(upd, cost, best_cost)
            best_dx = jnp.where(upd, F32(dx), best_dx)
            best_dy = jnp.where(upd, F32(dy), best_dy)
    return jnp.stack([best_dx, best_dy])


@functools.partial(
    jax.jit, static_argnames=("grid", "block_size", "search_radius", "bias",
                              "return_cost"))
def motion_search_lattice(
    prev: jax.Array,
    curr: jax.Array,
    grid: int = 16,
    block_size: int = 8,
    search_radius: int = 4,
    bias: float = 0.0,
    return_cost: bool = False,
) -> jax.Array:
    """Block-lattice exhaustive search: MVs only at block centers.

    The pyramid consumes one MV per ``grid x grid`` cell
    (models/pyramid.py), so computing the per-pixel field and subsampling
    wastes grid^2 = 256x the argmin work.  This evaluates candidates only
    at the lattice centers (grid*i + grid/2, grid*j + grid/2).

    When ``search_radius + block_size/2 <= grid/2`` every candidate's
    prev-frame block window stays inside the SAME grid cell as the curr
    block, so after one [C, Hb, g, Wb, g] reshape each candidate is a pair
    of static strided slices — no shifted image copies at all (the
    reference's ~70k reads/px become ~(b+2r)^2 reads per cell).

    Same conventions as motion_search_tiled(exact_box=False): Euclidean
    per-pixel distance, separable rows-then-x block sum in the same f32
    accumulation order, strict-< argmin over the dy-outer/dx-inner scan —
    output is bitwise the subsampled tiled-kernel field.  Block windows at
    these centers never leave the image (blockStart = g/2 - b/2 >= 0), so
    the validity mask and clamp-to-edge halo never engage.

    ``prev``/``curr``: planar [C, H, W] with H, W divisible by ``grid``.
    Returns f32 [2, H/grid, W/grid] (plane 0 = dx, plane 1 = dy).
    """
    n_ch, h, w = prev.shape
    g = int(grid)
    b = int(block_size)
    r = int(search_radius)
    off = (g - b) // 2  # block start within its cell
    if h % g or w % g:
        raise ValueError(f"frame {h}x{w} not divisible by grid {g}")
    if off - r < 0 or off + b + r > g:
        raise ValueError(
            f"radius {r} leaves the grid cell (need r + b/2 <= g/2); "
            "use motion_search_tiled")
    return _lattice_impl(prev, curr, g, b, r, bias, return_cost)


def _lattice_impl(prev, curr, g, b, r, bias, return_cost):
    """Unjitted search body (shared so callers can vmap it)."""
    n_ch, h, w = prev.shape
    off = (g - b) // 2
    hb, wb = h // g, w // g

    # [C, Hb, g, Wb, g]: one layout pass each, then only static slices
    prev_cells = prev.astype(F32).reshape(n_ch, hb, g, wb, g)
    curr_blk = curr.astype(F32).reshape(n_ch, hb, g, wb, g)[
        :, :, off:off + b, :, off:off + b]

    # NOTE: batching all (2r+1)^2 candidates along a leading stacked axis
    # measured 3x SLOWER (14.9 vs 4.9 ms/step at 1080p): the stacked
    # [K, C, Hb, b, Wb, b] tensors keep the b=8 minor dims (6% lane
    # utilization) and the 42 MB materialization + copies dwarf the saved
    # per-op overhead.  Replacing the ordered box-sum loops with .sum()
    # reductions measured mixed (-0.5 ms at the 81-candidate coarse level,
    # +0.3 ms at the refine level) and forfeits the bitwise tie to the
    # tiled kernel.  The trace-unrolled per-candidate loop below stays.
    best_cost = jnp.full((hb, wb), 1e10, F32)
    best_dx = jnp.zeros((hb, wb), F32)
    best_dy = jnp.zeros((hb, wb), F32)
    for dy in range(-r, r + 1):          # dy outer — motion.comp:27
        for dx in range(-r, r + 1):      # dx inner — motion.comp:28
            shifted = prev_cells[:, :, off + dy:off + dy + b,
                                 :, off + dx:off + dx + b]
            d = curr_blk[0] - shifted[0]
            acc = d * d
            for ci in range(1, n_ch):
                d = curr_blk[ci] - shifted[ci]
                acc = acc + d * d
            dist = jnp.sqrt(acc)                      # [Hb, b, Wb, b]
            # separable box-sum, rows-then-x, sequential adds: bitwise
            # the tiled kernel's exact_box=False accumulation order
            rowsum = dist[:, 0]
            for ky in range(1, b):
                rowsum = rowsum + dist[:, ky]         # [Hb, Wb, b]
            cost = rowsum[..., 0]
            for kx in range(1, b):
                cost = cost + rowsum[..., kx]         # [Hb, Wb]
            if bias:
                # small-magnitude preference (codec zero/predictor bias):
                # on near-flat cost surfaces — the aperture problem, where
                # a dy shift trades off against a dx shift — the strict-<
                # scan otherwise locks onto arbitrary extreme candidates.
                # A static per-candidate penalty proportional to |d| snaps
                # those ties toward the smallest displacement (toward the
                # PREDICTOR in seeded/residual searches).  bias=0 (the
                # default) keeps the bitwise tie to the tiled kernel.
                cost = cost + F32(bias * (abs(dx) + abs(dy)))
            upd = cost < best_cost       # strict <: first found wins
            best_cost = jnp.where(upd, cost, best_cost)
            best_dx = jnp.where(upd, F32(dx), best_dx)
            best_dy = jnp.where(upd, F32(dy), best_dy)
    if return_cost:
        return jnp.stack([best_dx, best_dy]), best_cost
    return jnp.stack([best_dx, best_dy])
