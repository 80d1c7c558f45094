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
    equally good or better argmin.  The production pyramid uses ssd.
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
