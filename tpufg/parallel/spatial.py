"""Multi-chip spatial sharding with ICI halo exchange.

The reference is strictly single-GPU (one device, one queue —
src/vulkan_context.cpp:76-153; SURVEY.md §2.4): its only parallel
decomposition is the 16x16 workgroup grid.  The TPU build scales the same
math across chips the idiomatic way:

- **sp (spatial)**: a frame's rows are sharded across the mesh; motion
  search at pixel p reads a (blockSize/2 + searchRadius)-row neighborhood
  (motion.comp:22-47 — 20 rows at reference constants; more through the
  pyramid), so shards exchange fixed-width row halos with their neighbors
  over ICI via ``jax.lax.ppermute`` inside ``shard_map`` — the same pattern
  as ring attention's block-wise KV pass (SURVEY.md §5.7).
- **dp (data/frame)**: independent frame pairs (offline transcode) shard
  trivially over a leading batch axis.

Boundary semantics: interior shard edges see real neighbor rows (results
bitwise-match the single-chip run away from frame edges); the outermost
shards edge-replicate, exactly like the single-chip frame border.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufg.kernels.convert import frames_to_planar, planar_to_frames
from tpufg.kernels.lanczos import lanczos_scale_fast
from tpufg.kernels.warp import warp_blend_block
from tpufg.models.pyramid import pyramid_motion_search

F32 = jnp.float32

# one halo covers the pyramid's total reach + warp + scale taps, and keeps
# shard extents on the pyramid's 64-row lattice
HALO = 64


def make_spatial_mesh(n_devices: Optional[int] = None,
                      dp: int = 1) -> Mesh:
    """Build a (dp, sp) mesh over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n % dp:
        raise ValueError(f"{n} devices not divisible by dp={dp}")
    arr = np.array(devs[:n]).reshape(dp, n // dp)
    return Mesh(arr, axis_names=("dp", "sp"))


def halo_exchange_rows(x: jax.Array, axis_name: str, halo: int,
                       n: Optional[int] = None) -> jax.Array:
    """Append neighbor row halos to a [C, Hs, W] shard (edge-replicate at
    the frame border).  Returns [C, Hs + 2*halo, W]."""
    if n is None:
        n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # my bottom rows go to the shard below (they become its top halo)
    from_above = jax.lax.ppermute(
        x[:, -halo:, :], axis_name, [(i, i + 1) for i in range(n - 1)])
    from_below = jax.lax.ppermute(
        x[:, :halo, :], axis_name, [(i, i - 1) for i in range(1, n)])
    # outermost shards: replicate the frame edge (clamp-to-edge semantics)
    top_edge = jnp.broadcast_to(x[:, :1, :], x[:, :halo, :].shape)
    bot_edge = jnp.broadcast_to(x[:, -1:, :], x[:, :halo, :].shape)
    top = jnp.where(idx == 0, top_edge, from_above)
    bot = jnp.where(idx == n - 1, bot_edge, from_below)
    return jnp.concatenate([top, x, bot], axis=1)


def make_sharded_interp_step(
    mesh: Mesh,
    in_h: int,
    in_w: int,
    out_h: int,
    out_w: int,
    factor: float = 0.5,
    interpret: bool | None = None,
) -> Callable:
    """Jit'd multi-chip fps-doubling step.

    Input: uint8 [B, H, W, 4] frame pairs (prev, curr), B sharded over dp,
    rows over sp.  Returns (interp_scaled, curr_scaled) uint8
    [B, out_h, out_w, 4] with the same sharding.

    H must divide evenly across sp shards with 64-row lattice alignment.
    """
    sp = mesh.shape["sp"]
    if in_h % (sp * HALO):
        raise ValueError(
            f"input height {in_h} must be divisible by sp*{HALO} = {sp * HALO}")
    if out_h % sp or out_w % 1:
        raise ValueError("output height must divide over sp")
    shard_h = in_h // sp
    # the scaled halo rows to crop from each shard's scaled output
    scale = out_h / in_h
    halo_out = int(HALO * scale)
    if abs(halo_out - HALO * scale) > 1e-9:
        raise ValueError(
            f"scale {scale} must map the {HALO}-row halo to whole output rows")

    from jax.experimental.shard_map import shard_map

    def shard_fn(prev_rows, curr_rows):
        # [1, Hs, W, 4] per-shard uint8 (dp handled by the outer vmap-like
        # sharding; shard_map gives us the block)
        p = frames_to_planar(prev_rows[0], F32)
        c = frames_to_planar(curr_rows[0], F32)
        p_ext = halo_exchange_rows(p, "sp", HALO)
        c_ext = halo_exchange_rows(c, "sp", HALO)
        mv = pyramid_motion_search(p_ext, c_ext, interpret=interpret)
        warped = warp_blend_block(p_ext, c_ext, -mv, factor=factor,
                                  interpret=interpret)
        interp = warped[:, HALO:-HALO, :]
        out_i = lanczos_scale_fast(
            warped, out_h // sp + 2 * halo_out, out_w,
            interpret=interpret)[:, halo_out:-halo_out, :]
        c_full = c_ext
        out_c = lanczos_scale_fast(
            c_full, out_h // sp + 2 * halo_out, out_w,
            interpret=interpret)[:, halo_out:-halo_out, :]
        del interp
        return (planar_to_frames(out_i)[None], planar_to_frames(out_c)[None])

    smapped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("dp", "sp", None, None), P("dp", "sp", None, None)),
        out_specs=(P("dp", "sp", None, None), P("dp", "sp", None, None)),
        check_rep=False,
    )

    in_sharding = NamedSharding(mesh, P("dp", "sp", None, None))

    @jax.jit
    def step(prev_b, curr_b):
        prev_b = jax.lax.with_sharding_constraint(prev_b, in_sharding)
        curr_b = jax.lax.with_sharding_constraint(curr_b, in_sharding)
        return smapped(prev_b, curr_b)

    return step
