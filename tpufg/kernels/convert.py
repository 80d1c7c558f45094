"""Frame layout/dtype conversion: uint8 interleaved <-> planar compute layout.

The reference ingests BGRA8 X11 pixels straight into rgba8 VkImages
(window_capture.cpp:472-568) and reads rgba8 back for SDL display
(scaler.cpp:480-614); all three shaders are channel-order-invariant, so the
reference's R/B swap cancels out (SURVEY.md §2.3.7).  This framework picks
one canonical order at ingest: frames enter as uint8 [H, W, C] RGBA and are
converted to the internal planar [C, H, W] f32/bf16 layout (lanes = W,
sublanes = H — the TPU-friendly layout for every kernel in this package),
normalized to [0, 1] (UNORM read: x/255).

Egress quantizes with the Vulkan UNORM8 store convention (clamp, *255,
round-to-nearest-even) — shared with the oracle's quantize_unorm8.

These are deliberately plain XLA ops: transpose + convert fuse well with
their producers.  (Measured dead ends, do not retry: a standalone Pallas
quantize+int32-pack kernel is ~0.2 ms faster in isolation at 4K but SLOWER
in the step — its custom-call boundary forces materialization of the lazy
crop slice feeding it, +0.5 ms/output; the winning fusion packs inside the
*producing* kernel instead, see kernels/lanczos.py lanczos_scale_packed.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

F32 = jnp.float32


def frames_to_planar(frames: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 [..., H, W, C] -> planar [..., C, H, W] in [0,1]."""
    x = frames.astype(F32) / F32(255.0)
    x = jnp.moveaxis(x, -1, -3)
    return x.astype(dtype)


def planar_to_frames(planar: jax.Array) -> jax.Array:
    """planar [..., C, H, W] float -> uint8 [..., H, W, C] (UNORM8 store)."""
    x = jnp.moveaxis(planar.astype(F32), -3, -1)
    return jnp.round(jnp.clip(x, 0.0, 1.0) * F32(255.0)).astype(jnp.uint8)
