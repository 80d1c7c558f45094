"""Executable specification: pure-jnp float32 oracle ops.

These are 1:1 transcriptions of the reference's three GLSL compute shaders —
the mathematical contract the Pallas kernels must match bit-for-bit in f32:

- :func:`lanczos_scale`  ← reference shaders/scale.comp:1-61
- :func:`motion_search`  ← reference shaders/motion.comp:1-57
- :func:`warp_blend`     ← reference shaders/interpolate.comp:1-40

The reference has **no tests** and its interpolation path is dead code (no
caller of FrameManager::InterpolateFrames — see SURVEY.md §0), so these
oracles are the ground truth for the whole framework.  Conventions the GLSL
leaves undefined or the reference host code gets wrong are resolved here and
documented:

1. **Motion units** (reference bug — motion.comp:56 stores pixels,
   interpolate.comp:16 adds them to normalized uv): our MV fields are
   **pixel-unit** (dx, dy); :func:`warp_blend` converts to uv explicitly.
2. **Out-of-bounds previous-frame fetch in motion search** (undefined
   behavior in the GLSL: unclamped texelFetch, motion.comp:42-43): resolved
   to clamp-to-edge.
3. **Tie-break**: strict ``<`` argmin, candidates scanned dy outer then dx
   inner, each from -radius to +radius (motion.comp:27-28, 49-52).  First
   found wins: a constant frame pair therefore yields (-r, -r) everywhere,
   not (0, 0) — faithful to the shader, pinned by tests.
4. **UNORM8 store**: clamp to [0,1], scale by 255, round-to-nearest-even
   (Vulkan rgba8 UNORM conversion; scale.comp:6, interpolate.comp:8).
5. **Flow direction** (latent reference bug #12, found by property testing):
   motion.comp estimates *backward* flow — its cost is
   distance(curr[q], prev[q + m]), so curr[q] = prev[q + m] at the optimum
   (motion.comp:41-45) — but interpolate.comp's warp offsets (prev at
   uv + m*(-t), curr at uv + m*(1-t), interpolate.comp:34-35) are only
   mutually consistent for *forward* flow (curr[q] = prev[q - m]).  Each
   oracle faithfully implements its own shader; the engine negates the MV
   field between motion search and warp so interpolation actually aligns
   content (the reference never runs this path — it is dead code).

Everything here computes in float32, vectorized over pixels with static
Python/`lax` loops over taps and candidates (XLA-friendly: no dynamic
shapes, no data-dependent control flow).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

F32 = jnp.float32

# The reference shader's pi literal (scale.comp:18), rounded to f32.
_PI = F32(3.14159265359)


def lanczos_weight(x: jax.Array, a: int = 3) -> jax.Array:
    """Lanczos window weight — scale.comp:16-20.

    ``lanczos(0) = 1``, else ``a*sin(pi*x)*sin(pi*x/a) / (pi*x)^2``.
    Note the reference does **not** cut off at |x| >= a (its window never
    produces such taps), and neither do we.
    """
    x = x.astype(F32)
    px = _PI * x
    safe = jnp.where(x == 0, F32(1.0), px)  # avoid 0/0; masked below
    w = F32(a) * jnp.sin(safe) * jnp.sin(safe / F32(a)) / (safe * safe)
    return jnp.where(x == 0, F32(1.0), w)


def _axis_taps(in_size: int, out_size: int, a: int):
    """Per-output-pixel tap coordinates/deltas for one axis — scale.comp:24-26.

    Returns (tap_coords [out, 2a] int32 texel indices (may be out of range),
    deltas [out, 2a] f32 filter arguments, valid [out, 2a] bool).

    A tap at integer texel t is valid iff 0 <= t <= size-1: the shader skips
    taps whose center (t+0.5)/size leaves [0,1] (scale.comp:33-37), which for
    integer t is exactly t < 0 or t >= size.
    """
    out_idx = jnp.arange(out_size, dtype=F32)
    uv = (out_idx + F32(0.5)) / F32(out_size)               # scale.comp:57
    pixel_pos = uv * F32(in_size) - F32(0.5)                # scale.comp:24
    fl = jnp.floor(pixel_pos)
    frac = pixel_pos - fl                                   # fract()
    start = fl - F32(a - 1)                                 # scale.comp:26
    k = jnp.arange(2 * a, dtype=F32)
    coords = start[:, None] + k[None, :]                    # texel index (f32 int-valued)
    deltas = k[None, :] - frac[:, None] - F32(a - 1)        # scale.comp:39-40
    valid = (coords >= 0) & (coords <= F32(in_size - 1))
    return coords.astype(jnp.int32), deltas, valid


def lanczos_scale(img: jax.Array, out_h: int, out_w: int, a: int = 3) -> jax.Array:
    """Lanczos-a resample — scale.comp:51-61 + sampleLanczos (:22-49).

    ``img``: f32 [H, W, C].  Returns f32 [out_h, out_w, C].

    Semantics: 2a x 2a tap window anchored at floor(pixelPos)-(a-1); taps
    outside the image are dropped from both the color sum and the weight sum
    (partition-of-unity renormalization at edges, scale.comp:43-48).  The
    sampler reads exact texel centers, so LINEAR filtering degenerates to a
    texel fetch (taps at (start+k+0.5)/size — scale.comp:32).

    Accumulation order matches the shader: y outer, x inner (scale.comp:31),
    weight = lanczos(dx) * lanczos(dy) (scale.comp:41), single joint
    normalization at the end (scale.comp:48).
    """
    img = img.astype(F32)
    in_h, in_w, _ = img.shape
    tx, dx, vx = _axis_taps(in_w, out_w, a)   # [out_w, 2a]
    ty, dy, vy = _axis_taps(in_h, out_h, a)   # [out_h, 2a]

    wx = lanczos_weight(dx, a)
    wy = lanczos_weight(dy, a)
    cx = jnp.clip(tx, 0, in_w - 1)
    cy = jnp.clip(ty, 0, in_h - 1)

    color = jnp.zeros((out_h, out_w, img.shape[2]), F32)
    total_w = jnp.zeros((out_h, out_w), F32)
    for ky in range(2 * a):          # y outer — scale.comp:31
        for kx in range(2 * a):      # x inner — scale.comp:32
            w = wx[None, :, kx] * wy[:, None, ky]          # scale.comp:41
            w = jnp.where(vx[None, :, kx] & vy[:, None, ky], w, F32(0.0))
            texel = img[cy[:, ky], :, :][:, cx[:, kx], :]  # [out_h, out_w, C]
            color = color + texel * w[:, :, None]          # scale.comp:43
            total_w = total_w + w                          # scale.comp:44
    return color / total_w[:, :, None]                     # scale.comp:48


def _euclidean_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """GLSL distance(a, b) over the channel axis: sqrt(sum((a-b)^2)).

    Channel accumulation is explicit left-associative (dot(d,d) order) so the
    Pallas kernels can reproduce it term-for-term.
    """
    d = a - b
    acc = d[..., 0] * d[..., 0]
    for c in range(1, a.shape[-1]):
        acc = acc + d[..., c] * d[..., c]
    return jnp.sqrt(acc)


def motion_search(
    prev: jax.Array,
    curr: jax.Array,
    block_size: int = 8,
    search_radius: int = 16,
) -> jax.Array:
    """Exhaustive per-pixel block-matching motion estimation — motion.comp:16-57.

    ``prev``/``curr``: f32 [H, W, C].  Returns f32 [H, W, 2] = (dx, dy) in
    **pixel units** (motion.comp:29, 56; the rgba32f store's zw lanes carry no
    information and are dropped).

    For each pixel p the block is anchored at p - block_size//2
    (motion.comp:22) and every displacement (dx, dy) in the inclusive square
    [-r, r]^2 is scored by the sum over in-bounds block pixels q of
    ``distance(curr[q], prev[q + d])`` (motion.comp:33-47).  Out-of-image
    block pixels q are skipped (their term is dropped — motion.comp:36-39);
    the previous-frame fetch is clamp-to-edge (documented resolution of the
    shader's unclamped texelFetch UB, motion.comp:42-43).  Argmin uses strict
    ``<`` with first-found-wins over the dy-outer/dx-inner scan
    (motion.comp:27-28, 49-52); initial best cost is 1e10 with motion (0,0)
    (motion.comp:24-25).
    """
    prev = prev.astype(F32)
    curr = curr.astype(F32)
    h, w, _ = curr.shape
    r = int(search_radius)
    b = int(block_size)
    anchor = b // 2  # block start offset: pixel - blockSize/2 (motion.comp:22)
    n_cand = (2 * r + 1) ** 2

    row_idx = jnp.arange(h, dtype=jnp.int32)
    col_idx = jnp.arange(w, dtype=jnp.int32)

    def candidate_cost(dx: jax.Array, dy: jax.Array) -> jax.Array:
        """Cost field for one displacement: zero-padded block box-sum of the
        per-pixel distance field (exact same accumulation order as the
        shader's y-outer/x-inner block loop, motion.comp:33-47)."""
        ys = jnp.clip(row_idx + dy, 0, h - 1)
        xs = jnp.clip(col_idx + dx, 0, w - 1)
        prev_shift = prev[ys][:, xs]                    # prev[q + d], clamped
        dist = _euclidean_distance(curr, prev_shift)    # [h, w] at block pixel q
        # zero-pad so that out-of-image block pixels contribute nothing
        padded = jnp.pad(
            dist,
            ((anchor, b - 1 - anchor), (anchor, b - 1 - anchor)),
        )
        cost = jnp.zeros((h, w), F32)
        for by in range(b):          # y outer — motion.comp:33
            for bx in range(b):      # x inner — motion.comp:34
                cost = cost + jax.lax.dynamic_slice(padded, (by, bx), (h, w))
        return cost

    def body(i, state):
        best_cost, best_dx, best_dy = state
        dy = i // (2 * r + 1) - r    # dy outer — motion.comp:27
        dx = i % (2 * r + 1) - r     # dx inner — motion.comp:28
        cost = candidate_cost(dx, dy)
        upd = cost < best_cost       # strict < : first found wins (motion.comp:49)
        best_cost = jnp.where(upd, cost, best_cost)
        best_dx = jnp.where(upd, dx.astype(F32), best_dx)
        best_dy = jnp.where(upd, dy.astype(F32), best_dy)
        return best_cost, best_dx, best_dy

    init = (
        jnp.full((h, w), F32(1e10)),    # motion.comp:25
        jnp.zeros((h, w), F32),         # motion.comp:24
        jnp.zeros((h, w), F32),
    )
    _, best_dx, best_dy = jax.lax.fori_loop(0, n_cand, body, init)
    return jnp.stack([best_dx, best_dy], axis=-1)


def bilinear_sample(img: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """GLSL ``texture()`` with LINEAR filtering and CLAMP_TO_EDGE addressing.

    ``img``: f32 [H, W, C]; ``u``/``v``: f32 arrays of normalized coords.
    Returns f32 [..., C] (the shape of u/v plus channels).

    Standard bilinear: sample position in texel space is uv*size - 0.5; the
    four surrounding texels are fetched with clamped indices and lerped as
    ``mix(mix(c00, c10, fx), mix(c01, c11, fx), fy)`` where
    ``mix(a, b, t) = a*(1-t) + b*t``.
    """
    h, w, _ = img.shape
    x = u.astype(F32) * F32(w) - F32(0.5)
    y = v.astype(F32) * F32(h) - F32(0.5)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)
    c00 = img[y0, x0]
    c10 = img[y0, x1]
    c01 = img[y1, x0]
    c11 = img[y1, x1]
    top = c00 * (F32(1.0) - fx) + c10 * fx
    bot = c01 * (F32(1.0) - fx) + c11 * fx
    return top * (F32(1.0) - fy) + bot * fy


def warp_blend(
    prev: jax.Array,
    curr: jax.Array,
    motion: Optional[jax.Array],
    factor: float,
) -> jax.Array:
    """Motion-compensated blend — interpolate.comp:24-40 + sampleWithMotion (:15-22).

    ``prev``/``curr``: f32 [H, W, C]; ``motion``: f32 [Hm, Wm, 2] in **pixel
    units** (dx, dy), or None for a pure cross-fade (config 2); ``factor``:
    blend factor t in [0, 1].

    Per output pixel p: uv = (p+0.5)/size; the motion vector is read from the
    MV field (exact texel fetch when the field matches the frame size, which
    is what the shader's bilinear ``texture()`` at texel centers computes —
    interpolate.comp:31; bilinear resample when the MV grid is coarser);
    converted to uv units by dividing by the frame size (units fix for
    reference bug §2.3.1 — the shader adds pixel-unit motion to uv directly).

    prev is sampled at uv + muv*(-t), curr at uv + muv*(1-t); a sample whose
    uv leaves [0,1] in either axis returns transparent black
    (interpolate.comp:17-21).  Output is mix(prevColor, currColor, t)
    (interpolate.comp:38).
    """
    prev = prev.astype(F32)
    curr = curr.astype(F32)
    h, w, _ = curr.shape
    t = F32(factor)

    px = jnp.arange(w, dtype=F32)
    py = jnp.arange(h, dtype=F32)
    u = (px[None, :] + F32(0.5)) / F32(w)                 # interpolate.comp:30
    v = (py[:, None] + F32(0.5)) / F32(h)
    u = jnp.broadcast_to(u, (h, w))
    v = jnp.broadcast_to(v, (h, w))

    if motion is None:
        mdx = jnp.zeros((h, w), F32)
        mdy = jnp.zeros((h, w), F32)
    elif motion.shape[:2] == (h, w):
        mdx = motion[..., 0].astype(F32)                  # exact texel-center fetch
        mdy = motion[..., 1].astype(F32)
    else:
        m = bilinear_sample(motion.astype(F32), u, v)     # coarse MV grid resample
        mdx, mdy = m[..., 0], m[..., 1]

    # pixel units -> uv units (units fix, documented divergence)
    mu = mdx / F32(w)
    mv_ = mdy / F32(h)

    def sample_with_motion(frame, scale):
        su = u + mu * scale                               # interpolate.comp:16
        sv = v + mv_ * scale
        oob = (su < 0) | (su > 1) | (sv < 0) | (sv > 1)   # interpolate.comp:17-19
        col = bilinear_sample(frame, su, sv)
        return jnp.where(oob[..., None], F32(0.0), col)   # vec4(0.0)

    prev_col = sample_with_motion(prev, -t)               # interpolate.comp:34
    curr_col = sample_with_motion(curr, F32(1.0) - t)     # interpolate.comp:35
    return prev_col * (F32(1.0) - t) + curr_col * t       # mix — interpolate.comp:38


def quantize_unorm8(x: jax.Array) -> jax.Array:
    """f32 [0,1] -> uint8, Vulkan UNORM convention: clamp, scale 255, RTNE.

    This is the rgba8 imageStore conversion (scale.comp:6, interpolate.comp:8);
    Lanczos ringing outside [0,1] is clamped here, exactly as UNORM storage
    does in the reference.
    """
    return jnp.round(jnp.clip(x.astype(F32), 0.0, 1.0) * F32(255.0)).astype(jnp.uint8)


def dequantize_unorm8(x: jax.Array) -> jax.Array:
    """uint8 -> f32 in [0,1] (UNORM read): x / 255."""
    return x.astype(F32) / F32(255.0)
