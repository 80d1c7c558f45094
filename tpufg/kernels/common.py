"""Shared Pallas kernel utilities.

Design rules for every kernel in this package (established empirically on the
target stack — see SURVEY.md §7 and the gather probes in round 1):

- **No per-element dynamic gather.**  Mosaic on this stack rejects 2-D
  gathers and ``take_along_axis``; kernels use only (a) static slices,
  (b) ``pl.ds`` dynamic slices with scalar starts, (c) banded/selection
  matmuls on the MXU.
- **Static shapes everywhere**: wrappers pad to tile multiples and slice the
  result; edge handling is baked into zero weights, never data-dependent
  control flow.
- **Interpret mode off-TPU**: kernels run under ``interpret=True`` on CPU so
  the whole suite tests on the 8-virtual-device CPU mesh.
- **VMEM budget**: ~16 MB/core on v5e (8 MB scratch verified safe, 16 MB
  rejected); tiles sized to stay well under half.
"""

from __future__ import annotations

import jax


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pick_tile(n: int, mult: int, cap: int) -> int:
    """Largest tile <= cap that is a multiple of ``mult`` and divides
    ``n`` — a zero-padding grid plan (no crop copy, no cdiv padding
    waste); falls back to the capped round-up when no divisor fits."""
    t = (cap // mult) * mult
    while t >= mult:
        if n % t == 0:
            return t
        t -= mult
    return min(cap, round_up(n, mult))


def use_interpret() -> bool:
    """Run Pallas in interpret mode unless on a real TPU backend.

    The axon platform is a tunnel to a real TPU chip and compiles Mosaic.
    """
    return jax.default_backend() not in ("tpu", "axon")
