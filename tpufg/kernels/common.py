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


def use_interpret() -> bool:
    """Run Pallas in interpret mode unless on a real TPU backend.

    The axon platform is a tunnel to a real TPU chip and compiles Mosaic.
    """
    return jax.default_backend() not in ("tpu", "axon")
