"""Device-resident frame ring: prefetched host->HBM ingest.

The reference allocates a fresh HOST_VISIBLE staging buffer, memcpys into
it, submits a copy, and waits — every frame (window_capture.cpp:483-566;
SURVEY.md §2.3.8).  Here ingest is a small ring: the next ``depth`` frames
are dispatched to the device ahead of consumption (jax.device_put is
asynchronous), so the host->HBM transfer of frame n+1..n+depth overlaps the
device compute of frame n.  Combined with the native prefetch ring
(tpufg/io/native.py) the whole path disk -> decode -> pinned slot -> HBM is
pipelined.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator

import jax
import numpy as np


class DeviceIngestRing:
    """Wraps a frame iterator; yields device arrays uploaded ahead of time."""

    def __init__(self, frames: Iterable[np.ndarray], depth: int = 2):
        if depth < 1:
            raise ValueError("ring depth must be >= 1")
        self._it: Iterator[np.ndarray] = iter(frames)
        self._depth = depth
        self._q: collections.deque = collections.deque()

    def _fill(self):
        while len(self._q) < self._depth:
            try:
                frame = next(self._it)
            except StopIteration:
                return
            # async dispatch: upload starts now, overlaps device compute
            self._q.append(jax.device_put(np.ascontiguousarray(frame)))

    def __iter__(self):
        self._fill()
        while self._q:
            out = self._q.popleft()
            self._fill()
            yield out
