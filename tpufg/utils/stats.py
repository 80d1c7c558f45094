"""Runtime statistics: FPS sliding window and latency percentiles.

``FpsWindow`` reproduces the reference's 60-sample sliding-window FPS
estimator (reference src/scaler.cpp:428-439): push a timestamp per frame, drop
to the newest ``window`` samples, and report
``(n_samples - 1) / (newest - oldest)``.

``LatencyRecorder`` is new (the reference publishes no latency numbers —
readme.md:89): it records per-frame step latencies and reports p50/p90/p99,
feeding both ``bench.py`` and the engine's stats overlay.
"""

from __future__ import annotations

import collections
import time
from typing import Deque, Optional


class FpsWindow:
    def __init__(self, window: int = 60):
        if window < 2:
            raise ValueError("fps window must hold at least 2 samples")
        self.window = window
        self._times: Deque[float] = collections.deque(maxlen=window)

    def tick(self, now: Optional[float] = None) -> None:
        self._times.append(time.perf_counter() if now is None else now)

    @property
    def fps(self) -> float:
        if len(self._times) < 2:
            return 0.0
        span = self._times[-1] - self._times[0]
        if span <= 0:
            return 0.0
        return (len(self._times) - 1) / span


def device_sync(arr) -> None:
    """Wait for a device computation by fetching ONE element.

    ``jax.block_until_ready`` is unreliable over relay-attached devices
    (it can return before execution completes — measured: 0.02 ms reported
    for an 8 ms step), so every latency-bearing sync in the engine and
    bench uses a one-element fetch, which cannot complete before the
    producing computation does.  The fetch itself costs one host<->device
    round-trip — callers measuring pure device time must subtract a
    measured null-RTT (see bench.py).
    Implementation note: slice one element per axis rather than ravel —
    ravel materializes a full on-device copy (~0.4 ms for a 4K frame,
    visible in traces as jit_ravel) before the fetch.
    """
    import numpy as _np

    tiny = arr[tuple(slice(0, 1) for _ in range(getattr(arr, "ndim", 0)))]
    _np.asarray(tiny)


class LatencyRecorder:
    def __init__(self, capacity: int = 100_000):
        self.capacity = capacity
        self._samples: Deque[float] = collections.deque(maxlen=capacity)

    def record(self, seconds: float) -> None:
        self._samples.append(seconds)

    def __len__(self) -> int:
        return len(self._samples)

    def percentile(self, q: float) -> float:
        """Nearest-rank percentile, q in [0, 100]."""
        if not self._samples:
            return 0.0
        data = sorted(self._samples)
        if q <= 0:
            return data[0]
        if q >= 100:
            return data[-1]
        rank = max(1, int(round(q / 100.0 * len(data) + 0.5)))
        return data[min(rank, len(data)) - 1]

    def summary(self) -> dict:
        if not self._samples:
            return {"n": 0, "mean_ms": 0.0, "p50_ms": 0.0, "p90_ms": 0.0, "p99_ms": 0.0}
        return {
            "n": len(self._samples),
            "mean_ms": 1e3 * sum(self._samples) / len(self._samples),
            "p50_ms": 1e3 * self.percentile(50),
            "p90_ms": 1e3 * self.percentile(90),
            "p99_ms": 1e3 * self.percentile(99),
        }
