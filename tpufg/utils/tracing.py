"""Tracing & profiling.

The reference's only introspection is per-step INFO logs and the FPS window
(SURVEY.md §5.1); the TPU build integrates with jax.profiler: named trace
annotations around ingest / step / readback (visible in TensorBoard or
Perfetto), and a context manager that captures a full device trace.

Usage:
    with trace_session("/tmp/tpufg-trace"):   # or CLI --trace DIR
        ...
    with annotate("step"):
        ...
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_session(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span in the profiler timeline (host + device)."""
    return jax.profiler.TraceAnnotation(name)


def module_durations_ms(trace_dir: str) -> dict:
    """Per-invocation DEVICE durations (ms) of every XLA module in a
    jax.profiler trace, keyed by module name.

    This is the ground truth for rate claims on a relay-attached host:
    wall clock through the relay swings ~2x with relay weather (the same
    north-star program measured 4.74 and 9.88 ms/step in back-to-back
    campaigns of identical code), while the trace records what the chip
    itself did.  bench.py's p99 and tools/bench_matrix.py's device
    column both parse through here.  Returns {} when the backend's
    trace carries no "XLA Modules" lane (e.g. CPU interpret runs).
    """
    import glob
    import gzip
    import json

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        return {}
    ev = json.load(gzip.open(sorted(files)[-1]))
    lanes = {}
    for e in ev["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lanes[(e["pid"], e["tid"])] = e["args"].get("name", "")
    durs: dict = {}
    for e in ev["traceEvents"]:
        if (e.get("ph") == "X"
                and lanes.get((e.get("pid"), e.get("tid"))) == "XLA Modules"):
            durs.setdefault(e.get("name", ""), []).append(
                e.get("dur", 0) / 1e3)  # us -> ms
    return durs


@contextlib.contextmanager
def debug_checks(enabled: bool) -> Iterator[None]:
    """NaN/Inf guard for every computation in scope (jax debug_nans).

    The moral analog of the reference's Vulkan validation layers in debug
    builds (vulkan_context.hpp:51-59): heavy, off by default, catches
    silent numeric corruption at the op that produced it.
    """
    if not enabled:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
