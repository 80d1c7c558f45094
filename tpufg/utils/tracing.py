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
