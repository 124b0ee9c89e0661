"""Profiling hooks.

The reference's only observability is kernel nanoseconds from tapa::invoke
(src/sextans-host.cpp:237-252). Here we add first-class JAX profiler traces
(XProf-compatible) around any callable — SURVEY.md §5 "Tracing / profiling".
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax

__all__ = ["trace", "annotate"]


@contextlib.contextmanager
def trace(logdir="/tmp/sextans_tpu_trace"):
    """Capture a device trace viewable in XProf/TensorBoard.

    >>> with trace("/tmp/tr"):
    ...     plan(b, alpha, beta, c).block_until_ready()
    """
    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir))
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
