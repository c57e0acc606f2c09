"""Profiling / tracing helpers (SURVEY §5 tracing row).

The reference exposes ad-hoc CUDA event timing inside its kernels; on TPU
the idiomatic equivalent is the XLA profiler: `trace(logdir)` captures a
full device trace viewable in TensorBoard / Perfetto, and `annotate(name)`
marks host-side regions so generator phases (prefill, decode, sampling)
show up on the timeline.

Note: tunneled/remote TPU backends may not support device-side trace
collection (the profiler logs an ABORTED error and still captures the
host timeline); on directly-attached TPUs the full device trace works.
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["trace", "annotate", "start_server"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA device trace for the enclosed region:

        with profiling.trace("/tmp/trace"):
            generator.iterate()
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host-side region on the profiler timeline (context manager)."""
    return jax.profiler.TraceAnnotation(name)


def start_server(port: int = 9999):
    """On-demand profiling server (connect with TensorBoard's capture
    button); returns the server object."""
    return jax.profiler.start_server(port)
