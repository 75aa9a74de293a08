"""Profiling / tracing hooks.

The reference's only instrumentation is manual wall-clock timing with CUDA
sync fences (/root/reference/src/xvr/registrar/base.py:246-256). The TPU
equivalent adds `jax.profiler` traces (viewable in XProf/TensorBoard) plus the
same wall-clock bookkeeping:

* set ``XVR_PROFILE_DIR=/path`` to capture a trace of training steps 10-15
  (after compilation) or of one full registration;
* :func:`annotate` wraps host-side phases in named TraceAnnotations.
"""

from __future__ import annotations

import os
from contextlib import contextmanager


@contextmanager
def trace(logdir):
    """Capture a jax.profiler trace for the duration of the context."""
    import jax

    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def annotate(name: str):
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def maybe_trace_dir() -> str | None:
    return os.environ.get("XVR_PROFILE_DIR")
