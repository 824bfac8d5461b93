"""Tracing/profiling hooks (SURVEY.md 5.1): jax.profiler traces (XProf /
Perfetto-compatible) around the map and EM stages. The reference has no
tracing beyond log timestamps."""

from __future__ import annotations

import contextlib
import logging

log = logging.getLogger(__name__)


@contextlib.contextmanager
def maybe_trace(trace_dir: str | None, label: str = "seekmer"):
    """Wrap a pipeline stage in a jax.profiler trace when trace_dir is set.

    View with xprof/tensorboard or load the .trace.json.gz into Perfetto.
    """
    if not trace_dir:
        yield
        return
    import jax

    log.info("profiling '%s' -> %s", label, trace_dir)
    with jax.profiler.trace(trace_dir):
        with jax.profiler.TraceAnnotation(label):
            yield


@contextlib.contextmanager
def annotate(label: str):
    """Named region inside an active trace (no-op cost when not tracing)."""
    import jax

    with jax.profiler.TraceAnnotation(label):
        yield
