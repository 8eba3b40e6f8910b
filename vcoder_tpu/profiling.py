"""Tracing/profiling subsystem.

The reference has no profiling support at all (SURVEY.md §5: closest
artifact is a wandb flag). Here tracing is first-class:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace (XLA ops, HBM, fusion view).
* :func:`annotate` — named region annotation visible in the trace.
* :class:`StepTimer` — lightweight host-side step timing with percentile
  summaries (TTFT/step-time p50/p90/p99), used by bench and the serving
  engine.

Enable ad hoc with VCODER_TPU_TRACE=/path/to/logdir — the train loop and
the serving engine check it at startup.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str, *, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(
        logdir, create_perfetto_link=create_perfetto_link
    )
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def maybe_trace(default_logdir: Optional[str] = None):
    """Trace iff VCODER_TPU_TRACE (or default_logdir) is set."""
    logdir = os.environ.get("VCODER_TPU_TRACE", default_logdir)
    if logdir:
        with trace(logdir):
            yield logdir
    else:
        yield None


class StepTimer:
    """Accumulates named duration samples; prints percentile summaries."""

    def __init__(self):
        self.samples: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples.setdefault(name, []).append(
                time.perf_counter() - t0
            )

    def record(self, name: str, seconds: float) -> None:
        self.samples.setdefault(name, []).append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self.samples.items():
            arr = np.asarray(vals)
            out[name] = {
                "count": int(arr.size),
                "mean_ms": float(arr.mean() * 1e3),
                "p50_ms": float(np.percentile(arr, 50) * 1e3),
                "p90_ms": float(np.percentile(arr, 90) * 1e3),
                "p99_ms": float(np.percentile(arr, 99) * 1e3),
            }
        return out

    def format_summary(self) -> str:
        lines = []
        for name, s in self.summary().items():
            lines.append(
                f"{name}: n={s['count']} mean={s['mean_ms']:.2f}ms"
                f" p50={s['p50_ms']:.2f}ms p90={s['p90_ms']:.2f}ms"
                f" p99={s['p99_ms']:.2f}ms"
            )
        return "\n".join(lines)
