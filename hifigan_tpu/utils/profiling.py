"""Tracing & profiling utilities.

Capability parity with the reference's observability (SURVEY.md §5.1):
one ``record_function`` annotation (``agent/sequence_generator.py:151``)
and ad-hoc ``time.time()`` wall-clocks around cascade stages
(``app/core/translation_engine.py:135``,
``evaluation/evaluation_framework.py:298-314``) — here upgraded to
first-class helpers:

* :func:`annotate` — ``jax.profiler.TraceAnnotation`` context (shows up
  in Perfetto/XProf traces);
* :func:`trace_to` — capture a device trace directory around a block;
* :class:`StageTimer` — wall-clock stage timing with summary stats
  (the cascade-engine / realtime-evaluator idiom);
* :func:`device_time` — honest per-call device timing (see
  :mod:`hifigan_tpu.utils.benchit` for why naive timing lies on this rig).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List

import jax


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Profiler trace annotation (no-op overhead outside capture)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace_to(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall-clock timings per named stage."""

    def __init__(self):
        self._records: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._records[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, dict]:
        out = {}
        for name, vals in self._records.items():
            out[name] = {
                "count": len(vals),
                "total_s": sum(vals),
                "mean_ms": 1e3 * sum(vals) / len(vals),
                "max_ms": 1e3 * max(vals),
            }
        return out

    def reset(self):
        self._records.clear()


def device_time(fn, args, iters: int = 16) -> float:
    """Seconds per call measured on device (chained-scan method)."""
    from hifigan_tpu.utils.benchit import chained_time

    return chained_time(fn, args, n=iters)
