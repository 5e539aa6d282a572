"""Tracing / profiling helpers.

The reference has no built-in tracer (SURVEY §5: miniapps time with
``common::Timer``; pika task annotations feed external tools).  The
TPU-native equivalents are XLA traces: this module wraps ``jax.profiler``
so any framework call can be captured for TensorBoard/Perfetto, plus a
lightweight stage-timer used by the eigensolver driver.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def profile(log_dir: str):
    """Capture an XLA device trace: ``with trace.profile('/tmp/tb'): ...``.

    View with TensorBoard or Perfetto.  No-op if the backend does not
    support profiling (the tunneled axon platform may not).
    """
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name: str):
    """Named region visible in profiles (pika task-annotation analogue)."""
    return jax.profiler.TraceAnnotation(name)


#: stage times of the most recent traced eigensolver run
#: (``{stage_name: seconds}``); written by the driver when
#: ``trace_eigensolver_stages`` is on so harnesses (bench.py) can attach
#: a per-stage breakdown to their records without parsing stdout.
last_stage_times: Dict[str, float] = {}


class StageTimer:
    """Wall-clock stage timer (the reference's ``common::Timer``).

    Note: on the tunneled TPU platform wall times include dispatch queueing;
    use ``utils.timing.slope_time`` for kernel-level numbers.
    """

    def __init__(self):
        self._t0 = time.perf_counter()
        self._last = self._t0
        self.stages: Dict[str, float] = {}

    def mark(self, name: str) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self.stages[name] = self.stages.get(name, 0.0) + dt
        self._last = now
        return dt

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def report(self, file=None) -> None:
        import sys
        file = file or sys.stdout
        for k, v in self.stages.items():
            print(f"  {k}: {v:.3f}s", file=file)
        print(f"  total: {self.elapsed():.3f}s", file=file)
