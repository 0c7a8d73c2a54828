"""Profiling / tracing hooks.

The reference has none (SURVEY.md §5: "Tracing/profiling — absent", only tqdm
bars).  Here: a ``trace`` context manager around ``jax.profiler`` producing
TensorBoard-loadable traces, and a lightweight ``StepTimer`` that records
host-side step latencies to the run dir.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """``with trace(run_dir + '/trace'):`` captures a device profile."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-latency statistics + optional jsonl sink."""

    def __init__(self, log_path: Optional[str] = None, window: int = 50):
        self.log_path = log_path
        self.window = window
        self._times = []
        self._last = None
        self._f = open(log_path, "a", buffering=1) if log_path else None

    def tick(self, step: int, **extra):
        now = time.time()
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
            if self._f:
                self._f.write(json.dumps({"step": step, "dt": dt,
                                          "ts": now, **extra}) + "\n")
        self._last = now

    @property
    def mean(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def close(self):
        if self._f:
            self._f.close()


def annotate(name: str):
    """Named trace region (shows up in the profile timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
