"""Profiling / tracing hooks.

Net-new subsystem (SURVEY.md §5.1: the reference has only wall-clock prints
and dead visdom/tensorboard imports).  Thin wrappers over jax.profiler so
trainers and benchmarks can expose a trace server or capture step traces,
plus a host-side step timer that aggregates percentiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


def start_profiler_server(port: int = 9999) -> None:
    """Expose the profiler gRPC endpoint (connect with TensorBoard/xprof)."""
    jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace for the enclosed block."""
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler timelines."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Host-side step timing with percentile summaries."""

    def __init__(self) -> None:
        self._samples: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        assert self._t0 is not None, "start() not called"
        dt = time.perf_counter() - self._t0
        self._samples.append(dt)
        self._t0 = None
        return dt

    @contextlib.contextmanager
    def measure(self):
        self.start()
        yield
        self.stop()

    def summary(self) -> Dict[str, float]:
        if not self._samples:
            return {}
        arr = np.asarray(self._samples)
        return {
            "count": int(arr.size),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
            "p99_ms": float(np.percentile(arr, 99) * 1e3),
        }

    def reset(self) -> None:
        self._samples.clear()
