"""Fault injection + failure guards.

Net-new subsystem (SURVEY.md §5.3: the reference's only failure handling is
a NaN sys.exit and a bare ``except: continue`` over malformed dataset rows).
The injector lets tests and chaos runs exercise the checkpoint/resume story:
an injected fault raises at a controlled point in the input pipeline, and a
resumed trainer must continue from the last checkpoint.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class InjectedFault(RuntimeError):
    """Raised by the fault injector; never raised by real components."""


class FaultInjector:
    """Probabilistic fault injection, seedable for deterministic tests.

    Enabled either programmatically (rate > 0) or via the environment
    variable MMSSL_TPU_FAULT_RATE (float in [0, 1]).
    """

    def __init__(self, rate: Optional[float] = None, seed: int = 0):
        if rate is None:
            rate = float(os.environ.get("MMSSL_TPU_FAULT_RATE", "0") or 0)
        self.rate = rate
        self._rng = np.random.default_rng(seed)
        self.fired = 0

    def maybe_fail(self, where: str) -> None:
        if self.rate > 0 and self._rng.random() < self.rate:
            self.fired += 1
            raise InjectedFault(f"injected fault at {where} (#{self.fired})")


def check_finite(name: str, value: float) -> None:
    """Loud failure guard replacing the reference's silent sys.exit."""
    if not np.isfinite(value):
        raise FloatingPointError(f"non-finite {name}: {value}")
