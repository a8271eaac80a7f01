"""Structured metric logging.

Replaces the reference's 14-line file appender with hardcoded author paths
(``MMSSL/utility/logging.py:4-14``) with JSONL metric streams + stdout,
multi-host aware (only process 0 writes).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import IO, Optional

import jax


class MetricLogger:
    def __init__(self, name: str = "run", path: Optional[str] = None, quiet: bool = False):
        self.name = name
        self.quiet = quiet
        self._fh: Optional[IO[str]] = None
        if path and jax.process_index() == 0:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")

    def log(self, **fields) -> None:
        if jax.process_index() != 0:
            return
        rec = {"ts": round(time.time(), 3), "run": self.name, **fields}
        line = json.dumps(rec, default=str)
        if not self.quiet:
            print(line, file=sys.stderr, flush=True)
        if self._fh is not None:
            self._fh.write(line + "\n")
            self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
