"""Multi-host bring-up.

Net-new (SURVEY.md §2.5: the reference has no distributed backend at all).
On a TPU pod slice, call :func:`initialize` once per process before any jax
computation; the (data, model) mesh from ``parallel.mesh`` then spans all
hosts' devices, with DCN traffic confined to the leading axis.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env fallbacks; no-op when single
    process and no coordinator is configured.

    Env fallbacks (for launchers that cannot pass arguments, e.g. the CLI's
    ``--distributed`` flag): ``MMSSL_TPU_COORDINATOR`` (host:port),
    ``MMSSL_TPU_NUM_PROCESSES``, ``MMSSL_TPU_PROCESS_ID``.  On TPU pod
    slices the latter two stay unset — jax auto-detects them from the TPU
    runtime; on manual CPU/GPU clusters they are required."""
    coordinator_address = coordinator_address or os.environ.get("MMSSL_TPU_COORDINATOR")
    if num_processes is None and os.environ.get("MMSSL_TPU_NUM_PROCESSES"):
        num_processes = int(os.environ["MMSSL_TPU_NUM_PROCESSES"])
    if process_id is None and os.environ.get("MMSSL_TPU_PROCESS_ID"):
        process_id = int(os.environ["MMSSL_TPU_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    return jax.process_index() == 0
