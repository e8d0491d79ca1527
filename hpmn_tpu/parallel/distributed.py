"""Multi-host bootstrap.

Reference equivalent: NONE (single-process reference, SURVEY.md §2.3); this
is the multi-host startup the TPU rebuild needs (SURVEY.md §5.8): one
``jax.distributed.initialize`` per process, after which ``jax.devices()``
spans the pod slice, the 2-D mesh in ``parallel.mesh`` covers all chips,
and per-host input sharding is handled by the DataLoader's
``process_index/process_count`` arguments (SURVEY.md §2.1 "Data loader").

On Cloud TPU the coordinator/process topology is auto-detected from the
TPU environment, so ``initialize()`` with no arguments is the common path;
explicit arguments support CPU/GPU clusters and the multi-process CPU
test harness (tests/test_distributed.py).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Idempotent jax.distributed.initialize wrapper. No-ops when the
    process is already initialized or is a true single-process run."""
    if num_processes is not None and num_processes <= 1 \
            and coordinator_address is None:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
