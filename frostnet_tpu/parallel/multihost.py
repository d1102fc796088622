"""Multi-host initialization.

The reference reaches multi-node only through timm's external DDP launcher
(training_commands.txt, SURVEY.md §2.8). Here multi-host is the same pjit
program over a bigger mesh: call :func:`initialize` once per process before
any jax usage, then every trainer works unchanged — allreduce rides ICI
within a slice and DCN across slices (XLA picks the collectives).
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var defaults (JAX_COORDINATOR_
    ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). No-op when single-process.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def is_primary() -> bool:
    """True on the checkpoint/logging host (replaces the DataParallel
    `.module.state_dict()` host-0 dance, Classification/train.py:193-196)."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """This process's slice of a globally-indexed host batch."""
    per = global_batch // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
