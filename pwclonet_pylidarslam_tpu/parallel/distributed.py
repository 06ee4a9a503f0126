"""Multi-host bootstrap: ``jax.distributed`` initialization + host sharding.

Entry point for pod-slice runs (BASELINE north star: ≥2 hosts). Single-host
and hermetic-test runs skip initialization transparently; multi-host runs
call :func:`initialize` once at program start, after which
``parallel.make_mesh`` sees all global devices and the GSPMD/psum paths in
``data_parallel.py`` / ``sharded_backend.py`` ride ICI in-slice and DCN
across hosts without further changes.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize ``jax.distributed`` when running multi-host.

    Arguments default to the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) and to TPU-pod auto-detection
    when none are set. No-op for single-process runs.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    if coordinator_address is None and num_processes is None:
        # single host (or TPU pod with full auto-detect support)
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process environments raise; that's fine
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a globally-indexed batch owned by this host
    (per-host data sharding for the input pipeline)."""
    n_proc = jax.process_count()
    per_host = global_batch // n_proc
    if per_host * n_proc != global_batch:
        raise ValueError(f"global batch {global_batch} not divisible by {n_proc} hosts")
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def host_local_devices():
    return jax.local_devices()
