"""Multi-host bootstrap.

The reference has no distributed backend (SURVEY.md §5: CUDA_VISIBLE_DEVICES
is its whole placement story).  Multi-host here is standard JAX:
`jax.distributed.initialize` forms the process group (DCN), after which
`jax.devices()` spans the slice and every mesh/shard_map/pjit path in this
framework works unchanged — collectives ride ICI within a slice and DCN
across slices, inserted by XLA from the same PartitionSpecs.

This module is exercised single-process in CI (no multi-host hardware in
the build image); on a pod slice, call `initialize_from_env()` once at
process start.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_from_env(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX process group from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; on Cloud
    TPU all three are auto-detected and plain initialize() suffices).

    Returns True if a multi-process group was formed, False when running
    single-process (nothing to do)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env(
        "JAX_PROCESS_ID"
    )
    if coordinator_address is None and num_processes is None:
        try:  # Cloud TPU autodetection path
            jax.distributed.initialize()
            return jax.process_count() > 1
        except Exception:
            return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def global_mesh(data: int = -1, model: int = 1):
    """Mesh over ALL devices in the slice (every process sees the same
    global device list after initialize)."""
    from fashionvisualexpl_tpu.core.mesh import make_mesh

    return make_mesh(data=data, model=model, devices=jax.devices())
