"""Device mesh construction and sharding helpers.

The reference is single-process single-device (SURVEY.md §2.3); scaling here is
expressed through a 2-axis `jax.sharding.Mesh`:

- ``data``  — batch axis (data parallelism for BPR triplet batches)
- ``model`` — embedding-table row axis (the recommender analogue of TP/EP)

All collectives (psum for gradient reduction, gather+psum for row-sharded
embedding lookup, all_gather for the distributed top-k merge) ride this mesh
and are lowered by XLA onto ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh.  ``data=-1`` absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, model=1, devices=jax.devices()[:1])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over `data`."""
    return NamedSharding(mesh, P(DATA_AXIS))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Row-shard an embedding table over `model` (rows, then feature dim whole)."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def is_trivial(mesh: Mesh) -> bool:
    return mesh.devices.size == 1
