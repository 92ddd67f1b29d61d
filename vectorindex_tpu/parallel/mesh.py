"""Device mesh helpers.

The reference is single-node shared-memory; its partition-then-merge thread
code (IVFSelect.swift:127-145 + TopKMerge.swift:11) is the structural
ancestor of this layer (SURVEY.md §2.4, §5.8). Here the corpus (N) dimension
shards across a 1-D `data` mesh axis; per-shard top-k partials merge over ICI
with `all_gather`. Multi-slice (DCN) would add an outer axis the same way.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"
REPLICA_AXIS = "replica"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(
    n_replicas: int,
    n_data: Optional[int] = None,
    axes: tuple = (REPLICA_AXIS, DATA_AXIS),
    devices=None,
) -> Mesh:
    """2-D (replica × data) mesh — the DCN-ready layout (SURVEY.md §5.8):
    the corpus shards along `data` (ICI collectives stay inside a replica
    group / slice) and replicates across `replica`; queries shard across
    `replica` so each slice serves its own request stream. On multi-slice
    hardware the replica axis maps onto DCN, where only the tiny per-request
    routing (no corpus traffic) would cross slices."""
    devs = list(jax.devices() if devices is None else devices)
    if n_data is None:
        n_data = len(devs) // n_replicas
    need = n_replicas * n_data
    assert len(devs) >= need, f"need {need} devices, have {len(devs)}"
    grid = np.array(devs[:need]).reshape(n_replicas, n_data)
    return Mesh(grid, axes)


def corpus_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard rows (N) of a [N, ...] corpus array across the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_rows(mesh: Mesh, x: jax.Array, axis: str = DATA_AXIS) -> jax.Array:
    """Place a [N, ...] array row-sharded. N must divide the mesh size; pad
    first if needed (see pad_rows)."""
    return jax.device_put(x, corpus_sharding(mesh, axis))


def pad_rows(x, multiple: int):
    """Pad N up to a multiple (shard divisibility), returning (padded, n)."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    import jax.numpy as jnp

    pad = jnp.zeros((rem,) + tuple(x.shape[1:]), dtype=x.dtype)
    return jnp.concatenate([x, pad], axis=0), n
