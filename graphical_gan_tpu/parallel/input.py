"""Multi-host input placement helpers.

Each host feeds only its local shard of the global batch; these helpers
assemble the global jax.Array from per-process data (single-process they
reduce to a plain device_put with the batch sharding).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def global_batch_sharding(mesh: Mesh, ndim: int, axis: str = "data",
                          batch_dim: int = 1) -> NamedSharding:
    spec = [None] * ndim
    spec[batch_dim] = axis
    return NamedSharding(mesh, P(*spec))


def _data_axis_factor(mesh: Mesh, axis: str) -> int:
    """global_batch / local_batch: the number of data-axis positions NOT
    covered by this process's addressable devices (works for meshes whose
    model axis crosses hosts)."""
    axis_idx = list(mesh.axis_names).index(axis)
    local = set()
    addressable = set(d.id for d in jax.local_devices())
    it = np.ndindex(mesh.devices.shape)
    for coords in it:
        if mesh.devices[coords].id in addressable:
            local.add(coords[axis_idx])
    n_local = len(local)
    size = mesh.shape[axis]
    if size % n_local != 0:
        raise ValueError(
            f"data axis size {size} not divisible by this process's "
            f"covered positions {n_local}; choose a mesh whose {axis!r} "
            f"axis aligns with process boundaries")
    return size // n_local


def host_local_batches(mesh: Mesh, local_batch, axis: str = "data",
                       batch_dim: int = 1):
    """Assemble a globally-sharded batch array from THIS process's local
    slice.  ``local_batch``: [(1+k), B_local, ...] where B_local is this
    process's portion of the global batch (global = B_local x the number of
    data-axis positions owned by other processes).  Works for pytrees.
    """
    factor = _data_axis_factor(mesh, axis)

    def put(x):
        x = np.asarray(x)
        global_shape = list(x.shape)
        global_shape[batch_dim] = x.shape[batch_dim] * factor
        sharding = global_batch_sharding(mesh, x.ndim, axis, batch_dim)
        return jax.make_array_from_process_local_data(
            sharding, x, tuple(global_shape))

    return jax.tree.map(put, local_batch)
