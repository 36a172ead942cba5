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


def host_local_batches(mesh: Mesh, local_batch, axis: str = "data",
                       batch_dim: int = 1):
    """Assemble a globally-sharded batch array from THIS process's local
    slice.  ``local_batch``: [(1+k), B_local, ...] where B_local is the
    per-process portion of the global batch.  Works for pytrees.
    """
    def put(x):
        x = np.asarray(x)
        # global batch dim = local batch * number of processes
        global_shape = list(x.shape)
        global_shape[batch_dim] = x.shape[batch_dim] * jax.process_count()
        sharding = global_batch_sharding(mesh, x.ndim, axis, batch_dim)
        return jax.make_array_from_process_local_data(
            sharding, x, tuple(global_shape))

    return jax.tree.map(put, local_batch)
