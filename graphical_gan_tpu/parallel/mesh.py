"""Data parallelism over a ``jax.sharding.Mesh``.

The reference had no parallelism of any kind (single device, one tf.Session,
feed_dict — SURVEY §2.10/2.11).  The TPU-native scaling story is simple and
idiomatic:

- 1-D mesh axis ``'data'`` over all chips,
- batch axis of every raw input sharded over ``'data'``,
- params + optimizer states replicated,
- the SAME fused train step (``train.step``) jitted with those shardings:
  XLA inserts one psum over ICI per player update for the gradient
  all-reduce — there is no hand-written collective code to maintain.

Model-internal RNG draws full logical-batch arrays from a replicated key, so
noise/codes are identical to the single-chip program for a given key: DP is
numerically a pure batch-partitioning of the reference semantics.

Tensor-parallel sharding of the conv channel dims is a natural extension
(the 64x64 CelebA nets are the first candidates) and can be layered on by
extending the param-sharding rule in ``make_parallel_train_step``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are visible "
                f"({jax.default_backend()}); on CPU set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, batch, axis: str = "data",
                batch_dim: int = 1):
    """Place stacked raw batches [(1+k), B, ...] with B sharded over the mesh."""
    def put(x):
        spec = [None] * x.ndim
        spec[batch_dim] = axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_parallel_train_step(model, mesh: Mesh,
                             critic_iters: Optional[int] = None,
                             axis: str = "data", donate: bool = True,
                             lr_scale=None):
    """Jit the fused step with DP shardings over ``mesh``.

    Returns ``(step, init_state, place)`` where ``place(state)`` replicates a
    host-built TrainState onto the mesh and ``step(state, raw_batches, key,
    do_gen)`` expects ``raw_batches`` already placed by ``shard_batch`` (or
    any array — constraint shardings re-place it).
    """
    from graphical_gan_tpu.train.step import make_train_step

    raw_step, init_state = make_train_step(model, critic_iters=critic_iters,
                                           lr_scale=lr_scale, jit=False)

    repl = NamedSharding(mesh, P())

    def batch_sharding(ndim):
        spec = [None] * ndim
        spec[1] = axis  # [(1+k), B, ...] — shard the batch dim
        return NamedSharding(mesh, P(*spec))

    def step(state, raw_batches, key, do_gen):
        raw_batches = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, batch_sharding(x.ndim)),
            raw_batches)
        return raw_step(state, raw_batches, key, do_gen)

    jitted = jax.jit(
        step,
        in_shardings=(repl, None, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )

    def place(state):
        return replicate(mesh, state)

    return jitted, init_state, place
