"""On-device resident datasets.

CIFAR-10/MNIST-scale datasets fit entirely in HBM (CIFAR-10 train split is
~150 MB as int32, 50 MB as uint8), so the TPU-idiomatic input pipeline is:
upload the WHOLE dataset once, then draw each iteration's (1+k) batches by
on-device random gather inside the fused train step's program — zero
host->device transfers in the hot loop (the reference paid a feed_dict copy
per sub-update, ``gan_inference_cifar10.py:434-446``).

``sample_batches(data, key, n_batches, batch_size)`` is jit/pjit friendly;
under DP the gather shards with the batch axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def to_device(array: np.ndarray, dtype=None, sharding=None) -> jax.Array:
    """Upload a host array once (optionally converting dtype / sharding)."""
    if dtype is not None:
        array = np.asarray(array, dtype=dtype)
    if sharding is not None:
        return jax.device_put(array, sharding)
    return jax.device_put(array)


def sample_batches(data: jax.Array, key: jax.Array, n_batches: int,
                   batch_size: int) -> jax.Array:
    """Draw [n_batches, batch_size, ...] by uniform on-device sampling
    (with replacement — an epochless stream, statistically equivalent to the
    reference's reshuffled epochs for GAN training)."""
    n = data.shape[0]
    idx = jax.random.randint(key, (n_batches * batch_size,), 0, n)
    batch = jnp.take(data, idx, axis=0)
    return batch.reshape((n_batches, batch_size) + data.shape[1:])


def sample_batches_tree(data, key: jax.Array, n_batches: int,
                        batch_size: int):
    """``sample_batches`` over a pytree of aligned arrays (e.g. ssgan's
    {'x','y'}): ONE index draw shared by every leaf, so image/label pairing
    is preserved."""
    n = jax.tree.leaves(data)[0].shape[0]
    idx = jax.random.randint(key, (n_batches * batch_size,), 0, n)

    def take(x):
        return jnp.take(x, idx, axis=0).reshape(
            (n_batches, batch_size) + x.shape[1:])

    return jax.tree.map(take, data)


def make_sampler(data: jax.Array, n_batches: int, batch_size: int):
    """Jitted sampler closure over the resident dataset."""

    @jax.jit
    def sample(key):
        return sample_batches(data, key, n_batches, batch_size)

    return sample


def epoch_batches_ondevice(data: jax.Array, key: jax.Array,
                           batch_size: int) -> jax.Array:
    """One shuffled epoch as [n_batches, batch_size, ...] — on-device
    permutation without replacement (the reference's epoch semantics,
    ``tflib/cifar10.py:32-39``), remainder dropped.  Use inside a jitted
    loop that scans over the leading axis."""
    n = data.shape[0]
    n_batches = n // batch_size
    perm = jax.random.permutation(key, n)[:n_batches * batch_size]
    batch = jnp.take(data, perm, axis=0)
    return batch.reshape((n_batches, batch_size) + data.shape[1:])
