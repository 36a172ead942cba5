"""Explicit, splittable RNG utilities.

The reference used implicit global RNG everywhere (``tf.random_normal`` /
``np.random`` with ambient state).  On TPU we thread explicit
``jax.random`` keys: deterministic, reproducible, and device-invariant under
data parallelism (the batch axis is sharded, but a single key generates the
full logical batch, so per-example noise does not depend on the device
layout).
"""

from __future__ import annotations

from typing import Iterator

import jax


class KeyStream:
    """A host-side iterator of fresh PRNG keys (one per train iteration)."""

    def __init__(self, seed: int):
        self._seed = seed
        self._salt = 0
        self._key = jax.random.PRNGKey(seed)
        self._count = 0

    def __iter__(self) -> Iterator[jax.Array]:
        return self

    def __next__(self) -> jax.Array:
        self._count += 1
        return jax.random.fold_in(self._key, self._count)

    def next(self) -> jax.Array:
        return self.__next__()

    @property
    def count(self) -> int:
        return self._count

    def state(self) -> int:
        """Checkpointable position; restore with ``restore``."""
        return self._count

    def restore(self, count: int) -> None:
        self._count = count

    @property
    def salt(self) -> int:
        return self._salt

    def set_salt(self, salt: int) -> None:
        """Re-base the stream on ``fold_in(PRNGKey(seed), salt)``.

        salt=0 keeps the original stream bit-exactly.  The trainer's
        divergence guard uses a nonzero salt after a rollback so the retry
        takes a different random trajectory from the restored state instead
        of replaying the exact keys that diverged.  The salt is part of the
        checkpoint so a later resume continues the salted stream.
        """
        salt = int(salt)
        self._salt = salt
        base = jax.random.PRNGKey(self._seed)
        self._key = jax.random.fold_in(base, salt) if salt else base
