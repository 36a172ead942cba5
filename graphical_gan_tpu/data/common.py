"""Shared loader utilities.

All loaders reproduce the reference protocol: ``load(...)`` returns a tuple
of *epoch-generator factories* — each a zero-arg callable returning a fresh
iterator of numpy batches (``tflib/mnist.py:49-64`` et al.).  Shuffling is
the reference's paired-shuffle (one RNG state reused across arrays).

Every loader also accepts ``synthetic=True`` to produce shape/dtype-faithful
random data with no filesystem or network dependency (benchmarks and CI run
hermetically; the TPU cluster may have zero egress).
"""

from __future__ import annotations

import os
import urllib.request
from typing import Iterator, Optional

import numpy as np


def paired_shuffle(rng: np.random.RandomState, *arrays: np.ndarray) -> None:
    """In-place shuffle of several arrays with the same permutation
    (reference does it by re-seeding the global RNG state,
    ``tflib/mnist.py:10-14``)."""
    state = rng.get_state()
    for a in arrays:
        rng.set_state(state)
        rng.shuffle(a)


def epoch_batches(batch_size: int, *arrays: np.ndarray,
                  rng: Optional[np.random.RandomState] = None,
                  drop_remainder: bool = True) -> Iterator:
    """One shuffled epoch of aligned batches over ``arrays``."""
    from graphical_gan_tpu.native.batcher_ext import take_rows

    rng = rng or np.random.RandomState()
    n = len(arrays[0])
    perm = rng.permutation(n)
    n_batches = n // batch_size if drop_remainder else -(-n // batch_size)
    for i in range(n_batches):
        idx = perm[i * batch_size:(i + 1) * batch_size]
        # take_rows = a[idx] with a multithreaded C++ gather for large rows
        # (native/batcher.cc); numpy below the crossover or without g++.
        out = tuple(take_rows(a, idx) for a in arrays)
        yield out if len(out) > 1 else out[0]


def generator_factory(batch_size: int, *arrays, seed: Optional[int] = None):
    rng = np.random.RandomState(seed)

    def get_epoch():
        return epoch_batches(batch_size, *arrays, rng=rng)

    return get_epoch


def materialize_epoch(factory, dtype=None):
    """Collect one full epoch from a generator factory into a single array
    (first element of tuple batches — the images; dict batches concatenate
    per key).  Used to build the on-device resident dataset for the hot loop
    (see ``data.ondevice`` / ``train.trainer``): small datasets
    (mnist/cifar10/svhn) fit in HBM whole, so the host feeds the device
    exactly once per run.

    ``dtype`` casts each (array) batch as it arrives — e.g. celebA's raw
    pixels to uint8 — so the host never holds the epoch at a wider dtype
    (202,599 x 12,288 is 2.5 GB as uint8 but 10 GB as int32)."""
    xs = []
    for batch in factory():
        b = batch[0] if isinstance(batch, tuple) else batch
        if dtype is not None:
            if isinstance(b, dict):
                b = {k: np.asarray(v, dtype) for k, v in b.items()}
            else:
                b = np.asarray(b, dtype)
        xs.append(b)
    if isinstance(xs[0], dict):
        return {k: np.concatenate([b[k] for b in xs], axis=0)
                for k in xs[0]}
    return np.concatenate(xs, axis=0)


def maybe_download(url: str, path: str) -> bool:
    """Best-effort download; returns False on any failure (zero-egress envs)."""
    if os.path.isfile(path):
        return True
    try:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        urllib.request.urlretrieve(url, path)  # noqa: S310
        return True
    except Exception:
        return False
