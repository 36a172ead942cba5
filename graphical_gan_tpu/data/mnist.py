"""MNIST loader — rebuild of ``tflib/mnist.py``.

``load(batch_size, test_batch_size)`` returns (train, dev, test) epoch-
generator factories of ``(images[B,784] float32 in [0,1], labels[B])``.
Downloads ``mnist.pkl.gz`` to /tmp when possible (``tflib/mnist.py:50-55``);
falls back to a deterministic synthetic set when offline.
"""

from __future__ import annotations

import gzip
import os
import pickle
from typing import Optional, Tuple

import numpy as np

from graphical_gan_tpu.data import synthetic
from graphical_gan_tpu.data.common import generator_factory, maybe_download

URL = "https://ossci-datasets.s3.amazonaws.com/mnist/mnist.pkl.gz"
URL_FALLBACK = "http://www.iro.umontreal.ca/~lisa/deep/data/mnist/mnist.pkl.gz"
DEFAULT_PATH = "/tmp/mnist.pkl.gz"


def _load_raw(path: str):
    with gzip.open(path, "rb") as f:
        # py2 pickle from the original file
        return pickle.load(f, encoding="latin1")


def _synthetic_split(n: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    return (synthetic.images_unit(n, 784, seed=seed),
            synthetic.labels(n, 10, seed=seed + 1))


def load(batch_size: int, test_batch_size: int,
         n_labelled: Optional[int] = None,
         path: str = DEFAULT_PATH, synthetic_fallback: bool = True,
         synthetic_sizes: Tuple[int, int, int] = (50000, 10000, 10000)):
    data = None
    if os.path.isfile(path) or maybe_download(URL, path) \
            or maybe_download(URL_FALLBACK, path):
        try:
            data = _load_raw(path)
        except Exception:
            data = None
    if data is None:
        if not synthetic_fallback:
            raise FileNotFoundError(path)
        data = tuple(_synthetic_split(n, i)
                     for i, n in enumerate(synthetic_sizes))

    (train_x, train_y), (dev_x, dev_y), (test_x, test_y) = data
    train_x = np.ascontiguousarray(train_x, dtype=np.float32)
    dev_x = np.ascontiguousarray(dev_x, dtype=np.float32)
    test_x = np.ascontiguousarray(test_x, dtype=np.float32)

    def make(x, y, bs):
        if n_labelled is None:
            return generator_factory(bs, x, np.asarray(y))
        # semi-supervised mask: n_labelled examples flagged 1, shuffled with
        # the data each epoch (``tflib/mnist.py:17-20,27-29``).  Divergence:
        # the reference yields the FULL (unbatched) mask vector with every
        # batch — an apparent bug; we yield the per-batch mask slice.
        labelled = np.zeros(len(x), dtype=np.int32)
        labelled[:n_labelled] = 1
        return generator_factory(bs, x, np.asarray(y), labelled)

    return (
        make(train_x, train_y, batch_size),
        make(dev_x, dev_y, test_batch_size),
        make(test_x, test_y, test_batch_size),
    )
