"""MNIST loader — rebuild of ``tflib/mnist.py``.

``load(batch_size, test_batch_size)`` returns (train, dev, test) epoch-
generator factories of ``(images[B,784] float32 in [0,1], labels[B])`` with
the reference's 50k/10k/10k splits.

Acquisition order: existing ``mnist.pkl.gz`` (the reference's format,
``tflib/mnist.py:50-55``) -> the original pickle URL -> the four idx files
from the ossci mirror (assembled into the same splits) -> deterministic
synthetic data (with a loud warning; the TPU cluster may have zero egress).
"""

from __future__ import annotations

import gzip
import os
import pickle
import struct
import sys
from typing import Optional, Tuple

import numpy as np

from graphical_gan_tpu.data import synthetic
from graphical_gan_tpu.data.common import generator_factory, maybe_download

URL_PKL = "http://www.iro.umontreal.ca/~lisa/deep/data/mnist/mnist.pkl.gz"
IDX_BASE = "https://ossci-datasets.s3.amazonaws.com/mnist/"
IDX_FILES = {
    "train_x": "train-images-idx3-ubyte.gz",
    "train_y": "train-labels-idx1-ubyte.gz",
    "test_x": "t10k-images-idx3-ubyte.gz",
    "test_y": "t10k-labels-idx1-ubyte.gz",
}
DEFAULT_PATH = "/tmp/mnist.pkl.gz"


def _load_pickle(path: str):
    with gzip.open(path, "rb") as f:
        # py2 pickle from the original file
        return pickle.load(f, encoding="latin1")


def _read_idx(path: str) -> np.ndarray:
    with gzip.open(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        dims = [struct.unpack(">I", f.read(4))[0] for _ in range(ndim)]
        data = np.frombuffer(f.read(), dtype=np.uint8)
    return data.reshape(dims)


def _load_idx_dir(dirpath: str):
    """Assemble the reference's (train, dev, test) 50k/10k/10k splits from
    the four idx files."""
    tx = _read_idx(os.path.join(dirpath, IDX_FILES["train_x"]))
    ty = _read_idx(os.path.join(dirpath, IDX_FILES["train_y"]))
    ex = _read_idx(os.path.join(dirpath, IDX_FILES["test_x"]))
    ey = _read_idx(os.path.join(dirpath, IDX_FILES["test_y"]))
    tx = (tx.reshape(-1, 784).astype(np.float32)) / 255.0
    ex = (ex.reshape(-1, 784).astype(np.float32)) / 255.0
    return ((tx[:50000], ty[:50000].astype(np.int64)),
            (tx[50000:], ty[50000:].astype(np.int64)),
            (ex, ey.astype(np.int64)))


def _try_idx_download(dirpath: str):
    ok = all(
        os.path.isfile(os.path.join(dirpath, fn))
        or maybe_download(IDX_BASE + fn, os.path.join(dirpath, fn))
        for fn in IDX_FILES.values())
    if not ok:
        return None
    try:
        return _load_idx_dir(dirpath)
    except Exception:
        return None


def _synthetic_split(n: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    return (synthetic.images_unit(n, 784, seed=seed),
            synthetic.labels(n, 10, seed=seed + 1))


def load(batch_size: int, test_batch_size: int,
         n_labelled: Optional[int] = None,
         path: str = DEFAULT_PATH, synthetic_fallback: bool = True,
         synthetic_sizes: Tuple[int, int, int] = (50000, 10000, 10000)):
    data = None
    if os.path.isfile(path) or maybe_download(URL_PKL, path):
        try:
            data = _load_pickle(path)
        except Exception:
            data = None
    if data is None:
        data = _try_idx_download(os.path.dirname(os.path.abspath(path))
                                 or "/tmp")
    if data is None:
        if not synthetic_fallback:
            raise FileNotFoundError(path)
        print("WARNING: MNIST could not be loaded or downloaded — using "
              "SYNTHETIC random data. Results will be meaningless for "
              "sample quality; pre-place mnist.pkl.gz or the idx files to "
              "train on real data.", file=sys.stderr)
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
