"""SVHN loader — rebuild of ``tflib/svhn.py``.

Downloads the ``.mat`` files when possible; converts HWCN -> NCHW -> flat
int [B,3072]; maps label 10 -> 0 (``tflib/svhn.py:36-45``).
"""

from __future__ import annotations

import os

import numpy as np

from graphical_gan_tpu.data import synthetic
from graphical_gan_tpu.data.common import generator_factory, maybe_download

URL_TRAIN = "http://ufldl.stanford.edu/housenumbers/train_32x32.mat"
URL_TEST = "http://ufldl.stanford.edu/housenumbers/test_32x32.mat"


def _load_mat(path: str):
    from scipy.io import loadmat
    d = loadmat(path)
    x = d["X"]                      # HWCN
    y = d["y"].flatten()
    y[y == 10] = 0
    x = np.transpose(x, (3, 2, 0, 1)).reshape(-1, 32 * 32 * 3)
    return x.astype(np.int32), y.astype(np.int64)


def load(batch_size: int, data_dir: str = "/tmp/svhn",
         synthetic_fallback: bool = True, synthetic_sizes=(73257, 26032)):
    train_p = os.path.join(data_dir, "train_32x32.mat")
    test_p = os.path.join(data_dir, "test_32x32.mat")
    have = (os.path.isfile(train_p) or maybe_download(URL_TRAIN, train_p)) \
        and (os.path.isfile(test_p) or maybe_download(URL_TEST, test_p))
    if have:
        train = _load_mat(train_p)
        test = _load_mat(test_p)
    else:
        if not synthetic_fallback:
            raise FileNotFoundError(data_dir)
        train = (synthetic.images_int(synthetic_sizes[0], 3072, 0),
                 synthetic.labels(synthetic_sizes[0], 10))
        test = (synthetic.images_int(synthetic_sizes[1], 3072, 1),
                synthetic.labels(synthetic_sizes[1], 10))
    return (generator_factory(batch_size, *train),
            generator_factory(batch_size, *test))
