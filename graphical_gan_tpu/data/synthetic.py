"""Shape/dtype-faithful synthetic datasets (hermetic benchmarks & tests)."""

from __future__ import annotations

import numpy as np


def images_unit(n: int, output_dim: int, seed: int = 0) -> np.ndarray:
    """float32 in [0,1] — mnist-like flat images."""
    return np.random.RandomState(seed).rand(n, output_dim).astype("float32")


def images_int(n: int, output_dim: int, seed: int = 0) -> np.ndarray:
    """int32 pixel values in [0,255] — cifar/svhn/celebA-like flat images."""
    return np.random.RandomState(seed).randint(
        0, 256, size=(n, output_dim)).astype("int32")


def labels(n: int, n_classes: int, seed: int = 1) -> np.ndarray:
    return np.random.RandomState(seed).randint(
        0, n_classes, size=(n,)).astype("int64")


def videos_unit(n: int, seq_len: int, output_dim: int, seed: int = 0
                ) -> np.ndarray:
    return np.random.RandomState(seed).rand(
        n, seq_len, output_dim).astype("float32")
