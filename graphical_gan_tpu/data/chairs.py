"""3D-chairs video loader — rebuild of ``tflib/chairs.py``.

Loads ``chairs_{size}.npy`` of 31-frame renders; ``seq_length`` selects
1 (flat frames), 4 (random clip), 31 (full), or a prefix
(``tflib/chairs.py:15-34``).  Yields float [B, L, size*size*3] (or
[B, size*size*3] for seq_length=1).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np



def _rand_clip(rng: np.random.RandomState, x: np.ndarray, seq_length: int):
    start = rng.randint(x.shape[0] - seq_length + 1)
    return x[start:start + seq_length]


def _chair_generator(batch_size, seq_length, data, size, seed=None):
    rng = np.random.RandomState(seed)

    def get_epoch():
        if seq_length == 1:
            data_all = data.reshape(-1, size * size * 3)
        elif seq_length == 31:
            data_all = data.reshape(-1, 31, size * size * 3)
        elif seq_length == 4:
            data_all = np.asarray([_rand_clip(rng, d, seq_length)
                                   for d in data])
        else:
            data_all = data[:, :seq_length, :]
        data_shuf = data_all.copy()
        rng.shuffle(data_shuf)
        for i in range(data_shuf.shape[0] // batch_size):
            yield data_shuf[i * batch_size:(i + 1) * batch_size]

    return get_epoch


def load(seq_length: int, batch_size: int, size: int = 64,
         data_dir: Optional[str] = None, num_dev: int = 200,
         synthetic_fallback: bool = True, synthetic_size: int = 1000):
    path = os.path.join(data_dir or "", f"chairs_{size}.npy")
    if data_dir and os.path.isfile(path):
        data = np.load(path)
        data = np.transpose(data, (0, 1, 4, 2, 3))   # -> (N,31,C,H,W)
        data = data.reshape(-1, 31, size * size * 3).astype(np.float32)
    else:
        if not synthetic_fallback:
            raise FileNotFoundError(path)
        # int-range pixel values: the chairs contract is raw [0,255] ints
        # normalized by /256 at the model boundary (ssgan_chairs:508)
        data = np.random.RandomState(3).randint(
            0, 256, size=(synthetic_size, 31, size * size * 3)
        ).astype(np.float32)
    data = data.copy()
    np.random.RandomState(0).shuffle(data)
    return (
        _chair_generator(batch_size, seq_length, data[num_dev:], size, 1),
        _chair_generator(batch_size, seq_length, data[:num_dev], size, 2),
    )
