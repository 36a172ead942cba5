"""3D-chairs video loader — rebuild of ``tflib/chairs.py``.

Loads ``chairs_{size}.npy`` of 31-frame renders; ``seq_length`` selects
1 (flat frames), 4 (random clip), 31 (full), or a prefix
(``tflib/chairs.py:15-34``).  Yields float [B, L, size*size*3] (or
[B, size*size*3] for seq_length=1).  ``convert_to_numpy`` is the offline
render-png -> npy converter (``tflib/chairs.py:61-83``).
"""

from __future__ import annotations

import os
from glob import glob
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


def center_crop(image: np.ndarray, size: int) -> np.ndarray:
    """``tflib/chairs.py:61-64`` — fixed crop ``[140:460, 140:460]`` of a
    600x600 render, then bilinear resize to (size, size)."""
    from PIL import Image
    image = image[140:460, 140:460, :]
    img = Image.fromarray(image.astype(np.uint8)).resize(
        (size, size), Image.BILINEAR)
    return np.asarray(img)


def convert_to_numpy(data_path: str, size: int = 64,
                     out_path: Optional[str] = None) -> str:
    """Offline render-png -> npy converter (``tflib/chairs.py:74-83``).

    Globs ``*/renders/*.png`` under ``data_path`` in sorted order (the
    rendered-chairs layout: one directory per chair, 31 azimuth frames),
    center-crops + resizes each frame, stacks to int32
    ``(n_chairs, 31, size, size, 3)``, and saves ``chairs_{size}.npy``
    next to ``data_path`` (or at ``out_path``).  The loader's expected
    on-disk layout is exactly this array (``load`` transposes to NCHW).
    """
    from PIL import Image
    files = sorted(glob(os.path.join(data_path, "*", "renders", "*.png")))
    if not files:
        raise FileNotFoundError(
            f"no */renders/*.png files under {data_path!r}")
    if len(files) % 31 != 0:
        raise ValueError(
            f"expected a multiple of 31 frames (31 renders per chair), "
            f"got {len(files)}")
    frames = []
    for f in files:
        img = np.asarray(Image.open(f).convert("RGB"), dtype=np.float64)
        frames.append(center_crop(img, size))
    arr = np.asarray(frames).astype(np.int32)
    arr = arr.reshape(-1, 31, size, size, 3)
    if out_path is None:
        out_path = os.path.join(data_path, f"chairs_{size}.npy")
    np.save(out_path, arr)
    return out_path if out_path.endswith(".npy") else out_path + ".npy"
