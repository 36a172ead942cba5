"""CelebA loader — rebuild of ``tflib/celebA.py``.

Loads a pre-built ``celebA_64x64.npy`` (NCHW uint8), splits off ``num_dev``
dev examples (``tflib/celebA.py:21-35``); offline converter center-crops
202,599 jpgs to 64x64 (``:43-73``).  Yields flat int [B, 12288] batches
(images only — CelebA is unlabeled here).
"""

from __future__ import annotations

import os
from glob import glob
from typing import Optional

import numpy as np

from graphical_gan_tpu.data import synthetic
from graphical_gan_tpu.data.common import generator_factory


def load(batch_size: int, data_dir: Optional[str] = None,
         num_dev: int = 5000, synthetic_fallback: bool = True,
         synthetic_size: int = 202599):
    path = os.path.join(data_dir or "", "celebA_64x64.npy")
    if data_dir and os.path.isfile(path):
        data = np.load(path)
        data = data.reshape(data.shape[0], -1)
    else:
        if not synthetic_fallback:
            raise FileNotFoundError(path)
        data = synthetic.images_int(min(synthetic_size, 20000), 64 * 64 * 3, 7)
    data = data.copy()
    np.random.RandomState(0).shuffle(data)
    x_train = data[num_dev:]
    x_test = data[:num_dev]
    return (generator_factory(batch_size, x_train),
            generator_factory(batch_size, x_test))


def center_crop(x: np.ndarray, resize_h: int = 64, resize_w: int = 64
                ) -> np.ndarray:
    """``tflib/celebA.py:47-53`` — width-preserving resize then vertical crop."""
    from PIL import Image
    h, w = x.shape[:2]
    assert h >= w
    new_h = int(h * resize_w / w)
    img = Image.fromarray(x.astype(np.uint8)).resize((resize_w, new_h))
    x = np.asarray(img)
    margin = int(round((new_h - resize_h) / 2))
    return x[margin:margin + resize_h]


def convert_to_numpy(data_path: str, out_path: str = "celebA_64x64.npy",
                     size: int = 64, limit: int = 202599) -> str:
    """Offline jpg -> npy converter (``tflib/celebA.py:61-73``)."""
    from PIL import Image
    files = sorted(glob(os.path.join(data_path, "*.jpg")))[:limit]
    samples = []
    for f in files:
        img = np.asarray(Image.open(f).convert("RGB"), dtype=np.float64)
        samples.append(center_crop(img, size, size))
    arr = np.asarray(samples)
    arr = np.transpose(arr, (0, 3, 1, 2))  # NCHW like the reference
    np.save(out_path, arr)
    return out_path
