"""Image-grid and GIF writers — rebuild of ``tflib/save_images.py``.

Same montage math: square-ish grid (largest divisor of N <= sqrt(N) rows) or
an explicit ``size=(rows, cols)``; floats in [0,1] scale by 255.99; BCHW
input transposes to BHWC; 2-D inputs reshape to square images.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _grid_shape(n_samples: int, size) -> Tuple[int, int]:
    if size is None:
        rows = int(np.sqrt(n_samples))
        while n_samples % rows != 0:
            rows -= 1
        return rows, n_samples // rows
    nh, nw = int(size[0]), int(size[1])
    assert nh * nw == n_samples
    return nh, nw


def large_image(x: np.ndarray, size=None) -> np.ndarray:
    """Montage of N images into one (H*nh, W*nw[, 3]) uint8 array."""
    x = np.asarray(x)
    if np.issubdtype(x.dtype, np.floating):
        x = (255.99 * x).astype("uint8")
    n = x.shape[0]
    nh, nw = _grid_shape(n, size)

    if x.ndim == 2:
        side = int(np.sqrt(x.shape[1]))
        x = x.reshape(n, side, side)
    if x.ndim == 4:
        if x.shape[1] in (1, 3) and x.shape[1] < x.shape[-1]:
            x = x.transpose(0, 2, 3, 1)  # BCHW -> BHWC
        if x.shape[-1] == 1:
            x = x[..., 0]

    h, w = x.shape[1:3]
    if x.ndim == 4:
        img = np.zeros((h * nh, w * nw, 3), dtype=np.uint8)
    else:
        img = np.zeros((h * nh, w * nw), dtype=np.uint8)
    for k in range(n):
        j, i = divmod(k, nw)
        img[j * h:(j + 1) * h, i * w:(i + 1) * w] = x[k]
    return img


def save_images(x: np.ndarray, save_path: str, size=None) -> str:
    from PIL import Image
    img = large_image(np.asarray(x), size=size)
    Image.fromarray(img).save(save_path)
    return save_path


def save_gifs(x: np.ndarray, save_path: str, size=None, fps: int = 5) -> str:
    """x: [N, T, C, H, W] — one montage frame per timestep
    (``tflib/save_images.py:47-51``)."""
    import imageio
    frames = [large_image(x[:, t], size=size) for t in range(x.shape[1])]
    imageio.mimsave(save_path, frames, duration=1.0 / fps)
    return save_path
