"""Moving-MNIST synthesizer — rebuild of ``tflib/simple_moving_mnist.py``.

The reference synthesized the ENTIRE epoch of bouncing-digit videos with
per-example Python loops before yielding anything
(``simple_moving_mnist.py:59-91``): O(N*L) interpreted work and ~16 GB of
float32 for the default config.  This rebuild keeps the identical trajectory
law (uniform start, uniform angle, constant speed 0.1, edge reflection —
``:9-48``) and max-overlap digit pasting (``:50-52``), but:

- fully vectorized over (batch, time) in numpy,
- synthesized lazily PER BATCH inside the epoch iterator, so host memory
  stays O(batch) and synthesis overlaps device compute.

``load_video(seq_len, batch_size, cla=None)`` mirrors the reference API:
returns (train, test) epoch-generator factories yielding
``(videos[B, L, 4096] float32 in [0,1], labels[B])``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from graphical_gan_tpu.data import mnist as mnist_data

IMAGE_SIZE = 64
DIGIT_SIZE = 28
STEP_LENGTH = 0.1


def random_trajectory(rng: np.random.RandomState, n: int, seq_length: int,
                      image_size: int = IMAGE_SIZE,
                      digit_size: int = DIGIT_SIZE
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized port of ``GetRandomTrajectory`` (``:9-48``): positions in
    [0,1] stepped then reflected at the walls; note the reference records the
    position AFTER the first step."""
    canvas = image_size - digit_size
    y = rng.rand(n)
    x = rng.rand(n)
    theta = rng.rand(n) * 2 * np.pi
    v_y = np.sin(theta)
    v_x = np.cos(theta)

    start_y = np.zeros((seq_length, n))
    start_x = np.zeros((seq_length, n))
    for i in range(seq_length):
        y = y + v_y * STEP_LENGTH
        x = x + v_x * STEP_LENGTH
        # reflect at both walls (vectorized version of :27-38)
        over = x >= 1.0
        under = x <= 0.0
        x = np.where(under, 0.0, np.where(over, 1.0, x))
        v_x = np.where(under | over, -v_x, v_x)
        over = y >= 1.0
        under = y <= 0.0
        y = np.where(under, 0.0, np.where(over, 1.0, y))
        v_y = np.where(under | over, -v_y, v_y)
        start_y[i] = y
        start_x[i] = x

    return ((canvas * start_y).astype(np.int32),
            (canvas * start_x).astype(np.int32))


def synthesize_batch(rng: np.random.RandomState, digits: np.ndarray,
                     seq_length: int) -> np.ndarray:
    """Paste each 28x28 digit along its trajectory; vectorized over (B, L).

    digits: [B, 28, 28] float in [0,1].  Returns [B, L, 64*64] float32.
    """
    b = digits.shape[0]
    top, left = random_trajectory(rng, b, seq_length)     # [L, B]
    data = np.zeros((b, seq_length, IMAGE_SIZE, IMAGE_SIZE), dtype=np.float32)

    rr = np.arange(DIGIT_SIZE)
    # index grids: rows[l,b,i] = top[l,b]+i ; cols[l,b,j] = left[l,b]+j
    rows = top[:, :, None] + rr[None, None, :]            # [L, B, 28]
    cols = left[:, :, None] + rr[None, None, :]           # [L, B, 28]
    b_idx = np.broadcast_to(
        np.arange(b)[None, :, None, None],
        (seq_length, b, DIGIT_SIZE, DIGIT_SIZE))
    l_idx = np.broadcast_to(
        np.arange(seq_length)[:, None, None, None],
        (seq_length, b, DIGIT_SIZE, DIGIT_SIZE))
    r_idx = np.broadcast_to(rows[:, :, :, None],
                            (seq_length, b, DIGIT_SIZE, DIGIT_SIZE))
    c_idx = np.broadcast_to(cols[:, :, None, :],
                            (seq_length, b, DIGIT_SIZE, DIGIT_SIZE))
    # single digit per canvas => plain assignment == max-overlap (:50-52)
    data[b_idx, l_idx, r_idx, c_idx] = digits[None, :, :, :]
    return data.reshape(b, seq_length, IMAGE_SIZE * IMAGE_SIZE)


def _video_generator(images: np.ndarray, labels: np.ndarray, seq_length: int,
                     batch_size: int, seed: Optional[int] = None,
                     use_native: bool = True):
    images = images.reshape(-1, DIGIT_SIZE, DIGIT_SIZE).astype(np.float32)
    rng = np.random.RandomState(seed)

    def get_epoch():
        perm = rng.permutation(len(images))
        for i in range(len(images) // batch_size):
            idx = perm[i * batch_size:(i + 1) * batch_size]
            batch = None
            if use_native:
                # threaded C++ fast path (graphical_gan_tpu/native); same
                # trajectory law, independent RNG stream
                from graphical_gan_tpu.native import synthesize_batch_native
                batch = synthesize_batch_native(
                    images[idx], seq_length,
                    seed=int(rng.randint(0, 2 ** 31)))
            if batch is None:
                batch = synthesize_batch(rng, images[idx], seq_length)
            yield batch, labels[idx]

    return get_epoch


def _mnist_pool(cla: Optional[int]):
    train_f, dev_f, test_f = mnist_data.load(50, 50)
    # rebuild full arrays from the loader's backing data: simplest is to load
    # raw again; reuse mnist.load's internals via one epoch sweep
    tr = _collect(train_f)
    dv = _collect(dev_f)
    te = _collect(test_f)
    train_all_x = np.concatenate([tr[0], dv[0]], axis=0)
    train_all_y = np.concatenate([tr[1], dv[1]], axis=0)
    test_x, test_y = te
    if cla is not None:
        keep = train_all_y == cla
        train_all_x, train_all_y = train_all_x[keep], train_all_y[keep]
        keep = test_y == cla
        test_x, test_y = test_x[keep], test_y[keep]
    return (train_all_x, train_all_y), (test_x, test_y)


def _collect(factory):
    xs, ys = [], []
    for x, y in factory():
        xs.append(x)
        ys.append(y)
    return np.concatenate(xs, 0), np.concatenate(ys, 0)


def load_video(seq_length: int, batch_size: int, cla: Optional[int] = None):
    """``simple_moving_mnist.py:93-113`` — (train, test) video generators."""
    (train_x, train_y), (test_x, test_y) = _mnist_pool(cla)
    return (_video_generator(train_x, train_y, seq_length, batch_size, 0),
            _video_generator(test_x, test_y, seq_length, batch_size, 1))


def load_image(seq_length: int, batch_size: int, cla: Optional[int] = None):
    """``simple_moving_mnist.py:115-153`` — flattened per-frame variant."""
    assert batch_size % seq_length == 0
    (train_x, train_y), (test_x, test_y) = _mnist_pool(cla)

    def make(images, labels, seed):
        vid = _video_generator(images, labels, seq_length,
                               batch_size // seq_length, seed)

        def get_epoch():
            for v, y in vid():
                frames = v.reshape(batch_size, IMAGE_SIZE * IMAGE_SIZE)
                lab = np.tile(y.reshape(-1, 1), (1, seq_length)).reshape(-1)
                yield frames, lab

        return get_epoch

    return make(train_x, train_y, 0), make(test_x, test_y, 1)
