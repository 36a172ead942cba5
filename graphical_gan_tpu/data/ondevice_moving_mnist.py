"""On-device moving-MNIST synthesis — the TPU-native data path for SSGAN.

The reference synthesized bouncing-digit videos on the HOST, per epoch, in
Python loops (``tflib/simple_moving_mnist.py:54-96``); our host rebuild
(``data/moving_mnist.py``) vectorizes that per batch, and ``native/`` adds a
threaded C++ fast path.  But on a machine where host->device transfers are
slow (the relay used here moves ~40 MB/s, and one ssgan iteration consumes
26 MB of video), ANY host synthesis leaves the chip idle.

This module moves the synthesizer itself onto the TPU: the 28x28 digit pool
lives in HBM (the full MNIST pool is 157 MB), and each training iteration
draws digit indices, rolls the trajectory law and pastes the frames as part
of the same compiled program as the training step — fresh videos every
iteration (no frozen-epoch compromise like resident mode), zero host bytes
in the hot loop.  The trajectory law is the reference's exactly
(``simple_moving_mnist.py:9-48``): uniform start in [0,1]^2, uniform angle,
constant speed 0.1 per step, clamp-and-reflect at the walls, positions
recorded AFTER the first step; pasting is single-digit max-overlap
(``:50-52``), which on an empty canvas is plain placement.

Plugs into the trainer through the ``batch_sampler`` hook
(``train/trainer.py``): see ``make_video_sampler``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

IMAGE_SIZE = 64
DIGIT_SIZE = 28
STEP_LENGTH = 0.1


def random_trajectory(key: jax.Array, n: int, seq_length: int,
                      image_size: int = IMAGE_SIZE,
                      digit_size: int = DIGIT_SIZE
                      ) -> Tuple[jax.Array, jax.Array]:
    """jax port of ``data/moving_mnist.py: random_trajectory`` (itself the
    vectorized reference law): returns int32 (top, left), each [L, n]."""
    canvas = image_size - digit_size
    ky, kx, kt = jax.random.split(key, 3)
    y = jax.random.uniform(ky, (n,))
    x = jax.random.uniform(kx, (n,))
    theta = jax.random.uniform(kt, (n,)) * (2 * jnp.pi)
    v_y = jnp.sin(theta)
    v_x = jnp.cos(theta)

    def step(carry, _):
        y, x, v_y, v_x = carry
        y = y + v_y * STEP_LENGTH
        x = x + v_x * STEP_LENGTH
        over, under = x >= 1.0, x <= 0.0
        x = jnp.where(under, 0.0, jnp.where(over, 1.0, x))
        v_x = jnp.where(under | over, -v_x, v_x)
        over, under = y >= 1.0, y <= 0.0
        y = jnp.where(under, 0.0, jnp.where(over, 1.0, y))
        v_y = jnp.where(under | over, -v_y, v_y)
        return (y, x, v_y, v_x), (y, x)

    _, (ys, xs) = jax.lax.scan(step, (y, x, v_y, v_x), None,
                               length=seq_length)
    return ((canvas * ys).astype(jnp.int32),
            (canvas * xs).astype(jnp.int32))


def paste_digits(digits: jax.Array, top: jax.Array, left: jax.Array
                 ) -> jax.Array:
    """Place each digit on an empty canvas along its trajectory.

    digits: [B, 28, 28]; top/left: int32 [L, B].  Returns [B, L, 64*64].
    Implemented as a dense shifted-gather (rows/cols indexed relative to the
    offset, out-of-range masked) — no scatter, so XLA lowers it to plain
    vectorized selects/gathers that fuse with downstream normalization.
    """
    r = jnp.arange(IMAGE_SIZE)

    def one(digit, t, l):          # digit [28,28]; t/l scalars
        idx_r = r - t              # [64]
        idx_c = r - l
        ok_r = (idx_r >= 0) & (idx_r < DIGIT_SIZE)
        ok_c = (idx_c >= 0) & (idx_c < DIGIT_SIZE)
        g = digit[jnp.clip(idx_r, 0, DIGIT_SIZE - 1), :][
            :, jnp.clip(idx_c, 0, DIGIT_SIZE - 1)]
        return g * (ok_r[:, None] & ok_c[None, :])

    # vmap over time (trajectory varies), then over batch (digit varies too)
    per_example = jax.vmap(
        lambda digit, ts, ls: jax.vmap(lambda t, l: one(digit, t, l))(ts, ls))
    frames = per_example(digits, top.T, left.T)        # [B, L, 64, 64]
    b, l = frames.shape[:2]
    return frames.reshape(b, l, IMAGE_SIZE * IMAGE_SIZE)


def synthesize_videos(digits: jax.Array, key: jax.Array, seq_length: int
                      ) -> jax.Array:
    """digits [B, 28, 28] float in [0,1] -> videos [B, L, 64*64] float32."""
    top, left = random_trajectory(key, digits.shape[0], seq_length)
    return paste_digits(digits, top, left)


def make_video_sampler(seq_length: int):
    """A ``Trainer(batch_sampler=...)`` hook: samples (1+k) fresh video
    batches per iteration from an HBM-resident digit pool.

    The resident data must be ``{'digits': [N, 28, 28] float,
    'labels': [N, C] one-hot float}``; returns ``{'x': [n, B, L, 4096],
    'y': [n, B, C]}`` matching the host loader's batch pytree
    (``runs/ssgan.py: _loaders``).
    """
    def sampler(data, key, n, batch_size):
        pool = data["digits"]
        k_idx, k_traj = jax.random.split(key)
        idx = jax.random.randint(k_idx, (n, batch_size), 0, pool.shape[0])
        digits = pool[idx.reshape(-1)]                  # [n*B, 28, 28]
        videos = synthesize_videos(
            digits, k_traj, seq_length
        ).reshape(n, batch_size, seq_length, IMAGE_SIZE * IMAGE_SIZE)
        return {"x": videos,
                "y": data["labels"][idx.reshape(-1)].reshape(
                    n, batch_size, -1)}

    return sampler
