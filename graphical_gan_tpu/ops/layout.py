"""Image layout utilities.

TPU-first layout decision: all conv ops and model internals use **NHWC**
(channels on the 128-wide lane dimension — what XLA:TPU tiles best), whereas
the reference used NCHW with per-layer NHWC<->NCHW transposes inside every
deconv (``tflib/ops/deconv2d.py:91,116``).

The reference's *flat* tensors ([B, C*H*W]) are NCHW-ordered (CIFAR-10's raw
rows are RGB planes; the scripts reshape them as [-1, C, H, W]).  To keep the
user-visible flat layout identical, these helpers convert between flat
NCHW-ordered vectors and internal NHWC images at network boundaries only —
two transposes per network instead of two per layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unflatten_image(x_flat: jax.Array, channels: int, height: int,
                    width: int) -> jax.Array:
    """[B, C*H*W] (NCHW order) -> [B, H, W, C]."""
    b = x_flat.shape[0]
    x = x_flat.reshape(b, channels, height, width)
    return jnp.transpose(x, (0, 2, 3, 1))


def flatten_image(x_nhwc: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, C*H*W] flat in NCHW order (reference convention)."""
    b, h, w, c = x_nhwc.shape
    return jnp.transpose(x_nhwc, (0, 3, 1, 2)).reshape(b, c * h * w)


def nchw_to_nhwc(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 3, 1, 2))
