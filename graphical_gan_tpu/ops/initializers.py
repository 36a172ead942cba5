"""Weight initialization schemes.

Reproduces the scaled-uniform family of the reference op library
(``tflib/ops/linear.py:39-104``, ``tflib/ops/conv2d.py:55-83``,
``tflib/ops/deconv2d.py:43-57``, ``tflib/ops/conv3d.py:13-26``): samples are
uniform on ``[-stdev*sqrt(3), +stdev*sqrt(3)]`` (variance = stdev^2), with the
per-scheme stdev formulas below, plus the SVD orthogonal init.

The reference ran under Python 2 where ``int / int`` floor-divides; its fan
arithmetic therefore floors (e.g. ``output_dim * filter_size**2 / stride**2``).
``py2_div`` mirrors that exactly so init statistics match bit-for-bit in
expectation.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp


def py2_div(a, b):
    """Python-2 division semantics: floor for int/int, true otherwise."""
    if isinstance(a, int) and isinstance(b, int):
        return a // b
    return a / b


def scaled_uniform(stdev: float, shape: Sequence[int], gain: float = 1.0,
                   dtype=jnp.float32) -> Callable[[jax.Array], jax.Array]:
    bound = stdev * math.sqrt(3.0)

    def init(key: jax.Array) -> jax.Array:
        return gain * jax.random.uniform(
            key, tuple(shape), dtype=dtype, minval=-bound, maxval=bound)

    return init


def uniform_range(bound: float, shape: Sequence[int], gain: float = 1.0,
                  dtype=jnp.float32) -> Callable[[jax.Array], jax.Array]:
    """('uniform', range) scheme — plain U(-bound, bound)."""

    def init(key: jax.Array) -> jax.Array:
        return gain * jax.random.uniform(
            key, tuple(shape), dtype=dtype, minval=-bound, maxval=bound)

    return init


def orthogonal(shape: Sequence[int], gain: float = 1.0, dtype=jnp.float32
               ) -> Callable[[jax.Array], jax.Array]:
    """SVD orthogonal init (lasagne-style, ``tflib/ops/linear.py:79-92``)."""
    shape = tuple(shape)
    if len(shape) < 2:
        raise ValueError("orthogonal init needs >=2-D shapes")
    flat = (shape[0], math.prod(shape[1:]))

    def init(key: jax.Array) -> jax.Array:
        a = jax.random.normal(key, flat, dtype=jnp.float32)
        u, _, vt = jnp.linalg.svd(a, full_matrices=False)
        q = u if u.shape == flat else vt
        return (gain * q.reshape(shape)).astype(dtype)

    return init


def linear_stdev(initialization, input_dim: int, output_dim: int) -> float:
    """Per-scheme stdevs for dense layers (``tflib/ops/linear.py:48-75``)."""
    if initialization == "lecun":
        return math.sqrt(1.0 / input_dim)
    if initialization in ("glorot", None):
        return math.sqrt(2.0 / (input_dim + output_dim))
    if initialization == "he":
        return math.sqrt(2.0 / input_dim)
    if initialization == "glorot_he":
        return math.sqrt(4.0 / (input_dim + output_dim))
    raise ValueError(f"Invalid initialization {initialization!r}")


def conv_fans(input_dim: int, output_dim: int, filter_size: int, stride: int,
              masked: bool) -> Tuple[float, float]:
    """``tflib/ops/conv2d.py:62-67`` (with py2 int division)."""
    fan_in = input_dim * filter_size ** 2
    fan_out = py2_div(output_dim * filter_size ** 2, stride ** 2)
    if masked:  # "only approximately correct" in the reference
        fan_in /= 2.0
        fan_out /= 2.0
    return fan_in, fan_out


def deconv_fans(input_dim: int, output_dim: int, filter_size: int, stride: int
                ) -> Tuple[float, float]:
    """Transpose-conv fan swap (``tflib/ops/deconv2d.py:51-52``)."""
    fan_in = py2_div(input_dim * filter_size ** 2, stride ** 2)
    fan_out = output_dim * filter_size ** 2
    return fan_in, fan_out


def conv1d_fans(input_dim: int, output_dim: int, filter_size: int, stride: int,
                masked: bool) -> Tuple[float, float]:
    """``tflib/ops/conv1d.py:51-56``."""
    fan_in = input_dim * filter_size
    fan_out = py2_div(output_dim * filter_size, stride)
    if masked:
        fan_in /= 2.0
        fan_out /= 2.0
    return fan_in, fan_out


def conv3d_fans(input_dim: int, output_dim: int, filter_size: int,
                filter_len: int, stride: int, stride_len: int
                ) -> Tuple[float, float]:
    """``tflib/ops/conv3d.py:20-21`` — note the py2 left-to-right arithmetic."""
    fan_in = input_dim * filter_size ** 2 * filter_len
    fan_out = py2_div(
        py2_div(output_dim * filter_size ** 2, stride ** 2) * filter_len,
        stride_len)
    return fan_in, fan_out


def he_or_glorot_stdev(fan_in: float, fan_out: float, he_init: bool) -> float:
    """``tflib/ops/conv2d.py:69-72`` — 'he' here is sqrt(4/(fi+fo))."""
    if he_init:
        return math.sqrt(4.0 / (fan_in + fan_out))
    return math.sqrt(2.0 / (fan_in + fan_out))


def zeros(shape: Sequence[int], dtype=jnp.float32):
    def init(key: jax.Array) -> jax.Array:
        return jnp.zeros(tuple(shape), dtype=dtype)
    return init


def ones(shape: Sequence[int], dtype=jnp.float32):
    def init(key: jax.Array) -> jax.Array:
        return jnp.ones(tuple(shape), dtype=dtype)
    return init


def normal(shape: Sequence[int], stddev: float = 1.0, dtype=jnp.float32):
    def init(key: jax.Array) -> jax.Array:
        return stddev * jax.random.normal(key, tuple(shape), dtype=dtype)
    return init
