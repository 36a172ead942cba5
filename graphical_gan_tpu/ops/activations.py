"""Elementwise activations and stochastic layers.

These all fuse into adjacent matmuls/convs under XLA; they exist as named
functions for parity with the reference's in-script helpers
(``gan_inference_mnist.py:95-120``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from graphical_gan_tpu.core import registry


LEAKY_ALPHA = 0.2  # the reference's LeakyReLU slope (single source of truth)


def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


def leaky_relu(x: jax.Array, alpha: float = LEAKY_ALPHA) -> jax.Array:
    """``max(alpha*x, x)`` — the reference's LeakyReLU."""
    return jnp.maximum(alpha * x, x)


def activation(name):
    """None | 'relu' | 'leaky_relu' -> callable (shared by the fused BN
    paths so the unfused/pallas variants can't drift)."""
    if name is None:
        return lambda v: v
    if name == "relu":
        return relu
    if name == "leaky_relu":
        return leaky_relu
    raise ValueError(name)


def dropout(x: jax.Array, rate: float, training: bool = False,
            key: Optional[jax.Array] = None) -> jax.Array:
    """Inverted dropout.

    IMPORTANT parity note: the reference calls ``tf.layers.dropout`` without a
    ``training`` argument, whose TF1 default is ``training=False`` — i.e. every
    dropout layer in the reference is the identity at all times
    (``gan_inference_cifar10.py:232-251``).  We replicate that default and keep
    the knob functional for when someone actually wants dropout.
    """
    if not training or rate <= 0.0:
        return x
    if key is None:
        key = registry.next_rng_key()
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def gaussian_noise(x: jax.Array, std: float,
                   key: Optional[jax.Array] = None) -> jax.Array:
    """Additive Gaussian noise layer (``gan_inference_mnist.py:118-120``)."""
    if key is None:
        key = registry.next_rng_key()
    return x + std * jax.random.normal(key, x.shape, dtype=x.dtype)


def sample_gumbel(key: jax.Array, shape, eps: float = 1e-20) -> jax.Array:
    """Gumbel(0,1) sampler (``gmgan_inference_mnist.py:109-112``)."""
    u = jax.random.uniform(key, shape, minval=0.0, maxval=1.0)
    return -jnp.log(-jnp.log(u + eps) + eps)
