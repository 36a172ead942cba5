"""Minibatch discrimination and ladder combinator.

Rebuilds of ``tflib/ops/minibatch.py:16-44`` (Salimans et al. minibatch
features) and ``tflib/ops/combination.py:6-30`` (ladder-network gated
combination).  Dormant in the reference entry scripts but part of the library
surface.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from graphical_gan_tpu.core.registry import param
from graphical_gan_tpu.ops import initializers as inits


def minibatch_layer(name: str, num_inputs: int, num_kernels: int,
                    dim_per_kernel: int, x: jax.Array) -> jax.Array:
    """Minibatch discrimination: pairwise-L1 kernel features appended to x."""
    w = param(name + ".W", inits.scaled_uniform(
        math.sqrt(2.0 / num_inputs),
        (num_inputs, num_kernels, dim_per_kernel)))
    b = param(name + ".b", inits.zeros((num_kernels,)))

    # [B, K, D]
    act = jnp.tensordot(x, w, axes=[[1], [0]])
    # pairwise |a_i - a_j| summed over D, with +1e6 on the diagonal
    # (reference minibatch.py:40: the eye-mask removes self-similarity)
    diff = act[:, :, :, None] - jnp.transpose(act, (1, 2, 0))[None, :, :, :]
    abs_dif = jnp.sum(jnp.abs(diff), axis=2)  # [B, K, B]
    n = x.shape[0]
    eye = jnp.eye(n, dtype=x.dtype)
    abs_dif = abs_dif + 1e6 * eye[:, None, :]
    f = jnp.sum(jnp.exp(-abs_dif), axis=2)  # [B, K]
    f = f + b[None, :]
    return jnp.concatenate([x, f], axis=1)


def ladder(inputs: Tuple[jax.Array, jax.Array], input_dim: int,
           name: str) -> jax.Array:
    """Ladder combinator: sigmoid-gated blend of lateral z and top-down u."""
    zs = inits.zeros((input_dim,))
    os_ = inits.ones((input_dim,))

    a1 = param(name + ".a1", zs)
    a2 = param(name + ".a2", os_)
    a3 = param(name + ".a3", zs)
    a4 = param(name + ".a4", zs)
    c1 = param(name + ".c1", zs)
    c2 = param(name + ".c2", os_)
    c3 = param(name + ".c3", zs)
    c4 = param(name + ".c4", zs)
    b1 = param(name + ".b1", zs)

    z_lat, u = inputs
    sigval = jax.nn.sigmoid(c1 + c2 * z_lat + c3 * u + c4 * z_lat * u)
    z_est = a1 + a2 * z_lat + b1 * sigval + a3 * u + a4 * z_lat * u
    return z_est
