"""Closed-form diagonal-Gaussian divergences — rebuild of ``tflib/objs/kl.py``."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kl_q_p_diagonal_gaussian(q_mean, q_std, p_mean, p_std) -> jax.Array:
    """KL(q||p) for diagonal Gaussians, summed over dims, batch-averaged
    (``kl.py:5-10``).
    """
    q_var = jnp.square(q_std)
    p_var = jnp.square(p_std)
    mean_diff = jnp.square(p_mean - q_mean)
    res = 0.5 * (jnp.log(p_var / q_var) + (mean_diff + q_var) / p_var - 1.0)
    return jnp.mean(jnp.sum(res, axis=1), axis=0)


def neg_log_likelihood_diagonal_gaussian(x, mu, std) -> jax.Array:
    """``kl.py:12-14``."""
    res = 0.5 * (jnp.square((x - mu) / std) + math.log(2 * math.pi)
                 + 2.0 * jnp.log(std))
    return jnp.mean(jnp.sum(res, axis=1), axis=0)


def vae(real_x, p_x_mean, p_x_std, q_z_mean, q_z_std, p_z_mean, p_z_std
        ) -> jax.Array:
    """VAE ELBO (negative), generator-only objective (``kl.py:16-24``)."""
    cost = kl_q_p_diagonal_gaussian(q_z_mean, q_z_std, p_z_mean, p_z_std)
    cost = cost + neg_log_likelihood_diagonal_gaussian(real_x, p_x_mean, p_x_std)
    return cost
