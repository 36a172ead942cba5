"""MC divergence estimators between the *aggregated* posterior and the prior.

Rebuild of ``tflib/objs/kl_aggregated.py``: the batch of per-example posterior
(mean, std) pairs is treated as an equal-weight Gaussian mixture, and
KL / inverse-KL / JSD against the N(0,I) prior are estimated by sampling, with
the log-sum-exp trick for the mixture log-likelihood.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def mixture_gaussian(key: jax.Array, n_samples: int, n_coms: int, dim_z: int,
                     mu: jax.Array, std: jax.Array) -> jax.Array:
    """Sample from a uniform-weight Gaussian mixture (``kl_aggregated.py:6-16``)."""
    k_key, eps_key = jax.random.split(key)
    idx = jax.random.randint(k_key, (n_samples,), 0, n_coms)
    k = jax.nn.one_hot(idx, n_coms, dtype=jnp.float32)
    mu_k = jnp.dot(k, mu, preferred_element_type=jnp.float32)
    std_k = jnp.dot(k, std, preferred_element_type=jnp.float32)
    eps = jax.random.normal(eps_key, (n_samples, dim_z))
    return mu_k + std_k * eps


def log_likelihood_diagonal_gaussian(x, mu, std) -> jax.Array:
    """``kl_aggregated.py:18-20`` — sum over the last axis."""
    res = -0.5 * (jnp.square((x - mu) / std) + math.log(2 * math.pi)
                  + 2.0 * jnp.log(std))
    return jnp.sum(res, axis=-1)


def log_likelihood_mixture_gaussian(x, mu, std) -> jax.Array:
    """log of the mixture density via log-sum-exp (``kl_aggregated.py:22-30``)."""
    res_mat = log_likelihood_diagonal_gaussian(
        x[:, None, :], mu[None, :, :], std[None, :, :])  # [nz, nx]
    res_max = jnp.max(res_mat, axis=1)
    return jnp.log(jnp.mean(jnp.exp(res_mat - res_max[:, None]), axis=1)) \
        + res_max


def log_likelihood_mixture_mixture_gaussian(x, mu_q, std_q, mu_p, std_p,
                                            n_coms: int) -> jax.Array:
    """log density of the even mixture M = (q_agg + p)/2 … as the reference
    computes it (``kl_aggregated.py:32-44``): concat the q-component
    log-likes with n_coms copies of the p log-like, then log-mean-exp.
    """
    res_mat_1 = log_likelihood_diagonal_gaussian(
        x[:, None, :], mu_q[None, :, :], std_q[None, :, :])  # [nz, nx]
    res_mat_2 = log_likelihood_diagonal_gaussian(x, mu_p, std_p)  # [nz]
    res_mat_2 = jnp.tile(res_mat_2[:, None], (1, n_coms))
    res_mat = jnp.concatenate([res_mat_1, res_mat_2], axis=1)
    res_max = jnp.max(res_mat, axis=1)
    return jnp.log(jnp.mean(jnp.exp(res_mat - res_max[:, None]), axis=1)) \
        + res_max


def kl_q_aggregated_p_diagonal_gaussian(key, q_mean, q_std, p_mean, p_std,
                                        n_samples, n_coms, dim_z) -> jax.Array:
    """``kl_aggregated.py:46-51`` — sample z from q_agg."""
    z = mixture_gaussian(key, n_samples, n_coms, dim_z, q_mean, q_std)
    log_q = log_likelihood_mixture_gaussian(z, q_mean, q_std)
    log_p = log_likelihood_diagonal_gaussian(z, p_mean, p_std)
    return jnp.mean(log_q - log_p, axis=0)


def ikl_q_aggregated_p_diagonal_gaussian(key, q_mean, q_std, p_mean, p_std,
                                         n_samples, dim_z) -> jax.Array:
    """``kl_aggregated.py:53-58`` — sample z from the prior."""
    z = jax.random.normal(key, (n_samples, dim_z))
    log_q = log_likelihood_mixture_gaussian(z, q_mean, q_std)
    log_p = log_likelihood_diagonal_gaussian(z, p_mean, p_std)
    return jnp.mean(log_p - log_q, axis=0)


def jsd_q_aggregated_p_diagonal_gaussian(key, q_mean, q_std, p_mean, p_std,
                                         n_samples, n_coms, dim_z) -> jax.Array:
    """``kl_aggregated.py:60-70``."""
    k1, k2 = jax.random.split(key)
    z1 = mixture_gaussian(k1, n_samples, n_coms, dim_z, q_mean, q_std)
    log_q = log_likelihood_mixture_gaussian(z1, q_mean, q_std)
    log_m1 = log_likelihood_mixture_mixture_gaussian(
        z1, q_mean, q_std, p_mean, p_std, n_coms)
    z2 = jax.random.normal(k2, (n_samples, dim_z))
    log_p = log_likelihood_diagonal_gaussian(z2, p_mean, p_std)
    log_m2 = log_likelihood_mixture_mixture_gaussian(
        z2, q_mean, q_std, p_mean, p_std, n_coms)
    return jnp.mean(0.5 * (log_q - log_m1 + log_p - log_m2), axis=0)


def vegan_kl(key, q_mean, q_std, p_mean, p_std, rec_penalty, z_samples,
             batch_size, dim_z, lamb) -> jax.Array:
    """``kl_aggregated.py:83-92`` (n_coms = batch_size)."""
    return lamb * kl_q_aggregated_p_diagonal_gaussian(
        key, q_mean, q_std, p_mean, p_std, z_samples, batch_size, dim_z
    ) + rec_penalty


def vegan_ikl(key, q_mean, q_std, p_mean, p_std, rec_penalty, z_samples,
              dim_z, lamb) -> jax.Array:
    """``kl_aggregated.py:94-103``."""
    return lamb * ikl_q_aggregated_p_diagonal_gaussian(
        key, q_mean, q_std, p_mean, p_std, z_samples, dim_z) + rec_penalty


def vegan_jsd(key, q_mean, q_std, p_mean, p_std, rec_penalty, z_samples,
              batch_size, dim_z, lamb) -> jax.Array:
    """``kl_aggregated.py:72-81``."""
    return lamb * jsd_q_aggregated_p_diagonal_gaussian(
        key, q_mean, q_std, p_mean, p_std, z_samples, batch_size, dim_z
    ) + rec_penalty
