"""Maximum mean discrepancy — rebuild of ``tflib/objs/mmd.py``.

All kernel matrices are single MXU matmuls; the sigma loop unrolls into fused
VPU elementwise work.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

_DEFAULT_SIGMAS = (2.0, 5.0, 10.0, 20.0, 40.0, 80.0)


def maximum_mean_discrepancy(sample: jax.Array, data: jax.Array,
                             batch_size: int,
                             sigma: Sequence[float] = _DEFAULT_SIGMAS
                             ) -> jax.Array:
    """``mmd.py:4-18`` (reference spelling 'discripancy'). Note the reference
    kernel here uses ``exp((xx - .5 x2 - .5 x2^T)/s)`` — i.e. exp(-||a-b||^2/(2s)).
    """
    x = jnp.concatenate([sample, data], axis=0)
    xx = jnp.dot(x, x.T, preferred_element_type=jnp.float32)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    exponent = xx - 0.5 * x2 - 0.5 * x2.T

    s_samples = jnp.ones((sample.shape[0], 1), jnp.float32) / batch_size
    s_data = -jnp.ones((data.shape[0], 1), jnp.float32) / batch_size
    s_all = jnp.concatenate([s_samples, s_data], axis=0)
    s_mat = jnp.dot(s_all, s_all.T)
    loss = jnp.float32(0.0)
    for s in sigma:
        loss = loss + jnp.sum(s_mat * jnp.exp(exponent / s))
    return jnp.sqrt(loss)


def _mix_rbf_kernel(x: jax.Array, y: jax.Array, sigmas: Sequence[float],
                    wts: Optional[Sequence[float]] = None):
    """``mmd.py:20-41`` — gamma = 1/(2 sigma^2) mixture-RBF kernels."""
    if wts is None:
        wts = [1.0] * len(sigmas)
    xx = jnp.dot(x, x.T, preferred_element_type=jnp.float32)
    xy = jnp.dot(x, y.T, preferred_element_type=jnp.float32)
    yy = jnp.dot(y, y.T, preferred_element_type=jnp.float32)
    x_sq = jnp.diagonal(xx)
    y_sq = jnp.diagonal(yy)
    r = lambda v: v[None, :]
    c = lambda v: v[:, None]
    k_xx = k_xy = k_yy = 0.0
    for sigma, wt in zip(sigmas, wts):
        gamma = 1.0 / (2.0 * sigma ** 2)
        k_xx = k_xx + wt * jnp.exp(-gamma * (-2 * xx + c(x_sq) + r(x_sq)))
        k_xy = k_xy + wt * jnp.exp(-gamma * (-2 * xy + c(x_sq) + r(y_sq)))
        k_yy = k_yy + wt * jnp.exp(-gamma * (-2 * yy + c(y_sq) + r(y_sq)))
    return k_xx, k_xy, k_yy, float(sum(wts))


def _mmd2(k_xx, k_xy, k_yy, const_diagonal=False, biased=False) -> jax.Array:
    """``mmd.py:43-63``."""
    m = jnp.float32(k_xx.shape[0])
    n = jnp.float32(k_yy.shape[0])
    if biased:
        return (jnp.sum(k_xx) / (m * m) + jnp.sum(k_yy) / (n * n)
                - 2 * jnp.sum(k_xy) / (m * n))
    if const_diagonal is not False:
        trace_x = m * const_diagonal
        trace_y = n * const_diagonal
    else:
        trace_x = jnp.trace(k_xx)
        trace_y = jnp.trace(k_yy)
    return ((jnp.sum(k_xx) - trace_x) / (m * (m - 1))
            + (jnp.sum(k_yy) - trace_y) / (n * (n - 1))
            - 2 * jnp.sum(k_xy) / (m * n))


def mix_rbf_mmd2(x: jax.Array, y: jax.Array,
                 sigmas: Sequence[float] = _DEFAULT_SIGMAS,
                 wts: Optional[Sequence[float]] = None,
                 biased: bool = True) -> jax.Array:
    """``mmd.py:65-67``."""
    k_xx, k_xy, k_yy, d = _mix_rbf_kernel(x, y, sigmas, wts)
    return _mmd2(k_xx, k_xy, k_yy, const_diagonal=d, biased=biased)


def vegan_mmd(q_z: jax.Array, p_z: jax.Array, rec_penalty: jax.Array,
              lamb: float) -> jax.Array:
    """Generator-only objective (``mmd.py:69-78``); pair with Adam (0.5)."""
    return lamb * mix_rbf_mmd2(q_z, p_z) + rec_penalty
