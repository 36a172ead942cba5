"""Gradient penalties and reconstruction distances.

The reference built gradient penalties in-script with ``tf.gradients``
(``gan_inference_mnist.py:346-361``, ``gan_inference_cifar10.py:311-325``);
here they are library functions over a discriminator callable.  The
double-backward (grad of a loss containing grad) is native ``jax.grad``.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def l2(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(x - y))


def l1(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(x - y))


def distance(x: jax.Array, y: jax.Array, d_type: str) -> jax.Array:
    """``tflib/utils/distance.py:3-17`` (the 2-D reshape is a no-op for means)."""
    if d_type == "l1":
        return l1(x, y)
    if d_type == "l2":
        return l2(x, y)
    raise ValueError(f"unknown distance {d_type!r}")


def wali_gp_fused(d_fn: Callable[[jax.Array, jax.Array], jax.Array],
                  real_x: jax.Array, fake_x: jax.Array,
                  q_z: jax.Array, p_z: jax.Array,
                  key: jax.Array, lamb: float = 10.0):
    """``gradient_penalty_xz`` restructured for a ROW-WISE discriminator:
    one batched D application over [real; fake; interpolates] (3B rows)
    with a shared VJP, instead of three separate D forwards plus a separate
    inner-gradient pass.

    Row-wise (no batch-coupled ops like batch-stat BN — true for the
    cifar10/svhn D, which uses dropout-as-identity only,
    ``gan_inference_cifar10.py:232-259``) makes this EXACT: row i of the
    batched output/gradient equals the unbatched value.  The win is op
    count and weight-read amortization in the hottest (k x replicated)
    subgraph: 1 fwd + 1 bwd at 3B replaces ~4 chains at B, and the outer
    (parameter) differentiation then flows through one chain too.

    Returns ``(disc_real, disc_fake, gp)``.
    """
    b = real_x.shape[0]
    alpha = jax.random.uniform(key, (b, 1))
    x_hat = real_x + alpha * (fake_x - real_x)
    z_hat = q_z + alpha * (p_z - q_z)

    xs = jnp.concatenate([real_x, fake_x, x_hat.astype(real_x.dtype)], axis=0)
    zs = jnp.concatenate([q_z, p_z, z_hat.astype(q_z.dtype)], axis=0)

    out, vjp = jax.vjp(lambda xv: d_fn(xv, zs), xs)
    # cotangent selecting the x_hat block: d(sum of those outputs)/d xs —
    # row-independence makes rows 2b.. exactly d D_i / d x_hat_i
    cot = jnp.zeros_like(out).at[2 * b:].set(1.0)
    (grads_xs,) = vjp(cot)
    grads_x = grads_xs[2 * b:]

    slopes = jnp.sqrt(jnp.sum(jnp.square(
        grads_x.astype(jnp.float32)), axis=1))
    gp = lamb * jnp.mean(jnp.square(slopes - 1.0))
    return out[:b], out[b:2 * b], gp


def gradient_penalty_xz(d_fn: Callable[[jax.Array, jax.Array], jax.Array],
                        real_x: jax.Array, fake_x: jax.Array,
                        q_z: jax.Array, p_z: jax.Array,
                        key: jax.Array, lamb: float = 10.0) -> jax.Array:
    """wali-gp penalty (``gan_inference_mnist.py:346-361``): one shared
    per-example alpha interpolates BOTH x and z; the slope is computed from
    the x-gradient only (the reference takes ``tf.gradients(...)[0]``, i.e.
    d/d x_tilde — reproduced exactly).
    """
    b = real_x.shape[0]
    alpha = jax.random.uniform(key, (b, 1))
    x_hat = real_x + alpha * (fake_x - real_x)
    z_hat = q_z + alpha * (p_z - q_z)

    def d_sum(xh, zh):
        return jnp.sum(d_fn(xh, zh))

    grads_x = jax.grad(d_sum, argnums=0)(x_hat, z_hat)
    slopes = jnp.sqrt(jnp.sum(jnp.square(grads_x), axis=1))
    return lamb * jnp.mean(jnp.square(slopes - 1.0))


def gradient_penalty_z(d_fn: Callable[[jax.Array], jax.Array],
                       q_z: jax.Array, p_z: jax.Array,
                       key: jax.Array, lamb: float = 10.0) -> jax.Array:
    """vegan-wgan-gp penalty in code space (``gan_inference_cifar10.py:311-325``):
    interpolates from p_z toward q_z.
    """
    b = q_z.shape[0]
    alpha = jax.random.uniform(key, (b, 1))
    z_hat = p_z + alpha * (q_z - p_z)

    def d_sum(zh):
        return jnp.sum(d_fn(zh))

    grads = jax.grad(d_sum)(z_hat)
    slopes = jnp.sqrt(jnp.sum(jnp.square(grads), axis=1))
    return lamb * jnp.mean(jnp.square(slopes - 1.0))


def gradient_penalty(d_fn: Callable[..., jax.Array],
                     reals: Sequence[jax.Array], fakes: Sequence[jax.Array],
                     key: jax.Array, lamb: float = 10.0,
                     slope_argnums: Sequence[int] = (0,)) -> jax.Array:
    """General WGAN-GP over any tuple of interpolated inputs (one shared
    alpha), penalizing the L2 slope of the gradients w.r.t.
    ``slope_argnums`` inputs (concatenated).
    """
    b = reals[0].shape[0]
    alpha = jax.random.uniform(key, (b,) + (1,) * (reals[0].ndim - 1))
    hats = [r + alpha.reshape((b,) + (1,) * (r.ndim - 1)) * (f - r)
            for r, f in zip(reals, fakes)]

    def d_sum(*hs):
        return jnp.sum(d_fn(*hs))

    grads = jax.grad(d_sum, argnums=tuple(slope_argnums))(*hats)
    flat = jnp.concatenate([g.reshape(b, -1) for g in grads], axis=1)
    slopes = jnp.sqrt(jnp.sum(jnp.square(flat), axis=1))
    return lamb * jnp.mean(jnp.square(slopes - 1.0))
