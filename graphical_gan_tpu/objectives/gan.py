"""Plain (non-inference) GAN losses — rebuild of ``tflib/objs/gan.py``."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from graphical_gan_tpu.objectives.common import sigmoid_ce

Scalar = jax.Array


def wgan(disc_fake: jax.Array, disc_real: jax.Array) -> Tuple[Scalar, Scalar]:
    """``gan.py:4-26`` — pair with RMSProp 5e-5 + 0.01 weight clip."""
    gen_cost = -jnp.mean(disc_fake)
    disc_cost = jnp.mean(disc_fake) - jnp.mean(disc_real)
    return gen_cost, disc_cost


def wgan_gp(disc_fake: jax.Array, disc_real: jax.Array,
            gradient_penalty: Scalar) -> Tuple[Scalar, Scalar]:
    """``gan.py:28-48`` — pair with Adam 1e-4 (0.5, 0.9)."""
    gen_cost = -jnp.mean(disc_fake)
    disc_cost = jnp.mean(disc_fake) - jnp.mean(disc_real) + gradient_penalty
    return gen_cost, disc_cost


def gan(disc_fake: jax.Array, disc_real: jax.Array) -> Tuple[Scalar, Scalar]:
    """Non-saturating GAN (``gan.py:50-78``); disc cost halved."""
    gen_cost = sigmoid_ce(disc_fake, 1.0)
    disc_cost = (sigmoid_ce(disc_fake, 0.0) + sigmoid_ce(disc_real, 1.0)) / 2.0
    return gen_cost, disc_cost
