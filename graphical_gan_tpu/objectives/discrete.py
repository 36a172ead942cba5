"""REINFORCE surrogate for discrete latents.

Rebuild of ``tflib/objs/discrete_variables.py:4-8``: the surrogate
``stop_gradient(f_k - cv) * log p_k`` is ADDED TO THE LOSS (not the grads) so
that differentiating the total generator cost produces the score-function
gradient estimate for the categorical parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def score_function(f_k: jax.Array, p_k: jax.Array, c_v: float) -> jax.Array:
    return jax.lax.stop_gradient(f_k - c_v) * jnp.log(p_k)
