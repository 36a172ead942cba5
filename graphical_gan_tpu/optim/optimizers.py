"""Per-player optimizers with TF1-exact update rules.

The reference trains each player with ``tf.train.AdamOptimizer`` or
``tf.train.RMSPropOptimizer`` (constructed inside ``tflib/objs/*``).  Their
TF1 semantics differ from the common (optax / torch) formulations in ways
that matter for training-dynamics parity:

- TF1 Adam folds bias correction into the step size:
  ``lr_t = lr * sqrt(1-b2^t) / (1-b1^t); p -= lr_t * m / (sqrt(v) + eps)``
  (epsilon OUTSIDE the bias-corrected sqrt, eps=1e-8).
- TF1 RMSProp initializes the moving second moment TO ONES (not zeros),
  decay=0.9, eps=1e-10: ``ms = .9 ms + .1 g^2; p -= lr * g / sqrt(ms + eps)``.

Both are implemented as pure pytree transforms usable inside a single jitted
alternating G/D step; the WGAN weight clip (``gan_inference.py:15-24``) is a
post-update transform applied to the discriminator player only.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from graphical_gan_tpu.objectives.common import OptSpec

Params = Dict[str, jax.Array]


@dataclass(frozen=True)
class Optimizer:
    init: Callable[[Params], Any]
    update: Callable[[Params, Any, Params], Tuple[Params, Any]]
    """update(grads, state, params) -> (new_params, new_state)"""


def adam(lr: float, beta1: float = 0.9, beta2: float = 0.999,
         eps: float = 1e-8,
         lr_scale: Callable[[jax.Array], jax.Array] | None = None
         ) -> Optimizer:
    """TF1 ``tf.train.AdamOptimizer`` semantics.  ``lr_scale(t)`` optionally
    scales the learning rate per step (the face script's linear DECAY,
    ``gan_inference_face.py:268-269``)."""

    def init(params: Params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return {"m": zeros, "v": jax.tree.map(jnp.zeros_like, params),
                "t": jnp.zeros((), jnp.int32)}

    def update(grads: Params, state, params: Params):
        t = state["t"] + 1
        tf_ = t.astype(jnp.float32)
        lr_t = lr * jnp.sqrt(1.0 - beta2 ** tf_) / (1.0 - beta1 ** tf_)
        if lr_scale is not None:
            lr_t = lr_t * lr_scale(tf_)
        m = jax.tree.map(lambda mu, g: beta1 * mu + (1 - beta1) * g,
                         state["m"], grads)
        v = jax.tree.map(lambda nu, g: beta2 * nu + (1 - beta2) * g * g,
                         state["v"], grads)
        new_params = jax.tree.map(
            lambda p, mu, nu: p - lr_t * mu / (jnp.sqrt(nu) + eps),
            params, m, v)
        return new_params, {"m": m, "v": v, "t": t}

    return Optimizer(init, update)


def rmsprop(lr: float, decay: float = 0.9, eps: float = 1e-10) -> Optimizer:
    """TF1 ``tf.train.RMSPropOptimizer`` (momentum=0, centered=False).
    The second-moment accumulator starts at ONES (TF1 quirk)."""

    def init(params: Params):
        return {"ms": jax.tree.map(jnp.ones_like, params)}

    def update(grads: Params, state, params: Params):
        ms = jax.tree.map(lambda s, g: decay * s + (1 - decay) * g * g,
                          state["ms"], grads)
        new_params = jax.tree.map(
            lambda p, g, s: p - lr * g / jnp.sqrt(s + eps),
            params, grads, ms)
        return new_params, {"ms": ms}

    return Optimizer(init, update)


def make_optimizer(spec: OptSpec,
                   lr_scale: Callable[[jax.Array], jax.Array] | None = None
                   ) -> Optimizer:
    if spec.kind == "adam":
        return adam(spec.lr, spec.beta1, spec.beta2, spec.eps,
                    lr_scale=lr_scale)
    if spec.kind == "rmsprop":
        return rmsprop(spec.lr)
    raise ValueError(f"unknown optimizer kind {spec.kind!r}")


def clip_params(params: Params, bound: float, name_filter: str = ""
                ) -> Params:
    """Post-update weight clipping: clip every param whose name contains
    ``name_filter`` to [-bound, bound] (``tflib/objs/gan_inference.py:15-24``
    clips all 'Discriminator' params)."""
    return {
        n: (jnp.clip(p, -bound, bound) if name_filter in n else p)
        for n, p in params.items()
    }
