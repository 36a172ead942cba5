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
         lr_scale: Callable[[jax.Array], jax.Array] | None = None,
         master_weights: bool = False,
         moment_dtype=None) -> Optimizer:
    """TF1 ``tf.train.AdamOptimizer`` semantics.  ``lr_scale(t)`` optionally
    scales the learning rate per step (the face script's linear DECAY,
    ``gan_inference_face.py:268-269``).

    ``master_weights=True`` is the low-byte-training mode: the LIVE params
    may be bfloat16 (halving fwd/bwd weight reads — the step is HBM-bound),
    while the update accumulates into f32 master copies kept here, so tiny
    updates are never lost to bf16 rounding.  ``moment_dtype`` stores m/v at
    a narrower dtype (the arithmetic still runs in f32 per step).
    """

    def moments_like(params):
        # moments are f32 even when the live params are bf16 (update math
        # runs in f32; moment_dtype narrows storage explicitly)
        md = moment_dtype or jnp.float32
        return jax.tree.map(lambda p: jnp.zeros(p.shape, dtype=md), params)

    def init(params: Params):
        state = {"m": moments_like(params), "v": moments_like(params),
                 "t": jnp.zeros((), jnp.int32)}
        if master_weights:
            state["master"] = jax.tree.map(
                lambda p: p.astype(jnp.float32), params)
        return state

    def update(grads: Params, state, params: Params):
        t = state["t"] + 1
        tf_ = t.astype(jnp.float32)
        lr_t = lr * jnp.sqrt(1.0 - beta2 ** tf_) / (1.0 - beta1 ** tf_)
        if lr_scale is not None:
            lr_t = lr_t * lr_scale(tf_)
        f32 = jnp.float32
        m = jax.tree.map(
            lambda mu, g: beta1 * mu.astype(f32) + (1 - beta1) * g.astype(f32),
            state["m"], grads)
        v = jax.tree.map(
            lambda nu, g: beta2 * nu.astype(f32)
            + (1 - beta2) * jnp.square(g.astype(f32)),
            state["v"], grads)
        base = state.get("master", params)
        new_base = jax.tree.map(
            lambda p, mu, nu: p.astype(f32) - lr_t * mu / (jnp.sqrt(nu) + eps),
            base, m, v)
        new_params = jax.tree.map(lambda p, nb: nb.astype(p.dtype),
                                  params, new_base)
        if moment_dtype is not None:
            m = jax.tree.map(lambda x: x.astype(moment_dtype), m)
            v = jax.tree.map(lambda x: x.astype(moment_dtype), v)
        new_state = {"m": m, "v": v, "t": t}
        if master_weights:
            new_state["master"] = new_base
        return new_params, new_state

    return Optimizer(init, update)


def rmsprop(lr: float, decay: float = 0.9, eps: float = 1e-10,
            master_weights: bool = False, moment_dtype=None) -> Optimizer:
    """TF1 ``tf.train.RMSPropOptimizer`` (momentum=0, centered=False).
    The second-moment accumulator starts at ONES (TF1 quirk)."""

    def init(params: Params):
        md = moment_dtype or jnp.float32
        ms = jax.tree.map(lambda p: jnp.ones(p.shape, dtype=md), params)
        state = {"ms": ms}
        if master_weights:
            state["master"] = jax.tree.map(
                lambda p: p.astype(jnp.float32), params)
        return state

    def update(grads: Params, state, params: Params):
        f32 = jnp.float32
        ms = jax.tree.map(
            lambda s, g: decay * s.astype(f32)
            + (1 - decay) * jnp.square(g.astype(f32)),
            state["ms"], grads)
        base = state.get("master", params)
        new_base = jax.tree.map(
            lambda p, g, s: p.astype(f32)
            - lr * g.astype(f32) / jnp.sqrt(s + eps),
            base, grads, ms)
        new_params = jax.tree.map(lambda p, nb: nb.astype(p.dtype),
                                  params, new_base)
        if moment_dtype is not None:
            ms = jax.tree.map(lambda x: x.astype(moment_dtype), ms)
        new_state = {"ms": ms}
        if master_weights:
            new_state["master"] = new_base
        return new_params, new_state

    return Optimizer(init, update)


def make_optimizer(spec: OptSpec,
                   lr_scale: Callable[[jax.Array], jax.Array] | None = None,
                   master_weights: bool = False,
                   moment_dtype=None) -> Optimizer:
    if spec.kind == "adam":
        return adam(spec.lr, spec.beta1, spec.beta2, spec.eps,
                    lr_scale=lr_scale, master_weights=master_weights,
                    moment_dtype=moment_dtype)
    if spec.kind == "rmsprop":
        return rmsprop(spec.lr, master_weights=master_weights,
                       moment_dtype=moment_dtype)
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
