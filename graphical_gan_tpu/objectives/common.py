"""Shared loss primitives + optimizer presets.

The reference baked optimizer construction into every objective function
(``tflib/objs/gan_inference.py`` returns ``tf.train.*Optimizer().minimize``
ops).  On TPU the losses must be pure so they can live inside one jitted
alternating step; the optimizer hyperparameters each objective hard-coded are
preserved here as declarative ``OptSpec`` presets keyed by objective name.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


def sigmoid_ce(logits: jax.Array, label: float) -> jax.Array:
    """Numerically stable mean sigmoid cross-entropy vs a constant label.

    Matches ``tf.nn.sigmoid_cross_entropy_with_logits`` averaged over the
    batch: ``max(l,0) - l*z + log(1 + exp(-|l|))``.
    """
    l = logits.astype(jnp.float32)
    per = jnp.maximum(l, 0.0) - l * label + jnp.log1p(jnp.exp(-jnp.abs(l)))
    return jnp.mean(per)


@dataclass(frozen=True)
class OptSpec:
    """Which optimizer an objective trains each player with."""
    kind: str = "adam"          # 'adam' | 'rmsprop'
    lr: float = 2e-4
    beta1: float = 0.5
    beta2: float = 0.999
    eps: float = 1e-8           # adam; rmsprop uses 1e-10 (TF default)
    weight_clip: Optional[float] = None   # post-update clip (wali/wgan)


def optimizer_for(objective: str, lr: Optional[float] = None,
                  beta1: Optional[float] = None,
                  beta2: Optional[float] = None) -> OptSpec:
    """Optimizer preset per objective (``tflib/objs/gan_inference.py``):

    - wali / wgan: RMSProp lr=5e-5 + weight clip +-0.01 (``gan_inference.py:8-24``)
    - wali_gp / wgan_gp: Adam 1e-4 (0.5, 0.9)          (``:34-43``)
    - everything else: Adam 2e-4 (0.5, 0.999-or-passed) (``:68-77`` etc.)
    """
    if objective in ("wali", "wgan"):
        return OptSpec(kind="rmsprop", lr=lr if lr is not None else 5e-5,
                       weight_clip=0.01)
    if objective in ("wali_gp", "wgan_gp", "wali-gp", "wgan-gp"):
        return OptSpec(kind="adam", lr=lr if lr is not None else 1e-4,
                       beta1=0.5, beta2=0.9)
    return OptSpec(kind="adam",
                   lr=lr if lr is not None else 2e-4,
                   beta1=beta1 if beta1 is not None else 0.5,
                   beta2=beta2 if beta2 is not None else 0.999)
