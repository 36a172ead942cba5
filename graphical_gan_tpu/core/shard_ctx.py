"""Trace-time sharding-constraint context.

Lets parallel wrappers (``parallel/sequence.py``) request
``with_sharding_constraint`` placements on tensors created INSIDE model code
— without the model layer importing the parallel layer.  Model code calls
``constrain_frames(h)`` at its fold points (a no-op unless a parallel
wrapper installed a constraint for the duration of its trace).

The context is trace-scoped, not run-scoped: jit traces the wrapped step
while the context manager is active, baking the constraints into the
jaxpr; nothing is consulted at execution time.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Optional

import jax

_FRAME_CONSTRAINT: Optional[Callable[[jax.Array], jax.Array]] = None
_COMPONENT_CONSTRAINT: Optional[Callable[[jax.Array], jax.Array]] = None


@contextlib.contextmanager
def frame_constraint(fn: Callable[[jax.Array], jax.Array]):
    """Install ``fn`` as the active folded-frame-tensor constraint."""
    global _FRAME_CONSTRAINT
    prev = _FRAME_CONSTRAINT
    _FRAME_CONSTRAINT = fn
    try:
        yield
    finally:
        _FRAME_CONSTRAINT = prev


def constrain_frames(h: jax.Array) -> jax.Array:
    """Apply the active constraint to a folded ``[B*LEN, ...]`` tensor.

    Identity unless tracing under ``parallel.sequence.make_sp_train_step``.
    """
    if _FRAME_CONSTRAINT is None:
        return h
    return _FRAME_CONSTRAINT(h)


@contextlib.contextmanager
def component_constraint(fn: Callable[[jax.Array], jax.Array]):
    """Install ``fn`` as the active mixture-component-axis constraint."""
    global _COMPONENT_CONSTRAINT
    prev = _COMPONENT_CONSTRAINT
    _COMPONENT_CONSTRAINT = fn
    try:
        yield
    finally:
        _COMPONENT_CONSTRAINT = prev


def constrain_components(h: jax.Array) -> jax.Array:
    """Apply the active constraint to a ``[..., n_coms]``-last tensor
    (gmgan component logits / one-hot k samples).

    Identity unless tracing under ``parallel.expert.make_ep_train_step``.
    """
    if _COMPONENT_CONSTRAINT is None:
        return h
    return _COMPONENT_CONSTRAINT(h)
