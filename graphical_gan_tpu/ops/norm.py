"""Normalization layers.

Rebuild of ``tflib/ops/{batchnorm,layernorm,cond_batchnorm}.py`` with the
reference's *actual* semantics:

- the reference's scripts never pass ``is_training``, so its batchnorm
  **always uses current-batch statistics** — both fused conv path
  (``batchnorm.py:51-52``) and the generic dense path (``:74-87``).  The
  moving-average machinery is dead code; we do not carry moving stats at all
  (they would be never-updated constants in checkpoints).
- epsilon is 1e-5 on both paths (``batchnorm.py:30,84``).
- internal layout is channels-last: the reference's ``axes=[0,2,3]`` (NCHW)
  becomes reduction over (0,1,2) of NHWC; ``axes=[0,2]`` (NCW) becomes (0,1)
  of NWC; ``axes=[0,1,2,3]`` (the 3dcnn path over NDHWC in the reference,
  ``ssgan_inference_moving_mnist.py:372``) becomes (0,1,2,3) of NDHWC — all
  expressed uniformly as "normalize every axis except the last".

On TPU this whole layer is a pair of VPU reductions + a fused elementwise
epilogue; XLA fuses it into the adjacent conv, which is why a handwritten
Pallas kernel is reserved for the cases XLA misses (see ``ops/pallas``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

import os

from graphical_gan_tpu.core.registry import param
from graphical_gan_tpu.ops import initializers as inits

_EPS = 1e-5

# Pallas fused-BN path: identical numerics, fewer HBM passes.  Gating lives
# in ops.pallas.use_pallas (strictly opt-in via GGAN_PALLAS=1 /
# enable_pallas — honest A/Bs measured XLA's own fusion at or ahead of the
# kernel; see ops/pallas/__init__.py and tools/bench_pallas.py).
from graphical_gan_tpu.ops.pallas import enable_pallas, use_pallas  # noqa: F401,E402


def batchnorm_act(name: str, x: jax.Array, act: str = None,
                  axes: Sequence[int] = None) -> jax.Array:
    """``act(batchnorm(x))`` — the universal conv-block tail in all three
    model families.  With GGAN_PALLAS on (and the channels-last reduction
    pattern), the whole stats+normalize+activation pipeline runs as the
    fused Pallas kernel; otherwise the jnp path + activation."""
    if axes is None:
        axes = tuple(range(x.ndim - 1))
    if use_pallas() and tuple(axes) == tuple(range(x.ndim - 1)):
        c = x.shape[-1]
        offset = param(name + ".offset", inits.zeros((c,)))
        scale = param(name + ".scale", inits.ones((c,)))
        from graphical_gan_tpu.ops.pallas import fused_batchnorm_act
        return fused_batchnorm_act(x, scale, offset, act, _EPS)
    from graphical_gan_tpu.ops.activations import activation
    return activation(act)(batchnorm(name, x, axes=axes))


def batchnorm(name: str, x: jax.Array, axes: Sequence[int] = None) -> jax.Array:
    """Batch-statistics normalization with learned per-feature offset/scale.

    ``axes`` selects the reduction axes *of the channels-last tensor*; default
    is "all but last" (the conv case).  For the dense case pass ``axes=[0]``
    (feature axis is last, matching the reference's ``Batchnorm(name, [0], h)``
    on [B, F] inputs, ``batchnorm.py:74-87``).
    """
    if axes is None:
        axes = tuple(range(x.ndim - 1))
    axes = tuple(axes)

    # parameter shape: one value per non-reduced feature (keepdims layout for
    # the generic path; pure [C] for the "all but last" path)
    if axes == tuple(range(x.ndim - 1)):
        c = x.shape[-1]
        offset = param(name + ".offset", inits.zeros((c,)))
        scale = param(name + ".scale", inits.ones((c,)))
        if use_pallas():
            from graphical_gan_tpu.ops.pallas import fused_batchnorm_act
            return fused_batchnorm_act(x, scale, offset, None, _EPS)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=axes)
        var = jnp.var(x32, axis=axes)
        inv = jax.lax.rsqrt(var + _EPS) * scale
        out = (x32 - mean) * inv + offset
        return out.astype(x.dtype)

    # generic-axes path (reference batchnorm.py:74-87): keepdims param shapes
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.var(x32, axis=axes, keepdims=True)
    shape = list(x.shape)
    for a in axes:
        shape[a] = 1
    offset = param(name + ".offset", inits.zeros(shape))
    scale = param(name + ".scale", inits.ones(shape))
    inv = jax.lax.rsqrt(var + _EPS) * scale
    return ((x32 - mean) * inv + offset).astype(x.dtype)


def batchnorm_moving_stats(name: str, x: jax.Array, is_training,
                           stats_iter, moving_mean: jax.Array,
                           moving_var: jax.Array,
                           update_moving_stats: bool = True):
    """Opt-in rebuild of the reference's moving-stats BN machinery
    (``tflib/ops/batchnorm.py:26-68``) — dead code in every reference entry
    script (they never pass ``is_training``, ``:51-52``), carried for
    library-surface completeness.  Functional: the moving stats are explicit
    inputs/outputs (JAX has no variable assignment; they are also
    deliberately NOT registry params so the name-prefix player partition
    never feeds them to an optimizer — the reference marked them
    ``trainable=False``).

    Returns ``(out, new_moving_mean, new_moving_var)`` for channels-last x:

    - training: batch-stats normalization (ε=1e-5); moving stats updated
      with the reference's 1/(t+1) running mean (``:63-64``) using the
      Bessel-corrected batch variance (what ``tf.nn.fused_batch_norm``
      returns for its running-stats output).
    - inference: the reference's *blended* mode (``:32-37``): PER-ITEM
      spatial moments mixed with the moving stats at weights
      (1/B, (B-1)/B).
    """
    c = x.shape[-1]
    offset = param(name + ".offset", inits.zeros((c,)))
    scale = param(name + ".scale", inits.ones((c,)))
    x32 = x.astype(jnp.float32)
    red = tuple(range(x.ndim - 1))       # (0, 1, 2) for NHWC
    spatial = tuple(range(1, x.ndim - 1))  # (1, 2): per-item moments
    n = np.prod([x.shape[a] for a in red]).astype(np.float32)

    def train_branch(_):
        mean = jnp.mean(x32, axis=red)
        var = jnp.var(x32, axis=red)
        out = (x32 - mean) * (jax.lax.rsqrt(var + _EPS) * scale) + offset
        # running-stats update uses the Bessel-corrected variance
        var_unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
        t = jnp.asarray(stats_iter, jnp.float32)
        new_mean = (t / (t + 1.0)) * moving_mean + (1.0 / (t + 1.0)) * mean
        new_var = (t / (t + 1.0)) * moving_var \
            + (1.0 / (t + 1.0)) * var_unbiased
        if not update_moving_stats:
            new_mean, new_var = moving_mean, moving_var
        return out, new_mean, new_var

    def infer_branch(_):
        b = jnp.float32(x.shape[0])
        item_mean = jnp.mean(x32, axis=spatial, keepdims=True)
        item_var = jnp.var(x32, axis=spatial, keepdims=True)
        mean = (1.0 / b) * item_mean + ((b - 1.0) / b) * moving_mean
        var = (1.0 / b) * item_var + ((b - 1.0) / b) * moving_var
        out = (x32 - mean) * jax.lax.rsqrt(var + _EPS) * scale + offset
        return out, moving_mean, moving_var

    out, new_mean, new_var = jax.lax.cond(
        jnp.asarray(is_training, bool), train_branch, infer_branch, None)
    return out.astype(x.dtype), new_mean, new_var


def layernorm(name: str, norm_axes: Sequence[int], x: jax.Array) -> jax.Array:
    """Layer norm with per-neuron offset/scale (``tflib/ops/layernorm.py:6-20``).

    ``norm_axes[0]`` is the 'neurons' axis whose size determines the parameter
    count; offset/scale broadcast over the remaining normalized axes.
    """
    norm_axes = tuple(norm_axes)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=norm_axes, keepdims=True)
    var = jnp.var(x32, axis=norm_axes, keepdims=True)

    n_neurons = x.shape[norm_axes[0]]
    offset = param(name + ".offset", inits.zeros((n_neurons,)))
    scale = param(name + ".scale", inits.ones((n_neurons,)))

    # reshape for broadcast: neurons axis first of norm_axes (reference
    # layernorm.py:16-17 does [-1, 1, 1, ...])
    bshape = [1] * x.ndim
    bshape[norm_axes[0]] = n_neurons
    offset = offset.reshape(bshape)
    scale = scale.reshape(bshape)

    inv = jax.lax.rsqrt(var + _EPS) * scale
    return ((x32 - mean) * inv + offset).astype(x.dtype)


def cond_batchnorm(name: str, x: jax.Array, labels: jax.Array,
                   n_labels: int) -> jax.Array:
    """Conditional BN (Dumoulin) for NHWC conv maps
    (``tflib/ops/cond_batchnorm.py:6-17`` — reference supports axes [0,2,3]
    only, i.e. per-channel stats).
    """
    c = x.shape[-1]
    offset_m = param(name + ".offset", inits.zeros((n_labels, c)))
    scale_m = param(name + ".scale", inits.ones((n_labels, c)))
    offset = offset_m[labels]          # [B, C]
    scale = scale_m[labels]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 2))
    var = jnp.var(x32, axis=(0, 1, 2))
    inv = jax.lax.rsqrt(var + _EPS)
    out = (x32 - mean) * inv
    return (out * scale[:, None, None, :] +
            offset[:, None, None, :]).astype(x.dtype)
