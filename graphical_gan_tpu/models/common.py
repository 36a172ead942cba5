"""Shared model utilities (input normalization conventions)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphical_gan_tpu.core.registry import next_rng_key


def normalize_input(cfg, raw: jax.Array, compute_dtype) -> jax.Array:
    """Per-dataset raw->network-input mapping (see ``config.DataSpec``):
    mnist [0,1] passthrough; cifar/svhn int -> [-1,1] via /255
    (``gan_inference_cifar10.py:262``); celebA int -> [-1,1] via /256 +
    U(0,1/128) dequantization (``gan_inference_face.py:155-157``); video
    float [0,1] -> [-1,1] (``ssgan_inference_moving_mnist.py:514``).
    """
    norm = cfg.data.normalization
    if norm == "unit":
        x = raw.astype(jnp.float32)
    elif norm == "int_pm1":
        x = 2.0 * (raw.astype(jnp.float32) / 255.0 - 0.5)
    elif norm == "dequant":
        x = 2.0 * (raw.astype(jnp.float32) / 256.0 - 0.5)
        x = x + jax.random.uniform(next_rng_key(), x.shape, minval=0.0,
                                   maxval=1.0 / 128.0)
    elif norm == "unit_pm1":
        x = 2.0 * (raw.astype(jnp.float32) - 0.5)
    elif norm == "int256_pm1":
        # chairs: int pixels /256, no dequantization noise (ssgan_chairs:508)
        x = 2.0 * (raw.astype(jnp.float32) / 256.0 - 0.5)
    else:
        raise ValueError(norm)
    return x.astype(compute_dtype)


def bn_act(flag: bool, name: str, x, act: str, axes=None):
    """act(batchnorm(x)) when BN is enabled (fusable into the Pallas kernel
    under GGAN_PALLAS); plain activation otherwise.  Shared by all model
    families so the fused/unfused dispatch lives in exactly one place."""
    from graphical_gan_tpu.ops.activations import activation
    from graphical_gan_tpu.ops.norm import batchnorm_act
    if flag:
        return batchnorm_act(name, x, act, axes=axes)
    return activation(act)(x)
