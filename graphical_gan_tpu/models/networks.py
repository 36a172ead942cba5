"""DCGAN-style network templates for the GAN-inference family.

These reproduce the per-script architectures of the reference exactly
(layer names, dims, BN placement, activation choices, the MNIST 8x8->7x7
crop), but written NHWC / channels-last for the TPU MXU:

- mnist:   ``gan_inference_mnist.py:122-252``  (sigmoid output, 28x28 crop path)
- cifar10: ``gan_inference_cifar10.py:135-259`` (tanh output, dropout-D)
- svhn:    identical to cifar10 with BN off
- celeba:  ``gan_inference_face.py:78-146``     (4-stage 64x64 nets, no BN)

All take/return the reference's flat NCHW-ordered vectors at the boundary
(``ops.layout``), so user-visible array layouts match the TF code.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from graphical_gan_tpu.core.registry import next_rng_key
from graphical_gan_tpu.ops import (
    batchnorm, conv2d, deconv2d, dropout, flatten_image, gaussian_noise,
    leaky_relu, linear, relu, unflatten_image,
)
from graphical_gan_tpu.models.common import bn_act as _bn_act


# ---------------------------------------------------------------------------
# Generators
# ---------------------------------------------------------------------------

def generator(cfg, noise: jax.Array) -> Tuple[jax.Array, None, None]:
    """Flat-image generator; dispatches on ``cfg.dataset``."""
    if cfg.dataset == "mnist":
        return _generator_28(cfg, noise)
    if cfg.dataset in ("cifar10", "svhn"):
        return _generator_32(cfg, noise)
    if cfg.dataset == "celeba":
        return _generator_64(cfg, noise)
    raise ValueError(cfg.dataset)


def _generator_28(cfg, noise):
    """``gan_inference_mnist.py:122-144`` — incl. the 8x8->7x7 crop at :134."""
    dim = cfg.dim
    h = linear("Generator.Input", cfg.dim_latent, 4 * 4 * 4 * dim, noise)
    h = _bn_act(cfg.bn, "Generator.BN1", h, "relu", axes=[0])
    h = h.reshape(-1, 4, 4, 4 * dim)

    h = deconv2d("Generator.2", 4 * dim, 2 * dim, 5, h)
    h = _bn_act(cfg.bn, "Generator.BN2", h, "relu")

    h = h[:, :7, :7, :]  # 8x8 -> 7x7 crop (reference crops NCHW [:, :, :7, :7])

    h = deconv2d("Generator.3", 2 * dim, dim, 5, h)
    h = _bn_act(cfg.bn, "Generator.BN3", h, "relu")

    h = deconv2d("Generator.5", dim, 1, 5, h)
    h = jax.nn.sigmoid(h)
    return flatten_image(h), None, None


def _generator_32(cfg, noise):
    """``gan_inference_cifar10.py:135-155`` — tanh output."""
    dim = cfg.dim
    h = linear("Generator.Input", cfg.dim_latent, 4 * 4 * 4 * dim, noise)
    h = _bn_act(cfg.bn, "Generator.BN1", h, "relu", axes=[0])
    h = h.reshape(-1, 4, 4, 4 * dim)

    h = deconv2d("Generator.2", 4 * dim, 2 * dim, 5, h)
    h = _bn_act(cfg.bn, "Generator.BN2", h, "relu")

    h = deconv2d("Generator.3", 2 * dim, dim, 5, h)
    h = _bn_act(cfg.bn, "Generator.BN3", h, "relu")

    h = deconv2d("Generator.5", dim, cfg.data.channels, 5, h)
    h = jnp.tanh(h)
    return flatten_image(h), None, None


def _generator_64(cfg, noise):
    """``gan_inference_face.py:78-95`` — 4 deconvs, no BN."""
    dim = cfg.dim_g or cfg.dim
    h = linear("Generator.Input", cfg.dim_latent, 4 * 4 * 8 * dim, noise)
    h = relu(h)
    h = h.reshape(-1, 4, 4, 8 * dim)
    h = relu(deconv2d("Generator.2", 8 * dim, 4 * dim, 5, h))
    h = relu(deconv2d("Generator.3", 4 * dim, 2 * dim, 5, h))
    h = relu(deconv2d("Generator.4", 2 * dim, dim, 5, h))
    h = jnp.tanh(deconv2d("Generator.5", dim, 3, 5, h))
    return flatten_image(h), None, None


# ---------------------------------------------------------------------------
# Extractors (inference networks)
# ---------------------------------------------------------------------------

def extractor(cfg, x_flat: jax.Array
              ) -> Tuple[jax.Array, Optional[jax.Array], Optional[jax.Array]]:
    """Posterior network q(z|x); returns (z, mean, std) honoring TYPE_Q
    (``gan_inference_mnist.py:146-180``).
    """
    hgt, wdt = cfg.data.image_hw
    ch = cfg.data.channels
    x = unflatten_image(x_flat, ch, hgt, wdt)

    if cfg.dataset == "celeba":
        dim = cfg.dim_g or cfg.dim
        h = conv2d("Extractor.1", ch, dim, 5, x, stride=2, act="leaky_relu")
        h = conv2d("Extractor.2", dim, 2 * dim, 5, h, stride=2, act="leaky_relu")
        h = conv2d("Extractor.3", 2 * dim, 4 * dim, 5, h, stride=2, act="leaky_relu")
        h = conv2d("Extractor.4", 4 * dim, 8 * dim, 5, h, stride=2, act="leaky_relu")
        feat = 4 * 4 * 8 * dim
        h = h.reshape(-1, feat)
        # face.py:114 — no stochastic head
        z = linear("Extractor.Output", feat, cfg.dim_latent, h)
        return z, None, None

    h = extractor_front(cfg, x)
    return extractor_back(cfg, h, batch=x_flat.shape[0])


def extractor_front(cfg, x):
    """Convs 1-2 (+BN2) of the generic extractor — the stage-0 trunk cut
    for deeper pipeline-parallel stage splits (parallel/pipeline.py:
    build_family1_stages4).  Identical math to the monolithic extractor;
    it merely names the split point."""
    dim = cfg.dim
    h = conv2d("Extractor.1", cfg.data.channels, dim, 5, x, stride=2,
               act="leaky_relu")
    h = conv2d("Extractor.2", dim, 2 * dim, 5, h, stride=2)
    return _bn_act(cfg.bn, "Extractor.BN2", h, "leaky_relu")


def extractor_back(cfg, h, batch: int
                   ) -> Tuple[jax.Array, Optional[jax.Array],
                              Optional[jax.Array]]:
    """Conv 3 (+BN3) + the TYPE_Q heads of the generic extractor."""
    dim = cfg.dim
    h = conv2d("Extractor.3", 2 * dim, 4 * dim, 5, h, stride=2)
    h = _bn_act(cfg.bn, "Extractor.BN3", h, "leaky_relu")
    feat = 4 * 4 * 4 * dim
    h = h.reshape(-1, feat)

    if cfg.type_q == "learn_std":
        log_std = linear("Extractor.Std", feat, cfg.dim_latent, h)
        std = jnp.exp(log_std)
    elif cfg.type_q == "fix_std":
        std = jnp.full((batch, cfg.dim_latent), cfg.std, dtype=jnp.float32)
    else:
        std = None

    mean_or_z = linear("Extractor.Output", feat, cfg.dim_latent, h)

    if cfg.type_q in ("learn_std", "fix_std"):
        eps = jax.random.normal(next_rng_key(), mean_or_z.shape,
                                dtype=jnp.float32)
        z = mean_or_z + eps * std
        return z, mean_or_z, std
    return mean_or_z, None, None


# ---------------------------------------------------------------------------
# Discriminators
# ---------------------------------------------------------------------------

def discriminator_xz(cfg, x_flat: jax.Array, z: jax.Array) -> jax.Array:
    """Joint discriminator on (data, code) pairs; per-dataset topology."""
    hgt, wdt = cfg.data.image_hw
    ch = cfg.data.channels
    x = unflatten_image(x_flat, ch, hgt, wdt)
    dr = cfg.dropout_rate

    if cfg.dataset == "mnist":
        # gan_inference_mnist.py:217-252 — BN in D convs, 2-layer z branch,
        # 2-layer zx trunk
        dim = cfg.dim
        h = conv2d("Discriminator.1", ch, dim, 5, x, stride=2, act="leaky_relu")
        h = conv2d("Discriminator.2", dim, 2 * dim, 5, h, stride=2)
        h = _bn_act(cfg.bn, "Discriminator.BN2", h, "leaky_relu")
        h = conv2d("Discriminator.3", 2 * dim, 4 * dim, 5, h, stride=2)
        h = _bn_act(cfg.bn, "Discriminator.BN3", h, "leaky_relu")
        feat = 4 * 4 * 4 * dim
        h = h.reshape(-1, feat)

        hz = leaky_relu(linear("Discriminator.z1", cfg.dim_latent, 512, z))
        hz = dropout(hz, dr)
        # NOTE: the reference reuses the name 'Discriminator.2' for this
        # Linear (mnist:238); it collides only at the TF name-scope level,
        # param keys stay distinct (.W vs .Filters) — reproduced as-is.
        hz = leaky_relu(linear("Discriminator.2", 512, 512, hz))
        hz = dropout(hz, dr)

        h = jnp.concatenate([h, hz], axis=1)
        h = leaky_relu(linear("Discriminator.zx1", feat + 512, 512, h))
        h = dropout(h, dr)
        h = leaky_relu(linear("Discriminator.zx2", 512, 512, h))
        h = dropout(h, dr)
        out = linear("Discriminator.Output", 512, 1, h)
        return out.reshape(-1)

    if cfg.dataset in ("cifar10", "svhn"):
        # gan_inference_cifar10.py:232-259 — dropout instead of BN, single zx
        h = discriminator_x_trunk(cfg, x)
        return discriminator_xz_head(cfg, h, z)

    if cfg.dataset == "celeba":
        # gan_inference_face.py:119-146 — 4 conv stages
        dim = cfg.dim_d or cfg.dim
        h = x
        for i, (ci, co) in enumerate(
                [(ch, dim), (dim, 2 * dim), (2 * dim, 4 * dim),
                 (4 * dim, 8 * dim)], start=1):
            h = conv2d(f"Discriminator.{i}", ci, co, 5, h,
                                  stride=2, act="leaky_relu")
            h = dropout(h, dr)
        feat = 4 * 4 * 8 * dim
        h = h.reshape(-1, feat)
        hz = leaky_relu(linear("Discriminator.z1", cfg.dim_latent, 512, z))
        hz = dropout(hz, dr)
        h = jnp.concatenate([h, hz], axis=1)
        h = leaky_relu(linear("Discriminator.zx1", feat + 512, 512, h))
        h = dropout(h, dr)
        out = linear("Discriminator.Output", 512, 1, h)
        return out.reshape(-1)

    raise ValueError(cfg.dataset)


def discriminator_x_trunk(cfg, x):
    """The cifar10/svhn joint discriminator's conv trunk (3 k5s2 convs +
    dropout) — the stage-2 cut for deeper pipeline stage splits
    (parallel/pipeline.py: build_family1_stages4).  Returns the flattened
    [B, 4*4*4*dim] feature; identical math to the monolithic path."""
    dr = cfg.dropout_rate
    dim = cfg.dim
    ch = cfg.data.channels
    h = conv2d("Discriminator.1", ch, dim, 5, x, stride=2, act="leaky_relu")
    h = dropout(h, dr)
    h = conv2d("Discriminator.2", dim, 2 * dim, 5, h, stride=2,
               act="leaky_relu")
    h = dropout(h, dr)
    h = conv2d("Discriminator.3", 2 * dim, 4 * dim, 5, h, stride=2,
               act="leaky_relu")
    h = dropout(h, dr)
    feat = 4 * 4 * 4 * dim
    return h.reshape(-1, feat)


def discriminator_xz_head(cfg, h_feat, z: jax.Array) -> jax.Array:
    """The cifar10/svhn joint discriminator's (x, z) tail: z branch,
    concat, zx trunk, output."""
    dr = cfg.dropout_rate
    feat = 4 * 4 * 4 * cfg.dim
    hz = leaky_relu(linear("Discriminator.z1", cfg.dim_latent, 512, z))
    hz = dropout(hz, dr)
    h = jnp.concatenate([h_feat, hz], axis=1)
    h = leaky_relu(linear("Discriminator.zx1", feat + 512, 512, h))
    h = dropout(h, dr)
    out = linear("Discriminator.Output", 512, 1, h)
    return out.reshape(-1)


def discriminator_z(cfg, z: jax.Array) -> jax.Array:
    """Code-space discriminator for the vegan family
    (``gan_inference_mnist.py:184-211``): Gaussian-noise layers + MLP.
    """
    h = gaussian_noise(z, std=0.3)
    h = linear("Discriminator.Input", cfg.dim_latent, 1024, h)
    h = _bn_act(cfg.bn, "Discriminator.BN1", h, "leaky_relu", axes=[0])
    h = gaussian_noise(h, std=0.5)

    h = linear("Discriminator.2", 1024, 512, h)
    h = _bn_act(cfg.bn, "Discriminator.BN2", h, "leaky_relu", axes=[0])
    h = gaussian_noise(h, std=0.5)

    h = linear("Discriminator.3", 512, 256, h)
    h = _bn_act(cfg.bn, "Discriminator.BN3", h, "leaky_relu", axes=[0])
    h = gaussian_noise(h, std=0.5)

    h = linear("Discriminator.4", 256, 256, h)
    h = _bn_act(cfg.bn, "Discriminator.BN4", h, "leaky_relu", axes=[0])

    out = linear("Discriminator.Output", 256, 1, h)
    return out.reshape(-1)
