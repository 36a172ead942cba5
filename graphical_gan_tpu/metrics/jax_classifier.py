"""A JAX-native image classifier for hermetic sample-quality scoring.

The reference's inception score depends on a downloaded frozen
Inception-2015 GraphDef (``tflib/inception_score.py:56-76``); a zero-egress
TPU cluster can't fetch weights, so absolute IS parity is only measurable
where those weights exist (see ``metrics.inception.TorchInceptionClassifier``).

This module provides the hermetic alternative: a small convnet built on the
framework's own ops, trained supervised on the labeled dataset (CIFAR-10
trains to ~70%+ in a few minutes on one chip), whose softmax plugs into the
SAME split-KL scoring arithmetic.  Scores from this classifier are
comparable across runs that share a classifier checkpoint — which is exactly
how the "IS within 0.1 of the reference" comparison is made hermetically:
score both sample sets with the same classifier.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.ops import batchnorm, conv2d, leaky_relu, linear
from graphical_gan_tpu.ops.layout import unflatten_image
from graphical_gan_tpu.optim import adam

Params = Dict[str, jax.Array]


class MetricClassifier:
    """Small conv classifier over flat NCHW-ordered int images."""

    def __init__(self, image_hw=(32, 32), channels=3, n_classes=10, dim=64):
        self.image_hw = image_hw
        self.channels = channels
        self.n_classes = n_classes
        self.dim = dim

    def trunk(self, x_flat: jax.Array) -> jax.Array:
        """Pooled penultimate features [B, 4*dim] (also the FID features)."""
        h_, w_ = self.image_hw
        x = 2.0 * (x_flat.astype(jnp.float32) / 255.0 - 0.5)
        x = unflatten_image(x, self.channels, h_, w_)
        d = self.dim
        h = leaky_relu(conv2d("Classifier.1", self.channels, d, 3, x,
                              stride=2))
        h = leaky_relu(batchnorm("Classifier.BN2",
                                 conv2d("Classifier.2", d, 2 * d, 3, h,
                                        stride=2)))
        h = leaky_relu(batchnorm("Classifier.BN3",
                                 conv2d("Classifier.3", 2 * d, 4 * d, 3, h,
                                        stride=2)))
        return jnp.mean(h, axis=(1, 2))  # global average pool

    def forward(self, x_flat: jax.Array) -> jax.Array:
        h = self.trunk(x_flat)
        return linear("Classifier.Output", 4 * self.dim, self.n_classes, h)

    def init(self, key: jax.Array, batch_size: int = 8) -> Params:
        x = jnp.zeros((batch_size,
                       self.channels * self.image_hw[0] * self.image_hw[1]),
                      jnp.int32)
        _, params = registry.init(lambda: self.forward(x), key)
        return params

    # -- training -----------------------------------------------------------

    def make_train_step(self, lr: float = 1e-3):
        opt = adam(lr, 0.9, 0.999)

        def loss_fn(params, x, y):
            logits = registry.apply(lambda: self.forward(x), params, None)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.mean(jnp.take_along_axis(logp, y[:, None],
                                                axis=1))
            acc = jnp.mean((jnp.argmax(logits, axis=1) == y).astype(
                jnp.float32))
            return nll, acc

        @jax.jit
        def step(params, opt_state, x, y):
            (loss, acc), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, x, y)
            params, opt_state = opt.update(grads, opt_state, params)
            return params, opt_state, loss, acc

        return step, opt.init

    def fit(self, images: np.ndarray, labels: np.ndarray,
            steps: int = 2000, batch_size: int = 256, lr: float = 1e-3,
            seed: int = 0, log_every: int = 0) -> Params:
        params = self.init(jax.random.PRNGKey(seed), batch_size)
        step, opt_init = self.make_train_step(lr)
        opt_state = opt_init(params)
        rng = np.random.RandomState(seed)
        labels = np.asarray(labels).astype(np.int32)
        for i in range(steps):
            idx = rng.randint(0, len(images), size=batch_size)
            params, opt_state, loss, acc = step(
                params, opt_state, jnp.asarray(images[idx]),
                jnp.asarray(labels[idx]))
            if log_every and i % log_every == log_every - 1:
                print(f"classifier step {i + 1}: loss={float(loss):.4f} "
                      f"acc={float(acc):.3f}")
        return params

    # -- scoring interface ---------------------------------------------------

    def as_feature_fn(self, params: Params):
        """Penultimate (pooled) features for FID (``metrics.fid``):
        ``images_uint8[N,H,W,C] -> feats[N, 4*dim]``."""

        @jax.jit
        def feats(x_flat):
            return registry.apply(lambda: self.trunk(x_flat), params, None)

        def feature_fn(images_hwc: np.ndarray) -> np.ndarray:
            x = np.transpose(np.asarray(images_hwc), (0, 3, 1, 2))
            x = x.reshape(x.shape[0], -1).astype(np.int32)
            return np.asarray(feats(jnp.asarray(x)))

        return feature_fn

    def as_prob_fn(self, params: Params):
        """Returns ``images_uint8[N,H,W,C] -> probs[N,K]`` for
        ``metrics.inception.get_inception_score``."""

        @jax.jit
        def probs(x_flat):
            logits = registry.apply(lambda: self.forward(x_flat), params,
                                    None)
            return jax.nn.softmax(logits)

        def classifier(images_hwc: np.ndarray) -> np.ndarray:
            x = np.transpose(np.asarray(images_hwc), (0, 3, 1, 2))
            x = x.reshape(x.shape[0], -1).astype(np.int32)
            return np.asarray(probs(jnp.asarray(x)))

        return classifier

    def accuracy(self, params: Params, images: np.ndarray,
                 labels: np.ndarray, batch_size: int = 512) -> float:
        correct = 0
        labels = np.asarray(labels)
        for i in range(0, len(images), batch_size):
            x = jnp.asarray(images[i:i + batch_size])
            logits = registry.apply(lambda: self.forward(x), params, None)
            correct += int(np.sum(np.argmax(np.asarray(logits), axis=1)
                                  == labels[i:i + batch_size]))
        return correct / len(images)
