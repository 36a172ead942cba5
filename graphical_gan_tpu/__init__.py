"""graphical_gan_tpu — a TPU-native (JAX/XLA/Pallas) framework for Graphical
Generative Adversarial Networks.

A ground-up rebuild of the capabilities of zhenxuan00/graphical-gan
(arXiv:1804.03429) designed for TPU hardware:

- functional name-keyed parameter registry (``core.registry``) replacing the
  reference's ``tflib.param`` TF-variable cache (``/root/reference/tflib/__init__.py:9-36``),
- MXU-friendly NHWC conv/deconv/batchnorm ops (``ops``) replacing
  ``tflib/ops/*`` (which were NCHW TF1 kernels with per-layer transposes),
- pure-function adversarial objectives (``objectives``) replacing
  ``tflib/objs/*`` (which fused losses with ``tf.train`` optimizers),
- a single donated jitted train step (G update + k D updates, both players'
  optimizers, on-device RNG) replacing the reference's per-update
  ``session.run`` + ``feed_dict`` round trips,
- data-parallel scaling via ``jax.sharding.Mesh`` (``parallel``), which the
  reference (single device, single process) did not have.
"""

__version__ = "0.1.0"

from graphical_gan_tpu.core import registry
from graphical_gan_tpu.core.registry import (
    param,
    init,
    apply,
    params_with_name,
    next_rng_key,
)
