"""PTQ calibration for the serving sampler (int8 path, ``ops/quant.py``).

Calibration runs the family's sampler EAGERLY on prior-distributed
latents — exactly the input distribution the deployed artifact sees,
since serving inputs ARE prior draws — recording each intercepted
layer's input absmax, and converts the records to symmetric per-tensor
activation scales.  ``serve/export.py`` (``--quantize int8``) and
``tools/bench_serving.py`` (``--quantize int8``) both build on this.

The reference has no serving path of any kind (it writes one end-of-run
checkpoint, ships no restore code — ``gan_inference_cifar10.py:498-499``);
quantized serving is TPU-native machinery: the v5e MXU runs int8 at 2x
bf16 peak.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from graphical_gan_tpu.ops import quant


def prior_inputs(family: str, cfg, n: int, key):
    """Prior-distributed sampler inputs (matches the training-time priors:
    N(0,1) latents; uniform one-hot components/labels)."""
    k1, k2, k3 = jax.random.split(key, 3)
    if family == "gan_inference":
        return (jax.random.normal(k1, (n, cfg.dim_latent), jnp.float32),)
    if family == "gmgan":
        comp = jax.random.randint(k1, (n,), 0, cfg.n_coms)
        return (jax.nn.one_hot(comp, cfg.n_coms, dtype=jnp.float32),
                jax.random.normal(k2, (n, cfg.dim_latent), jnp.float32))
    if family == "ssgan":
        out = (jax.random.normal(k1, (n, cfg.dim_latent_l), jnp.float32),
               jax.random.normal(k2, (n, cfg.dim_latent_g), jnp.float32))
        if cfg.conditional:
            lab = jax.random.randint(k3, (n,), 0, cfg.n_classes)
            out += (jax.nn.one_hot(lab, cfg.n_classes, dtype=jnp.float32),)
        return out
    raise ValueError(f"unknown family {family!r}")


def calibrate(family: str, model, params, key,
              n_batches: int = 4,
              batch_size: Optional[int] = None) -> Dict[str, float]:
    """Run ``n_batches`` eager sampler batches under the calibration
    context; returns per-layer activation scales for ``quant.quantized``."""
    from graphical_gan_tpu.serve.export import make_sampler
    fn, example = make_sampler(family, model)
    n = batch_size or example[0].shape[0]
    records: Dict[str, float] = {}
    # disable_jit makes control-flow primitives (ssgan's latent-chain
    # lax.scan) execute their bodies on concrete values, so the recording
    # intercepts see real activations instead of tracers
    with jax.disable_jit(), quant.calibrating(records):
        for i in range(n_batches):
            key, kin, krun = jax.random.split(key, 3)
            fn(params, krun, *prior_inputs(family, model.cfg, n, kin))
    if not records:
        raise RuntimeError("calibration recorded no layers — the sampler "
                           "hit no intercepted conv/deconv/linear ops")
    return quant.scales_from_records(records)
