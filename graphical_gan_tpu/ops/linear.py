"""Dense layer.

Rebuild of ``tflib/ops/linear.py:24-148`` as a pure function over the param
registry: all six init schemes (lecun / glorot(default) / he / glorot_he /
orthogonal / ('uniform', range)), the orthogonal-when-square default, optional
per-column weight normalization, ND-input reshape, and bias.

The matmul runs on the MXU via ``jnp.dot`` with an explicit
``preferred_element_type`` so bf16 inputs still accumulate in f32.
"""

from __future__ import annotations

from typing import Optional, Union, Tuple

import jax
import jax.numpy as jnp

from graphical_gan_tpu.core.registry import param
from graphical_gan_tpu.ops import initializers as inits


def linear(name: str, input_dim: int, output_dim: int, x: jax.Array,
           biases: bool = True,
           initialization: Optional[Union[str, Tuple[str, float]]] = None,
           weightnorm: bool = False,
           gain: float = 1.0) -> jax.Array:
    shape = (input_dim, output_dim)
    if isinstance(initialization, tuple):
        if initialization[0] != "uniform":
            raise ValueError(f"Invalid initialization {initialization!r}")
        w_init = inits.uniform_range(initialization[1], shape, gain)
    elif initialization == "orthogonal":
        # NOTE: the reference's "orthogonal when None and square" branch
        # (linear.py:76-77) is dead code — its elif chain catches None at the
        # glorot branch (:55) first, so default init is ALWAYS glorot.
        # Orthogonal therefore applies only when explicitly requested.
        w_init = inits.orthogonal(shape, gain)
    else:
        stdev = inits.linear_stdev(initialization, input_dim, output_dim)
        w_init = inits.scaled_uniform(stdev, shape, gain)

    w = param(name + ".W", w_init)

    if weightnorm:
        # per-column gain g, initialized to the initial column norms
        # (linear.py:113-126); depends on the realized W init values.
        def g_init(key):
            from graphical_gan_tpu.core.registry import get_param_value
            w0 = get_param_value(name + ".W")
            return jnp.sqrt(jnp.sum(jnp.square(w0), axis=0))

        g = param(name + ".g", g_init)
        norms = jnp.sqrt(jnp.sum(jnp.square(w), axis=0))
        w = w * (g / norms)

    # bf16 x bf16 matmuls accumulate in f32 on the TPU MXU by default; an
    # explicit preferred_element_type upcast would break the VJP dtypes.
    # The serving-side int8 context (ops/quant.py) intercepts the 2-D dot.
    from graphical_gan_tpu.ops import quant

    def _dot(x2d):
        q = quant.intercept_linear(name, x2d, w)
        return jnp.dot(x2d, w.astype(x2d.dtype)) if q is None else q

    if x.ndim == 2:
        out = _dot(x)
    else:
        lead = x.shape[:-1]
        out = _dot(x.reshape(-1, input_dim)).reshape(*lead, output_dim)

    if biases:
        b = param(name + ".b", inits.zeros((output_dim,)))
        out = out + b.astype(out.dtype)
    return out
