"""Convolution ops (2-D, transpose-2-D, 1-D, 3-D).

Rebuild of ``tflib/ops/{conv2d,deconv2d,conv1d,conv3d}.py`` for TPU:

- all layouts are channels-last (NHWC / NWC / NDHWC) so the channel dim maps
  onto the 128-wide lane dimension of the MXU/VPU; the reference was NCHW and
  its deconv additionally transposed NCHW<->NHWC *around every call*
  (``tflib/ops/deconv2d.py:91,116``) — those per-layer transposes are gone.
- kernels are stored in the TF layouts (HWIO for conv, HW-O-I for transpose
  conv, ``deconv2d.py:63``) so the initialization fan arithmetic
  (incl. the transpose-conv fan swap, ``deconv2d.py:51-52``) is identical.
- convs lower to ``lax.conv_general_dilated`` / ``lax.conv_transpose`` which
  XLA maps straight onto the MXU; ``preferred_element_type=float32`` keeps
  bf16 activations accumulating in f32.
- PixelCNN-style mask types 'a'/'b' reproduce ``conv2d.py:29-52``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from graphical_gan_tpu.core.registry import param
from graphical_gan_tpu.ops import initializers as inits

_DN2D = ("NHWC", "HWIO", "NHWC")
_DN1D = ("NWC", "WIO", "NWC")
_DN3D = ("NDHWC", "DHWIO", "NDHWC")


def _make_mask2d(mask_type: str, mask_n_channels: int, filter_size: int,
                 input_dim: int, output_dim: int) -> np.ndarray:
    """Causal filter mask (``tflib/ops/conv2d.py:29-52``)."""
    mask = np.ones((filter_size, filter_size, input_dim, output_dim),
                   dtype=np.float32)
    center = filter_size // 2
    mask[center + 1:, :, :, :] = 0.0
    mask[center, center + 1:, :, :] = 0.0
    for i in range(mask_n_channels):
        for j in range(mask_n_channels):
            if (mask_type == "a" and i >= j) or (mask_type == "b" and i > j):
                mask[center, center, i::mask_n_channels,
                     j::mask_n_channels] = 0.0
    return mask


def _make_mask1d(mask_type: str, mask_n_channels: int, filter_size: int,
                 input_dim: int, output_dim: int) -> np.ndarray:
    """``tflib/ops/conv1d.py:20-41``."""
    mask = np.ones((filter_size, input_dim, output_dim), dtype=np.float32)
    center = filter_size // 2
    mask[center + 1:, :, :] = 0.0
    for i in range(mask_n_channels):
        for j in range(mask_n_channels):
            if (mask_type == "a" and i >= j) or (mask_type == "b" and i > j):
                mask[center, i::mask_n_channels, j::mask_n_channels] = 0.0
    return mask


def _mxu_conv(x, w, window_strides, padding, dimension_numbers,
              lhs_dilation=None):
    # NOTE on dtype policy: params are f32 and get cast to the activation
    # dtype here.  We deliberately do NOT pass preferred_element_type=f32 —
    # the TPU MXU already accumulates bf16 operands in f32 internally, and an
    # explicit output upcast makes the conv VJP mix f32 cotangents with bf16
    # kernels (a lax.conv dtype error).
    return lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=window_strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=dimension_numbers,
    )


def conv2d(name: str, input_dim: int, output_dim: int, filter_size: int,
           x: jax.Array, he_init: bool = True,
           mask_type: Optional[Tuple[str, int]] = None,
           stride: int = 1, weightnorm: bool = False, biases: bool = True,
           gain: float = 1.0, padding: str = "SAME",
           act: Optional[str] = None) -> jax.Array:
    """2-D conv over NHWC input; kernel HWIO. Mirrors ``tflib/ops/conv2d.py:20-123``.

    ``act`` fuses the block's activation into the conv epilogue: on direct
    TPU backends the whole conv+bias+act runs as the Pallas implicit-GEMM
    kernel (``ops.pallas.fused_conv``, SURVEY §2.9 row 1 — the reference
    applied LeakyReLU after every D/E conv, ``gan_inference_cifar10.py:
    215-229``); elsewhere XLA fuses the elementwise tail itself."""
    fan_in, fan_out = inits.conv_fans(input_dim, output_dim, filter_size,
                                      stride, mask_type is not None)
    stdev = inits.he_or_glorot_stdev(fan_in, fan_out, he_init)
    shape = (filter_size, filter_size, input_dim, output_dim)
    w = param(name + ".Filters", inits.scaled_uniform(stdev, shape, gain))

    if weightnorm:
        def g_init(key):
            from graphical_gan_tpu.core.registry import get_param_value
            w0 = get_param_value(name + ".Filters")
            return jnp.sqrt(jnp.sum(jnp.square(w0), axis=(0, 1, 2)))

        g = param(name + ".g", g_init)
        norms = jnp.sqrt(jnp.sum(jnp.square(w), axis=(0, 1, 2)))
        w = w * (g / norms)

    if mask_type is not None:
        mtype, mchan = mask_type
        mask = _make_mask2d(mtype, mchan, filter_size, input_dim, output_dim)
        w = w * jnp.asarray(mask)

    # serving-side int8 context (ops/quant.py); None outside it / in calib
    from graphical_gan_tpu.ops import quant
    out = quant.intercept_conv2d(name, x, w, stride, padding)

    # The Pallas implicit-GEMM conv measured 0.92-0.99x XLA's conv on a v5e
    # (XLA already fuses the bias+act epilogue into its conv) — so unlike
    # the fused-BN kernel it is opt-in, not auto-enabled.  See
    # ops/pallas/fused_conv.py for the measurement.
    from graphical_gan_tpu.ops.pallas import use_pallas_conv
    if out is None and biases and use_pallas_conv():
        from graphical_gan_tpu.ops.pallas import fused_conv2d_bias_act
        b = param(name + ".Biases", inits.zeros((output_dim,)))
        return fused_conv2d_bias_act(x, w, b, stride, padding, act)

    if out is None:
        out = _mxu_conv(x, w, (stride, stride), padding, _DN2D)

    if biases:
        b = param(name + ".Biases", inits.zeros((output_dim,)))
        out = out + b.astype(out.dtype)
    from graphical_gan_tpu.ops.activations import activation
    return activation(act)(out)


def deconv2d(name: str, input_dim: int, output_dim: int, filter_size: int,
             x: jax.Array, he_init: bool = True, weightnorm: bool = False,
             biases: bool = True, gain: float = 1.0, stride: int = 2,
             padding: str = "SAME") -> jax.Array:
    """Transpose conv, NHWC in/out — out spatial = stride * in for SAME.

    Mirrors ``tflib/ops/deconv2d.py:20-119`` including the kernel layout
    (H, W, output_dim, input_dim) and the fan swap.  Implementation is the
    gradient-of-conv (``lax.conv_transpose(transpose_kernel=True)``), which is
    exactly ``tf.nn.conv2d_transpose``'s definition — but without the
    reference's NCHW<->NHWC round trip.
    """
    fan_in, fan_out = inits.deconv_fans(input_dim, output_dim, filter_size,
                                        stride)
    stdev = inits.he_or_glorot_stdev(fan_in, fan_out, he_init)
    # TF transpose-conv kernel layout: (H, W, out_channels, in_channels)
    shape = (filter_size, filter_size, output_dim, input_dim)
    w = param(name + ".Filters", inits.scaled_uniform(stdev, shape, gain))

    if weightnorm:
        def g_init(key):
            from graphical_gan_tpu.core.registry import get_param_value
            w0 = get_param_value(name + ".Filters")
            return jnp.sqrt(jnp.sum(jnp.square(w0), axis=(0, 1, 3)))

        g = param(name + ".g", g_init)
        norms = jnp.sqrt(jnp.sum(jnp.square(w), axis=(0, 1, 3)))
        w = w * (g / norms)[None, None, :, None]

    # serving-side int8 context (ops/quant.py); None outside it / in calib
    from graphical_gan_tpu.ops import quant
    qout = quant.intercept_deconv2d(name, x, w, stride, padding)

    from graphical_gan_tpu.ops.phase_deconv import (use_phase_deconv,
                                                    conv_transpose_phase)
    if qout is not None:
        out = qout
    elif stride == 2 and padding == "SAME" and use_phase_deconv():
        # Exact rewrite: one stride-1 conv over the 2x2 output-phase
        # sub-kernels + depth-to-space, avoiding the input-dilated lowering
        # (3/4 structural-zero MACs).  See ops/phase_deconv.py.
        out = conv_transpose_phase(x, w.astype(x.dtype))
    else:
        out = lax.conv_transpose(
            x, w.astype(x.dtype), strides=(stride, stride), padding=padding,
            dimension_numbers=_DN2D, transpose_kernel=True,
        )

    if biases:
        b = param(name + ".Biases", inits.zeros((output_dim,)))
        out = out + b.astype(out.dtype)
    return out


def conv1d(name: str, input_dim: int, output_dim: int, filter_size: int,
           x: jax.Array, he_init: bool = True,
           mask_type: Optional[Tuple[str, int]] = None, stride: int = 1,
           weightnorm: bool = False, biases: bool = True,
           gain: float = 1.0) -> jax.Array:
    """1-D conv over NWC input; kernel WIO. Mirrors ``tflib/ops/conv1d.py:11-108``."""
    fan_in, fan_out = inits.conv1d_fans(input_dim, output_dim, filter_size,
                                        stride, mask_type is not None)
    stdev = inits.he_or_glorot_stdev(fan_in, fan_out, he_init)
    shape = (filter_size, input_dim, output_dim)
    w = param(name + ".Filters", inits.scaled_uniform(stdev, shape, gain))

    if weightnorm:
        def g_init(key):
            from graphical_gan_tpu.core.registry import get_param_value
            w0 = get_param_value(name + ".Filters")
            return jnp.sqrt(jnp.sum(jnp.square(w0), axis=(0, 1)))

        g = param(name + ".g", g_init)
        norms = jnp.sqrt(jnp.sum(jnp.square(w), axis=(0, 1)))
        w = w * (g / norms)

    if mask_type is not None:
        mtype, mchan = mask_type
        mask = _make_mask1d(mtype, mchan, filter_size, input_dim, output_dim)
        w = w * jnp.asarray(mask)

    out = _mxu_conv(x, w, (stride,), "SAME", _DN1D)

    if biases:
        b = param(name + ".Biases", inits.zeros((output_dim,)))
        out = out + b.astype(out.dtype)
    return out


def conv3d(name: str, filter_len: int, input_dim: int, output_dim: int,
           filter_size: int, x: jax.Array, he_init: bool = True,
           stride: int = 1, stride_len: int = 1,
           biases: bool = True) -> jax.Array:
    """3-D conv over NDHWC input; kernel DHWIO. Mirrors ``tflib/ops/conv3d.py:6-51``."""
    fan_in, fan_out = inits.conv3d_fans(input_dim, output_dim, filter_size,
                                        filter_len, stride, stride_len)
    stdev = inits.he_or_glorot_stdev(fan_in, fan_out, he_init)
    shape = (filter_len, filter_size, filter_size, input_dim, output_dim)
    w = param(name + ".Filters", inits.scaled_uniform(stdev, shape))

    out = _mxu_conv(x, w, (stride_len, stride, stride), "SAME", _DN3D)

    if biases:
        b = param(name + ".Biases", inits.zeros((output_dim,)))
        out = out + b.astype(out.dtype)
    return out
