"""Pallas TPU kernel: implicit-GEMM conv2d with fused bias + activation.

The reference's hot op is ``tf.nn.conv2d`` + bias (+ LeakyReLU applied by
every discriminator/extractor block), ``tflib/ops/conv2d.py:106-123`` —
SURVEY §2.9 row 1 calls for a fused TPU epilogue kernel.

Formulation (implicit GEMM, no im2col materialization):

- the input is SAME/VALID-padded on the XLA side, then *phase-decomposed*
  by the stride: ``x[B,Hp,Wp,C] -> x6[B, s, s, OH2, OW2, C]`` where
  ``x6[b, hp, wp, i, j] = xpad[b, i*s+hp, j*s+wp]``.  A kernel tap (kh, kw)
  then addresses a CONTIGUOUS block ``x6[b, kh%s, kw%s, kh//s:kh//s+OH,
  kw//s:kw//s+OW]`` — strided spatial access becomes static slicing, which
  Pallas/Mosaic handles natively.
- grid = (Cout blocks, B): for each output-channel block the kernel
  accumulates the KH*KW taps as ``[OH*OW, Cin] @ [Cin, BN]`` MXU matmuls in
  f32, applies bias + activation in-register, and writes the output tile
  once — conv, bias and activation in a single pass over HBM.
- channels ride the 128-wide lane dim (NHWC); the weight block for a given
  Cout tile stays VMEM-resident across the whole batch (grid order puts B
  innermost).

Backward: custom VJP — activation/bias gradients fuse elementwise, then the
conv data/weight gradients reuse XLA's transposed-conv kernels via
``jax.vjp`` of an identically-padded ``lax.conv_general_dilated`` (the MXU
conv gradients XLA already emits are optimal; the fusion win is in the
forward epilogue).

Measured on one TPU v5e chip (relay-shared; 20 convs per program, distinct
inputs, best-of-5) against XLA's conv with the same fused epilogue, on the
cifar10 discriminator shapes (B=64, 5x5 stride-2):

  disc1 [64,32,32,3]->128:    0.93x (f32)  0.92x (bf16)
  disc2 [64,16,16,128]->256:  0.94x (f32)  0.98x (bf16)
  disc3 [64,8,8,256]->512:    0.93x (f32)  0.99x (bf16)

FINDING (SURVEY §2.9 row 1): XLA already fuses bias+activation into its conv
epilogue, and its conv kernels edge out this implicit GEMM by 1-8% — so this
kernel is OPT-IN (``GGAN_PALLAS_CONV=1``), like the fused-BN kernel (whose
early 1.23x result did not survive hard-fetch timing — see
``tools/bench_pallas.py``).  Correctness:
tests/test_pallas_conv.py (forward vs XLA at the model-family shapes incl.
bf16, VJP vs ``jax.grad`` of the XLA path, gate dispatch equivalence).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphical_gan_tpu.ops.activations import activation as _act_fn
from graphical_gan_tpu.ops.pallas.fused_norm import _act_grad, _interpret

_VMEM_BUDGET = 8 * 1024 * 1024  # soft cap for x-block + w-block bytes


def _same_pads(size: int, k: int, s: int) -> Tuple[int, int]:
    """TF/XLA SAME padding: out = ceil(size/s), extra pad goes low-side-half."""
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    lo = total // 2
    return lo, total - lo


def _out_size(size: int, k: int, s: int, padding: str) -> int:
    if padding == "SAME":
        return -(-size // s)
    return (size - k) // s + 1


def _cout_block(kh: int, kw: int, cin: int, cout: int, x_bytes: int,
                itemsize: int) -> int:
    """Largest divisor-of-Cout tile whose weight block fits the VMEM budget
    alongside one batch-item input block."""
    budget = max(_VMEM_BUDGET - x_bytes, 1 << 20)
    for bn in (512, 256, 128, 64, 32, 16, 8):
        if cout % bn == 0 and kh * kw * cin * bn * itemsize <= budget:
            return bn
    return cout if cout < 8 else 8


def _conv_kernel(x_ref, w_ref, b_ref, y_ref, *, KH, KW, s, OH, OW, act):
    """x_ref [1,s,s,OH2,OW2,C]; w_ref [KH,KW,C,BN]; b_ref [1,BN];
    y_ref [1,OH,OW,BN]."""
    acc = jnp.zeros((OH * OW, y_ref.shape[-1]), jnp.float32)
    for kh in range(KH):
        for kw in range(KW):
            xs = x_ref[0, kh % s, kw % s,
                       pl.ds(kh // s, OH), pl.ds(kw // s, OW), :]
            xs = xs.reshape(OH * OW, xs.shape[-1])
            acc += jnp.dot(xs, w_ref[kh, kw],
                           preferred_element_type=jnp.float32)
    y = acc + b_ref[0, :].astype(jnp.float32)
    y = _act_fn(act)(y)
    y_ref[0] = y.reshape(OH, OW, -1).astype(y_ref.dtype)


def _phase_decompose(x: jax.Array, kh: int, kw: int, s: int, padding: str
                     ) -> Tuple[jax.Array, int, int]:
    """Pad for the conv + pad up to the phase grid, reshape to
    [B, s, s, OH2, OW2, C]."""
    b, h, w, c = x.shape
    oh = _out_size(h, kh, s, padding)
    ow = _out_size(w, kw, s, padding)
    if padding == "SAME":
        ph, pw = _same_pads(h, kh, s), _same_pads(w, kw, s)
    else:
        ph, pw = (0, 0), (0, 0)
    # phase grid must cover index (OH-1 + (K-1)//s)*s + (K-1)%s
    oh2 = oh + (kh - 1) // s + 1
    ow2 = ow + (kw - 1) // s + 1
    x = jnp.pad(x, ((0, 0),
                    (ph[0], oh2 * s - h - ph[0]),
                    (pw[0], ow2 * s - w - pw[0]),
                    (0, 0)))
    x6 = x.reshape(b, oh2, s, ow2, s, c).transpose(0, 2, 4, 1, 3, 5)
    return x6, oh, ow


def _forward_pallas(x, w, bias, stride, padding, act):
    b, h, w_in, cin = x.shape
    kh, kw, _, cout = w.shape
    x6, oh, ow = _phase_decompose(x, kh, kw, stride, padding)
    _, s, _, oh2, ow2, _ = x6.shape
    x_bytes = s * s * oh2 * ow2 * cin * x.dtype.itemsize
    bn = _cout_block(kh, kw, cin, cout, x_bytes, w.dtype.itemsize)

    y = pl.pallas_call(
        functools.partial(_conv_kernel, KH=kh, KW=kw, s=stride,
                          OH=oh, OW=ow, act=act),
        grid=(cout // bn, b),
        in_specs=[
            pl.BlockSpec((1, s, s, oh2, ow2, cin),
                         lambda j, i: (i, 0, 0, 0, 0, 0)),
            pl.BlockSpec((kh, kw, cin, bn), lambda j, i: (0, 0, 0, j)),
            pl.BlockSpec((1, bn), lambda j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, oh, ow, bn), lambda j, i: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, cout), x.dtype),
        interpret=_interpret(),
    )(x6, w.astype(x.dtype), bias.reshape(1, -1).astype(x.dtype))
    return y


def _xla_conv(x, w, stride, padding):
    # explicit pads identical to the Pallas forward, so the VJP transposes
    # the exact same convolution
    kh, kw = w.shape[:2]
    if padding == "SAME":
        pads = [_same_pads(x.shape[1], kh, stride),
                _same_pads(x.shape[2], kw, stride)]
    else:
        pads = [(0, 0), (0, 0)]
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=pads, dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_conv2d_bias_act(x: jax.Array, w: jax.Array, bias: jax.Array,
                          stride: int = 1, padding: str = "SAME",
                          act: Optional[str] = None) -> jax.Array:
    """act(conv2d(x, w, stride, padding) + bias) — one fused device pass.

    x: [B,H,W,Cin] (NHWC); w: [KH,KW,Cin,Cout] (HWIO); bias: [Cout].
    Matches ``act(ops.conv.conv2d(...))`` numerics (f32 accumulation).
    """
    return _forward_pallas(x, w, bias, stride, padding, act)


def _fwd(x, w, bias, stride, padding, act):
    y = _forward_pallas(x, w, bias, stride, padding, act)
    return y, (x, w, y)


def _bwd(stride, padding, act, residuals, g):
    x, w, y = residuals
    gz = (g.astype(jnp.float32) * _act_grad(act, y.astype(jnp.float32)))
    gz = gz.astype(x.dtype)
    dbias = jnp.sum(gz.astype(jnp.float32), axis=(0, 1, 2))
    _, vjp = jax.vjp(lambda xx, ww: _xla_conv(xx, ww, stride, padding), x, w)
    dx, dw = vjp(gz)
    return dx, dw.astype(w.dtype), dbias.astype(jnp.float32)


fused_conv2d_bias_act.defvjp(_fwd, _bwd)
