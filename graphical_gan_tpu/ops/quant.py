"""Post-training int8 quantization for the serving path.

The v5e MXU executes int8xint8->int32 at 2x its bf16 FLOP rate (394 TOPS
vs 197 TFLOP/s), and int8 activations halve the HBM traffic of every
quantized layer.  This module lets the SERVING-side sampler (see
``serve/export.py`` / ``serve/quantize.py``) run its convolutions,
transpose convolutions, and matmuls on that path without touching model
code: the ops in ``ops/conv.py`` / ``ops/linear.py`` consult a
process-local quantization context right before their MXU contraction.

Scheme (standard static PTQ):

- weights: symmetric per-output-channel int8 (scale = absmax/127 over the
  non-output dims of the effective kernel, i.e. after weightnorm/masks);
- activations: symmetric per-tensor int8, scales calibrated by running
  the sampler EAGERLY on prior-distributed latents and recording each
  quantized layer's input absmax (``calibrating``);
- the contraction runs int8xint8 with ``preferred_element_type=int32``
  and dequantizes to the activation dtype; bias/BN/activations stay in
  float exactly as in the float path.

Training is untouched: with no active context (the default, and always
during ``Trainer`` runs) every intercept returns ``None`` and the float
path executes.  The reference has no deployment story at all, let alone a
quantized one (SURVEY §5); this is TPU-native serving machinery.

Exactness/quality evidence: ``tests/test_quantize.py`` pins integer-exact
agreement on representable inputs and end-to-end closeness on real
samplers; BASELINE.md records the v5e serving throughput A/B and the
hermetic FID delta of int8 vs bf16 samples from the same checkpoint.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_DN2D = ("NHWC", "HWIO", "NHWC")

_state = threading.local()


def _mode() -> Optional[str]:
    return getattr(_state, "mode", None)


@contextmanager
def calibrating(records: Dict[str, float]):
    """Record per-layer input absmax into ``records`` (eager runs only)."""
    if _mode() is not None:
        raise RuntimeError(f"quant context already active: {_mode()}")
    _state.mode, _state.records = "calib", records
    try:
        yield records
    finally:
        _state.mode = _state.records = None


@contextmanager
def quantized(scales: Dict[str, float]):
    """Run intercepted ops on the int8 path using calibrated ``scales``.

    Active during tracing is enough: the int8 ops are baked into the
    traced program, so wrapping a ``jax.jit``/``jax.export`` call
    quantizes the compiled artifact.
    """
    if _mode() is not None:
        raise RuntimeError(f"quant context already active: {_mode()}")
    _state.mode, _state.scales = "int8", dict(scales)
    try:
        yield
    finally:
        _state.mode = _state.scales = None


def _record(name: str, x) -> None:
    if isinstance(x, jax.core.Tracer):
        raise RuntimeError(
            "quant calibration must run eagerly (outside jit) so input "
            f"ranges can be read; layer {name!r} saw a tracer")
    records = _state.records
    absmax = float(jnp.max(jnp.abs(x)))
    records[name] = max(absmax, records.get(name, 0.0))


def _act_scale(name: str) -> float:
    try:
        s = _state.scales[name]
    except KeyError:
        raise KeyError(
            f"no calibrated activation scale for layer {name!r} — the "
            "calibration run did not cover this layer (model/config "
            "mismatch between calibrate and quantize?)")
    return max(float(s), 1e-12)


def _q8(x, scale):
    # quantize in f32 — bf16 inputs would otherwise round at ~8 mantissa
    # bits BEFORE the int rounding, compounding the quantization error
    x32 = x.astype(jnp.float32)
    return jnp.clip(jnp.round(x32 / scale), -127.0, 127.0).astype(jnp.int8)


def _w_scales(w, out_axis: int):
    """Symmetric per-output-channel weight scales (absmax/127)."""
    axes = tuple(i for i in range(w.ndim) if i != out_axis)
    s = jnp.max(jnp.abs(w), axis=axes) / 127.0
    return jnp.maximum(s, 1e-12)


def intercept_conv2d(name: str, x, w, stride: int, padding: str):
    """int8 path for ``ops.conv.conv2d`` (kernel HWIO, out axis 3).

    Returns the dequantized conv output, or ``None`` when the float path
    should run (no context, or calibration mode after recording).
    """
    mode = _mode()
    if mode is None:
        return None
    if mode == "calib":
        _record(name, x)
        return None
    s_x = _act_scale(name)
    s_w = _w_scales(w, out_axis=3)
    out = lax.conv_general_dilated(
        _q8(x, s_x), _q8(w, s_w), window_strides=(stride, stride),
        padding=padding, dimension_numbers=_DN2D,
        preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * (s_x * s_w)).astype(x.dtype)


def intercept_deconv2d(name: str, x, w, stride: int, padding: str):
    """int8 path for ``ops.conv.deconv2d`` (kernel HWOI, out axis 2)."""
    mode = _mode()
    if mode is None:
        return None
    if mode == "calib":
        _record(name, x)
        return None
    s_x = _act_scale(name)
    s_w = _w_scales(w, out_axis=2)
    # kernel layout HWOI: out axis 2, so broadcast the scale explicitly
    out = lax.conv_transpose(
        _q8(x, s_x), _q8(w, s_w[None, None, :, None]),
        strides=(stride, stride), padding=padding,
        dimension_numbers=_DN2D, transpose_kernel=True,
        preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * (s_x * s_w)).astype(x.dtype)


def intercept_linear(name: str, x2d, w):
    """int8 path for ``ops.linear.linear`` (2-D x, kernel IO, out axis 1)."""
    mode = _mode()
    if mode is None:
        return None
    if mode == "calib":
        _record(name, x2d)
        return None
    s_x = _act_scale(name)
    s_w = _w_scales(w, out_axis=1)
    out = lax.dot_general(_q8(x2d, s_x), _q8(w, s_w),
                          (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * (s_x * s_w)).astype(x2d.dtype)


def scales_from_records(records: Dict[str, float]) -> Dict[str, float]:
    """Convert calibration absmax records to activation scales."""
    return {k: max(v, 1e-12) / 127.0 for k, v in records.items()}


def save_scales(path: str, scales: Dict[str, float]) -> None:
    import json
    with open(path, "w") as f:
        json.dump({k: float(v) for k, v in scales.items()}, f, indent=1,
                  sort_keys=True)


def load_scales(path: str) -> Dict[str, float]:
    import json
    with open(path) as f:
        return {k: float(v) for k, v in json.load(f).items()}
