"""ctypes binding for the native moving-MNIST synthesizer."""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from graphical_gan_tpu.native.build import load_library

_FN = None


def _fn():
    global _FN
    if _FN is None:
        lib = load_library("moving_mnist")
        if lib is None:
            _FN = False
            return None
        f = lib.synthesize_moving_mnist
        f.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_float),
        ]
        f.restype = None
        _FN = f
    return _FN if _FN is not False else None


def synthesize_batch_native(digits: np.ndarray, seq_len: int,
                            seed: int) -> Optional[np.ndarray]:
    """digits: [B, 28, 28] float32 -> [B, seq_len, 64*64] float32, or None
    when the native library is unavailable."""
    f = _fn()
    if f is None:
        return None
    digits = np.ascontiguousarray(digits, dtype=np.float32)
    b = digits.shape[0]
    out = np.empty((b, seq_len, 64 * 64), dtype=np.float32)
    f(digits.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), b, seq_len,
      ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF),
      out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
