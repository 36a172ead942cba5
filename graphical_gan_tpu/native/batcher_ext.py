"""ctypes binding for the native multithreaded row gather.

``take_rows`` is the public entry: it assembles ``a[idx]`` (first-axis
gather, any dtype / trailing shape) using the C++ threaded kernel for large
transfers and plain numpy otherwise — so every loader's batch assembly
(``data/common.epoch_batches``, reference ``tflib/mnist.py:49-64``) gets
the fast path without caring whether the toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from graphical_gan_tpu.native.build import load_library

_FN = None

# Below this many output bytes numpy's gather is already memcpy-bound and
# thread spawn costs more than it saves (measured crossover ~1 MiB).
NATIVE_MIN_BYTES = 1 << 20


def _fn():
    global _FN
    if _FN is None:
        lib = load_library("batcher")
        if lib is None:
            _FN = False
            return None
        f = lib.gather_rows
        f.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32,
        ]
        f.restype = None
        _FN = f
    return _FN if _FN is not False else None


def _n_threads() -> int:
    env = os.environ.get("GGAN_BATCHER_THREADS")
    if env:
        return max(1, int(env))
    return max(1, min(8, (os.cpu_count() or 1) - 1))


def gather_rows_native(a: np.ndarray, idx: np.ndarray,
                       out: Optional[np.ndarray] = None
                       ) -> Optional[np.ndarray]:
    """``a[idx]`` via the C++ kernel, or None when unavailable/unsuitable."""
    f = _fn()
    if f is None:
        return None
    if not (isinstance(a, np.ndarray) and a.flags.c_contiguous
            and a.ndim >= 1 and a.dtype != object):
        return None
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    if idx.ndim != 1:
        return None
    if idx.size:
        lo, hi = int(idx.min()), int(idx.max())
        if lo < -a.shape[0] or hi >= a.shape[0]:
            raise IndexError("gather_rows_native: index out of range")
        if lo < 0:
            # numpy's a[idx] wraps in-range negatives; match it so the
            # public take_rows semantics don't depend on which path runs.
            idx = np.where(idx < 0, idx + a.shape[0], idx)
            idx = np.ascontiguousarray(idx, dtype=np.int64)
    row_bytes = a.dtype.itemsize * int(np.prod(a.shape[1:], dtype=np.int64))
    out_shape = (idx.size,) + a.shape[1:]
    if out is None:
        out = np.empty(out_shape, dtype=a.dtype)
    elif (not isinstance(out, np.ndarray) or not out.flags.c_contiguous
          or out.dtype != a.dtype or out.shape != out_shape):
        raise ValueError(
            "gather_rows_native: out must be a C-contiguous ndarray of "
            f"dtype {a.dtype} and shape {out_shape}")
    f(a.ctypes.data_as(ctypes.c_void_p),
      idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
      out.ctypes.data_as(ctypes.c_void_p),
      ctypes.c_int64(idx.size), ctypes.c_int64(row_bytes),
      ctypes.c_int32(_n_threads()))
    return out


def take_rows(a: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """First-axis gather with automatic native/numpy dispatch.

    The native kernel only wins by parallelism: measured serially on a
    1-core host it is 0.4-0.7x numpy's tuned take (numpy's inner loop is
    faster than a per-row memcpy).  So it engages only when (a) there are
    >= 2 worker threads to use AND (b) the transfer is large enough to
    amortize thread spawn (NATIVE_MIN_BYTES); everything else stays numpy.
    """
    if isinstance(a, np.ndarray) and a.dtype != object:
        n_bytes = (len(idx) * a.dtype.itemsize
                   * int(np.prod(a.shape[1:], dtype=np.int64)))
        if (n_bytes >= NATIVE_MIN_BYTES and a.flags.c_contiguous
                and _n_threads() >= 2):
            out = gather_rows_native(a, idx)
            if out is not None:
                return out
    return a[idx]
