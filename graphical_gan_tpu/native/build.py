"""Lazy g++ build + ctypes loader for the native components."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_CACHE = {}

CXX = os.environ.get("CXX", "g++")
CXXFLAGS = ["-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            "-pthread"]


def _source_hash(src_path: str) -> str:
    with open(src_path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def load_library(name: str) -> Optional[ctypes.CDLL]:
    """Compile ``native/<name>.cc`` to a cached .so and dlopen it.

    Returns None when no toolchain is available (callers fall back to
    numpy).
    """
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = os.path.join(_DIR, name + ".cc")
        if not os.path.isfile(src):
            _CACHE[name] = None
            return None
        build_dir = os.path.join(_DIR, "_build")
        os.makedirs(build_dir, exist_ok=True)
        so = os.path.join(build_dir,
                          f"lib{name}_{_source_hash(src)}.so")
        if not os.path.isfile(so):
            try:
                subprocess.run([CXX, *CXXFLAGS, src, "-o", so + ".tmp"],
                               check=True, capture_output=True)
                os.replace(so + ".tmp", so)
            except Exception:
                _CACHE[name] = None
                return None
        try:
            _CACHE[name] = ctypes.CDLL(so)
        except OSError:
            _CACHE[name] = None
        return _CACHE[name]


def native_available(name: str) -> bool:
    return load_library(name) is not None
