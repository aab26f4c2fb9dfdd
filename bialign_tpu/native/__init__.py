"""Native host DP engine: lazy ctypes build + load of bialign_core.cpp.

The shared library is built on first use (g++ -O3) into this directory;
``make -C bialign_tpu/native`` builds it ahead of time.  If no compiler
is available the caller falls back to the numpy oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bialign_core.cpp")
_SO = os.path.join(_DIR, "libbialign_core.so")

_lock = threading.Lock()
_lib = None
_tried = False


def build() -> str:
    """Compile the shared library (idempotent); returns its path."""
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(
        _SRC
    ):
        return _SO
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
        check=True,
        capture_output=True,
    )
    return _SO


def get_lib():
    """The loaded library, or None when unavailable (no compiler)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            path = build()
            lib = ctypes.CDLL(path)
        except Exception:
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        c_int = ctypes.c_int
        lib.bialign_affine_fill.argtypes = [
            i32p, i32p, c_int, c_int, c_int,
            i32p, i32p, i32p, i32p, i32p, c_int, c_int, i64p,
        ]
        lib.bialign_affine_fill.restype = None
        lib.bialign_nonaffine_fill.argtypes = [
            i32p, i32p, c_int, c_int, c_int,
            i32p, i32p, i32p, i32p, c_int, i64p,
        ]
        lib.bialign_nonaffine_fill.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None
