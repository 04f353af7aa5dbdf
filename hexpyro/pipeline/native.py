"""ctypes bindings for the native C++ trajectory I/O (csrc/libtrajio.so).

Auto-builds the shared library with `make` on first use if the compiler is
available; otherwise (or on any native failure) callers fall back to numpy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libtrajio.so")
_lib = None
_lib_tried = False


def _load():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(os.path.join(_CSRC, "Makefile")):
        try:
            subprocess.run(
                ["make", "-C", _CSRC], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.trajio_write.restype = ctypes.c_int
    lib.trajio_write.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_long,
        ctypes.c_long,
    ]
    lib.trajio_shape.restype = ctypes.c_int
    lib.trajio_shape.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.trajio_read.restype = ctypes.c_int
    lib.trajio_read.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_long,
        ctypes.c_long,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def write_matrix(path: str, data: np.ndarray) -> bool:
    """Write in numpy-savetxt '%.18e' layout; returns False if native failed."""
    lib = _load()
    if lib is None:
        return False
    arr = np.ascontiguousarray(data, np.float64)
    return lib.trajio_write(path.encode(), arr, arr.shape[0], arr.shape[1]) == 0


def read_matrix(path: str) -> np.ndarray | None:
    """Read a whitespace-numeric matrix; returns None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    if lib.trajio_shape(path.encode(), ctypes.byref(rows), ctypes.byref(cols)) != 0:
        return None
    out = np.empty((rows.value, cols.value), np.float64)
    if lib.trajio_read(path.encode(), out, rows.value, cols.value) != 0:
        return None
    return out
