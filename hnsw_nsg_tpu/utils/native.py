"""ctypes bridge to the native IO runtime (native/xvecs_io.cpp).

Compiled lazily on first use with the baked-in g++ (no pybind11 in the
image — plain C ABI via ctypes). All readers in utils/io.py transparently
use this when available and fall back to numpy otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO = os.path.join(_NATIVE_DIR, "libxvecs_io.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        src = os.path.join(_NATIVE_DIR, "xvecs_io.cpp")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.xvecs_probe.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.xvecs_read.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int,
    ]
    lib.xvecs_write.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_int64, ctypes.c_int32,
    ]
    lib.bin_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.bin_read.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                             ctypes.c_int64]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def read_xvecs(path: str, dtype, elem_size: int,
               n_threads: int = 8) -> np.ndarray | None:
    """Native fast path; returns None if the library is unavailable or the
    file is malformed (caller falls back to numpy for the error message)."""
    lib = _load()
    if lib is None:
        return None
    n = ctypes.c_int64()
    dim = ctypes.c_int32()
    rc = lib.xvecs_probe(path.encode(), elem_size,
                         ctypes.byref(n), ctypes.byref(dim))
    if rc != 0:
        return None
    out = np.empty((n.value, dim.value), dtype=dtype)
    rc = lib.xvecs_read(
        path.encode(), elem_size,
        out.ctypes.data_as(ctypes.c_char_p), n.value, dim.value, n_threads,
    )
    if rc != 0:
        return None
    return out


def write_xvecs(path: str, arr: np.ndarray, elem_size: int) -> bool:
    lib = _load()
    if lib is None:
        return False
    arr = np.ascontiguousarray(arr)
    rc = lib.xvecs_write(
        path.encode(), elem_size,
        arr.ctypes.data_as(ctypes.c_char_p), arr.shape[0], arr.shape[1],
    )
    return rc == 0
