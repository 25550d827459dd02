"""ctypes binding + lazy build of the native SA-IS extension.

pybind11 is unavailable in this environment; the extension is a plain C ABI
shared object compiled with g++ on first use and cached next to the source.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sais.cpp")
_SO = os.path.join(_HERE, "_sais.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
        check=True,
        capture_output=True,
    )


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.sais_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.sais_u8.restype = ctypes.c_int
        _lib = lib
        return lib


def suffix_array(codes: np.ndarray) -> np.ndarray:
    """Suffix array of T$ — same contract as suffix_array_doubling
    (int64 [n+1], entry 0 = the sentinel suffix)."""
    lib = _load()
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    n = len(codes)
    sa = np.empty(n + 1, dtype=np.int64)
    rc = lib.sais_u8(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise RuntimeError(f"sais_u8 failed with {rc}")
    return sa
