"""ctypes bindings for the native (C++) data-IO layer.

Builds native/amc_parser.cpp on first use with g++ -O2 (cached as a .so
next to the source; no pybind11 needed — plain C ABI + ctypes). Falls
back cleanly when no compiler is available; data/mocap.py keeps the pure-
Python parser as the reference implementation and tests assert parity.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_BUILD_ERR: str | None = None


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "native",
    )


def _build_and_load():
    global _LIB, _BUILD_ERR
    src = os.path.join(_native_dir(), "amc_parser.cpp")
    so = os.path.join(_native_dir(), "libamcparser.so")
    if not os.path.exists(so) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(so)
    ):
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", so, src],
                check=True,
                capture_output=True,
                text=True,
                timeout=300,
            )
        except Exception as e:  # no compiler / build failure
            _BUILD_ERR = f"native build failed: {e}"
            return None
    lib = ctypes.CDLL(so)
    lib.amc_parse.restype = ctypes.c_int
    lib.amc_parse.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long),
        ctypes.c_char_p,
        ctypes.c_long,
    ]
    lib.amc_free.restype = None
    lib.amc_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
    return lib


def available() -> bool:
    return _get_lib() is not None


def _get_lib():
    global _LIB
    with _LOCK:
        if _LIB is None and _BUILD_ERR is None:
            _LIB = _build_and_load()
    return _LIB


def parse_amc_native(path: str) -> np.ndarray:
    """Parse an AMC file via the C++ parser -> (N, D) float64 array."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError(_BUILD_ERR or "native parser unavailable")
    data = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    err = ctypes.create_string_buffer(512)
    rc = lib.amc_parse(
        path.encode(), ctypes.byref(data), ctypes.byref(rows),
        ctypes.byref(cols), err, len(err),
    )
    if rc != 0:
        raise ValueError(
            f"amc_parse({path!r}) failed rc={rc}: {err.value.decode()}"
        )
    try:
        n, d = rows.value, cols.value
        out = np.ctypeslib.as_array(data, shape=(n, d)).copy()
    finally:
        lib.amc_free(data)
    return out
