"""ctypes bindings for the native data-loader library (wavio.cc).

Builds lazily on first use if g++ is available (no pybind11 in the image —
the binding layer is plain ctypes per the environment constraints); all
callers fall back to the pure-python implementations when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "libse_tpu_runtime.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.isfile(path):
        src = os.path.join(os.path.dirname(__file__), "wavio.cc")
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", path, src],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.wav_decode.restype = ctypes.c_int64
    lib.wav_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.rms_gain.restype = ctypes.c_float
    lib.rms_gain.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.resample_poly.restype = ctypes.c_int64
    lib.resample_poly.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def wav_decode_native(path: str) -> tuple[np.ndarray, int] | None:
    """Decode a wav via the C++ library; None if unavailable/unsupported."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    cap = max(len(data) // 2, 16)
    out = np.empty(cap, np.float32)
    sr = ctypes.c_int32(0)
    n = lib.wav_decode(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        ctypes.byref(sr),
    )
    if n < 0:
        return None
    return out[:n].copy(), int(sr.value)


def rms_gain_native(x: np.ndarray) -> float | None:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    return float(lib.rms_gain(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x)))


def resample_poly_native(x: np.ndarray, up: int, down: int) -> np.ndarray | None:
    """Kaiser-windowed polyphase resampling in C++ (scipy.resample_poly
    semantics); None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    n = len(x)
    n_out = -(-n * up // down)
    out = np.empty(max(n_out, 1), np.float32)
    got = lib.resample_poly(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        up, down,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(out))
    if got < 0:
        return None
    return out[:got]
