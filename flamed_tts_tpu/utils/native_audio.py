"""ctypes bindings for the native WAV codec (native/wavio.cpp).

The shared object is built lazily on first use (``make -C native``); all
callers fall back to the scipy path in utils/audio.py when the build or
load fails, so the native layer is a pure acceleration.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwavio.so")

_lib = None
_load_failed = False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.isfile(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.wavio_decode.restype = ctypes.c_long
        lib.wavio_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.wavio_encode.restype = ctypes.c_long
        lib.wavio_encode.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_long,
        ]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def decode_wav(data: bytes) -> Optional[Tuple[np.ndarray, int]]:
    """WAV bytes -> (mono float32, sample_rate); None if unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    capacity = max(len(data) // 2, 16)
    out = np.empty(capacity, dtype=np.float32)
    sr = ctypes.c_int(0)
    n = lib.wavio_decode(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), capacity,
        ctypes.byref(sr),
    )
    if n < 0:
        return None
    return out[:n].copy(), int(sr.value)


def encode_wav(samples: np.ndarray, sample_rate: int) -> Optional[bytes]:
    """mono float32 -> 16-bit PCM WAV bytes; None if unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    samples = np.ascontiguousarray(samples, dtype=np.float32)
    capacity = 44 + 2 * samples.size
    out = ctypes.create_string_buffer(capacity)
    n = lib.wavio_encode(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        samples.size, sample_rate, out, capacity,
    )
    if n < 0:
        return None
    return out.raw[:n]
