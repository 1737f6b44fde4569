"""Python wrapper for the native FLAC decoder."""

from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from rnnt_tpu.native.build import load_library


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    """Decode FLAC -> (mono float32 in [-1,1], sample_rate).

    Multi-channel audio is reduced to channel 0 (matching the WAV path /
    preprocessing.py:18-19).
    """
    lib = load_library()
    samples = ctypes.POINTER(ctypes.c_int32)()
    n = ctypes.c_int64()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    bits = ctypes.c_int()
    rc = lib.flac_decode_file(path.encode(), ctypes.byref(samples),
                              ctypes.byref(n), ctypes.byref(sr),
                              ctypes.byref(ch), ctypes.byref(bits))
    if rc != 0:
        raise ValueError(f"FLAC decode failed (code {rc}): {path}")
    try:
        total = n.value * ch.value
        arr = np.ctypeslib.as_array(samples, shape=(total,)).copy()
    finally:
        lib.flac_free(samples)
    if ch.value > 1:
        arr = arr.reshape(-1, ch.value)[:, 0]
    scale = float(1 << (bits.value - 1))
    return (arr.astype(np.float32) / scale), sr.value
