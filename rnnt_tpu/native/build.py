"""Build + load the native library (ctypes; no pip, no cmake).

Equivalent role to scripts/build_rnnt.sh (which cmake-built warp-transducer
and pip-installed its TF binding): compile the C++ sources into one shared
library, cached in _build/ and rebuilt when sources change.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_DIR, "_build")
_SOURCES = ["flac_decoder.cc", "rnnt_loss_cpu.cc"]
_LIB_BASENAME = "librnnt_native"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _source_digest() -> str:
    h = hashlib.sha256()
    for src in _SOURCES:
        with open(os.path.join(_DIR, src), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def build(force: bool = False) -> str:
    """Compile if needed; returns the .so path."""
    os.makedirs(_BUILD_DIR, exist_ok=True)
    lib_path = os.path.join(_BUILD_DIR, f"{_LIB_BASENAME}-{_source_digest()}.so")
    if os.path.exists(lib_path) and not force:
        return lib_path
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-std=c++17", *srcs, "-o", lib_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:
        raise RuntimeError(f"native build failed:\n{e.stderr}") from e
    return lib_path


def load_library() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(build())
            # flac_decode_file(path, &samples, &n, &sr, &ch, &bits) -> int
            lib.flac_decode_file.restype = ctypes.c_int
            lib.flac_decode_file.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.flac_free.restype = None
            lib.flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
            # rnnt_loss_cpu(logits, labels, f_lens, y_lens, B,T,U1,V, loss, grad)
            lib.rnnt_loss_cpu.restype = ctypes.c_int
            lib.rnnt_loss_cpu.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
    return _lib
