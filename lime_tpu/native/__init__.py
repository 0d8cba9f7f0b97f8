"""Native C++ runtime: fast index construction via ctypes.

Builds ``liblime_native.so`` from csrc/ on first use (g++ -O3) and exposes
:func:`build_index_native`.  Falls back gracefully when no compiler is
available — callers check :func:`available`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "csrc", "lime_native.cpp")
_LIB_DIR = os.path.join(os.path.dirname(os.path.dirname(_DIR)), "build",
                        "native")
_LIB = os.path.join(_LIB_DIR, "liblime_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                os.makedirs(_LIB_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", _SRC, "-o", _LIB],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB)
            lib.lime_build_index.restype = ctypes.c_int64
            lib.lime_build_index.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ]
            _lib = lib
        except Exception:
            _failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def build_index_native(seqs: Sequence[bytes]
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ebwt, lcp, da) for the merged collection — C++ SA-IS path."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    concat = np.frombuffer(b"".join(seqs), dtype=np.uint8)
    lens = np.array([len(s) for s in seqs], dtype=np.int64)
    total = int((lens + 1).sum())
    ebwt = np.empty(total, dtype=np.uint8)
    lcp = np.empty(total, dtype=np.uint32)
    da = np.empty(total, dtype=np.uint32)
    rc = lib.lime_build_index(
        concat.ctypes.data, lens.ctypes.data, len(seqs),
        ebwt.ctypes.data, lcp.ctypes.data, da.ctypes.data)
    if rc != 0:
        raise RuntimeError(f"lime_build_index failed: {rc}")
    return ebwt, lcp, da
