"""ctypes binding for the native HARM dump parser (native/harmio.cpp).

The shared library is built on demand with g++ the first time it is needed;
if the toolchain is unavailable the caller falls back to numpy parsing.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger("grmonty")

_lock = threading.Lock()
_lib = None
_tried = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "harmio.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libharmio.so")


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC, "-lpthread"],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.harmio_parse_doubles.restype = ctypes.c_int64
            lib.harmio_parse_doubles.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.c_int32,
            ]
            _lib = lib
        except Exception as exc:  # pragma: no cover - depends on toolchain
            log.debug("native harmio unavailable (%s); using numpy fallback", exc)
            _lib = None
        return _lib


def parse_doubles(text: str) -> np.ndarray | None:
    """Parse whitespace-separated doubles; None if the native lib is unusable."""
    lib = _load()
    if lib is None:
        return None
    raw = text.encode()
    cap = len(raw) // 2 + 16  # every token needs >=1 digit + 1 separator
    out = np.empty(cap, dtype=np.float64)
    n = lib.harmio_parse_doubles(
        raw, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cap, 0
    )
    if n < 0:
        return None
    return out[:n].copy()
