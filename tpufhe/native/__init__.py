"""Native (C++) host-side sampling core, built on demand with g++.

The shared library is compiled from tpufhe_native.cpp into the package
directory the first time it is needed (and rebuilt when the source is
newer). Everything degrades gracefully to the pure-Python implementations
when no toolchain is available or TPUFHE_NO_NATIVE=1 is set.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "tpufhe_native.cpp")
_SO = os.path.join(_DIR, "_tpufhe_native.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO + ".tmp", _SRC],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def lib():
    """The loaded CDLL, or None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("TPUFHE_NO_NATIVE") == "1":
        return None
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        L = ctypes.CDLL(_SO)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        L.chacha_blocks.argtypes = [
            u32p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint32,
            ctypes.c_uint64, ctypes.c_char_p,
        ]
        L.chacha_uniform_u64.argtypes = [
            u32p, ctypes.c_uint64, ctypes.c_uint32, u64p, u32p,
            ctypes.c_uint64, ctypes.c_uint64, u64p,
        ]
        L.chacha_cbd.argtypes = [
            u32p, ctypes.c_uint64, ctypes.c_uint32, u64p, u32p,
            ctypes.c_uint32, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = L
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return lib() is not None
