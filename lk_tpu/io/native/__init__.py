"""ctypes bindings for the native framestore (built lazily with g++).

Falls back to None when no toolchain is available; io.raw degrades to a
pure-NumPy reader in that case.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "framestore.cpp")
_SO = os.path.join(_DIR, "libframestore.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        if (
            os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
        ):
            return True
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", _SRC, "-o", _SO],
            check=True, capture_output=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.fs_open.restype = ctypes.c_void_p
    lib.fs_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.fs_width.argtypes = [ctypes.c_void_p]
    lib.fs_height.argtypes = [ctypes.c_void_p]
    lib.fs_channels.argtypes = [ctypes.c_void_p]
    lib.fs_nframes.argtypes = [ctypes.c_void_p]
    lib.fs_nframes.restype = ctypes.c_int64
    lib.fs_next_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int
    ]
    lib.fs_close.argtypes = [ctypes.c_void_p]
    lib.fs_write.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
    ]
    _lib = lib
    return _lib
