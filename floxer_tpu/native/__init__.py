"""Native (C++) components, loaded via ctypes with graceful fallbacks.

The shared library is compiled on demand with g++ (cached next to the
source); environments without a toolchain silently fall back to the pure
numpy implementations.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger("floxer-tpu")

_NATIVE_DIR = Path(__file__).parent
_LIB_PATH = _NATIVE_DIR / "libfloxer_native.so"
_SOURCES = [_NATIVE_DIR / "sais.cpp"]

_lib = None
_load_attempted = False


def _build_library() -> bool:
    try:
        newest_source = max(s.stat().st_mtime for s in _SOURCES)
        if _LIB_PATH.exists() and _LIB_PATH.stat().st_mtime >= newest_source:
            return True
        command = [
            "g++", "-O3", "-march=native", "-std=c++17",
            "-shared", "-fPIC",
            *[str(s) for s in _SOURCES],
            "-o", str(_LIB_PATH),
        ]
        result = subprocess.run(command, capture_output=True, text=True)
        if result.returncode != 0:
            logger.debug("native build failed: %s", result.stderr)
            return False
        return True
    except Exception as error:  # noqa: BLE001
        logger.debug("native build unavailable: %s", error)
        return False


def get_library():
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if os.environ.get("FLOXER_TPU_NO_NATIVE"):
        return None
    if not _build_library():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.floxer_build_suffix_array.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.floxer_build_suffix_array.restype = ctypes.c_int
        _lib = lib
    except OSError as error:
        logger.debug("native library load failed: %s", error)
        _lib = None
    return _lib


def native_suffix_array(text: np.ndarray) -> np.ndarray | None:
    """SA-IS suffix array via the native library; None if unavailable."""
    lib = get_library()
    if lib is None:
        return None
    text = np.ascontiguousarray(text, dtype=np.uint8)
    n = text.shape[0]
    sa = np.empty(n, dtype=np.int64)
    status = lib.floxer_build_suffix_array(
        text.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if status != 0:
        return None
    return sa
