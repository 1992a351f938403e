"""Build + load the native C++ component library.

All sources under ``siril-0.9_tpu/native/*.cpp`` compile into one
``libsirilnative.so`` (g++, on demand, cached by mtime). Mirrors the
reference's C++ subsystems (src/io/avi_pipp, src/opencv — SURVEY §2.8):
the TPU compute path is JAX/Pallas, but runtime components that the
reference keeps native stay native here too (AVI writer, lossless-JPEG
DNG decoder).
"""

from __future__ import annotations

import ctypes
import glob
import os
import subprocess
from typing import Optional

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsirilnative.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def load_native() -> Optional[ctypes.CDLL]:
    """Return the shared native library, compiling it if stale.
    None when no compiler is available (callers fall back to Python)."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    sources = sorted(glob.glob(os.path.join(_NATIVE_DIR, "*.cpp")))
    try:
        stale = (not os.path.exists(_LIB_PATH) or any(
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(s)
            for s in sources))
        if stale:
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", *sources,
                            "-o", _LIB_PATH], check=True,
                           capture_output=True)
        _lib = ctypes.CDLL(_LIB_PATH)
    except (subprocess.CalledProcessError, OSError):
        _build_failed = True
    return _lib


__all__ = ["load_native"]
