"""Wavelet transform disk persistence.

Reference: src/algos/io_wave.c — the ``wavelet`` command writes each
channel's à-trous transform to ``[rgb]_rawdata.wave`` files in the tmp
dir which ``wrecons`` re-reads with per-plane weights
(src/core/command.c:443-530). Binary layout here: magic, geometry,
plane count, kind, float32 planes.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"STPUWAV1"


def wave_write(path: str, planes: np.ndarray, kind: int) -> None:
    """Persist an (nplanes, H, W) transform."""
    planes = np.asarray(planes, dtype=np.float32)
    n, h, w = planes.shape
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<iiii", n, h, w, kind))
        planes.tofile(f)


def wave_read(path: str):
    """Returns (planes (n, H, W) float32, kind)."""
    with open(path, "rb") as f:
        if f.read(8) != _MAGIC:
            raise ValueError(f"{path} is not a siriltpu wavelet file")
        n, h, w, kind = struct.unpack("<iiii", f.read(16))
        planes = np.fromfile(f, dtype=np.float32, count=n * h * w)
    if planes.size != n * h * w:
        raise ValueError(f"truncated wavelet file {path}")
    return planes.reshape(n, h, w), kind


__all__ = ["wave_write", "wave_read"]
