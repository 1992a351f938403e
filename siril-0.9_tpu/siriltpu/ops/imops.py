"""Pixel arithmetic and geometric transforms on Frames.

Reference: src/core/siril.c:65-1862 — soper (:112), imoper (:150),
fdiv (:252), ndiv (:278), addmax/addmin (:229), crop, mirrorx/y,
fits_rotate_pi (:770), entropy (:596), loglut (:636), contrast (:618),
ddp (:1792), visu (:665), fill (:696), sub_background (:192), and
cvUnsharpFilter / cvResizeGaussian / cvRotateImage glue
(src/opencv/opencv.cpp:80-205).

Semantics frozen:
- soper: double arithmetic + round_to_WORD;
- imoper: C INTEGER arithmetic between WORD operands (division is
  integer division!) then round_to_WORD (siril.c:150-190);
- fdiv: zero divisor pixels are set to 1 IN THE DIVISOR (mutation,
  siril.c:256-258), result coef*a/b in double, overflow flag;
- sub_background works in [0,1] doubles and re-offsets by |min|
  (siril.c:192-240).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from siriltpu.core.frame import Frame
from siriltpu.utils.rounding import np_round_to_word

OPER_ADD = "add"
OPER_SUB = "sub"
OPER_MUL = "mul"
OPER_DIV = "div"


def soper(data: np.ndarray, scalar: float, oper: str) -> np.ndarray:
    """a = round_to_WORD(a (op) scalar) in double (siril.c:112-146)."""
    x = data.astype(np.float64)
    if oper == OPER_ADD:
        r = x + scalar
    elif oper == OPER_SUB:
        r = x - scalar
    elif oper == OPER_MUL:
        r = x * scalar
    elif oper == OPER_DIV:
        r = x / scalar
    else:
        raise ValueError(oper)
    return np_round_to_word(r)


def imoper(a: np.ndarray, b: np.ndarray, oper: str) -> np.ndarray:
    """a = round_to_WORD(a (op) b) with C INT arithmetic (siril.c:150-190);
    note DIV is integer division in the reference."""
    if a.shape != b.shape:
        raise ValueError(f"imoper: images don't have the same size "
                         f"{a.shape} vs {b.shape}")
    ai = a.astype(np.int64)
    bi = b.astype(np.int64)
    if oper == OPER_ADD:
        r = ai + bi
    elif oper == OPER_SUB:
        r = ai - bi
    elif oper == OPER_MUL:
        r = ai * bi
    elif oper == OPER_DIV:
        r = np.where(bi == 0, 0, ai // np.maximum(bi, 1))  # C int division
    else:
        raise ValueError(oper)
    return np.clip(r, 0, 65535).astype(np.uint16)


def fdiv(a: np.ndarray, b: np.ndarray, coef: float) -> Tuple[np.ndarray, int]:
    """a = round_to_WORD(coef * a / b); divisor zeros become 1
    (siril.c:252-276). Returns (result, overflow_flag)."""
    if a.shape != b.shape:
        raise ValueError("fdiv: wrong size or channel count")
    bb = np.where(b == 0, 1, b).astype(np.float64)
    temp = coef * (a.astype(np.float64) / bb)
    overflow = int((temp > 65535.0).any())
    return np_round_to_word(temp), overflow


def ndiv(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Normalized division keeping each layer's original max (siril.c:278)."""
    out = np.empty_like(a)
    for c in range(a.shape[0]):
        div = np.where(b[c] == 0, a[c].astype(np.float64),
                       a[c].astype(np.float64) / b[c].astype(np.float64))
        mx = div.max()
        norm = mx / max(float(a[c].max()), 1.0)
        out[c] = np_round_to_word(div / norm if norm != 0 else div)
    return out


def addmax(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-pixel max (siril.c:229-250)."""
    return np.maximum(a, b)


def crop(data: np.ndarray, x: int, y: int, w: int, h: int) -> np.ndarray:
    """Crop with a TOP-DOWN selection on bottom-up data."""
    ry = data.shape[-2]
    y0 = ry - y - h
    return np.ascontiguousarray(data[..., y0 : y0 + h, x : x + w])


def mirrorx(data: np.ndarray) -> np.ndarray:
    """Vertical flip (mirror along x axis)."""
    return np.ascontiguousarray(data[..., ::-1, :])


def mirrory(data: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(data[..., :, ::-1])


def rotate_pi(data: np.ndarray) -> np.ndarray:
    """180-degree rotation (fits_rotate_pi, siril.c:770-811)."""
    return np.ascontiguousarray(data[..., ::-1, ::-1])


def entropy(layer: np.ndarray) -> float:
    """Shannon entropy of the normalized histogram (siril.c:596-616)."""
    counts = np.bincount(layer.reshape(-1), minlength=65536).astype(np.float64)
    p = counts / counts.sum()
    nz = p > 0
    return float(-(p[nz] * np.log(p[nz])).sum())


def loglut(data: np.ndarray, inverted: bool = False) -> np.ndarray:
    """Logarithmic scale (siril.c:636-663): v -> log(v) scaled to range."""
    x = data.astype(np.float64)
    norm = 65535.0
    with np.errstate(divide="ignore"):
        l = np.where(x > 0, np.log(x), 0.0)
    lmax = np.log(norm)
    out = l / lmax * norm
    if inverted:
        out = norm - out
    return np_round_to_word(out)


def ddp(data: np.ndarray, level: float, coef: float, sigma: float) -> np.ndarray:
    """Digital development processing (siril.c ddp command path):
    out = coef * a / (blur(a) + level), unsharp-like tone mapping."""
    from siriltpu.ops.interp import sep_filter

    out = np.empty_like(data)
    for c in range(data.shape[0]):
        x = data[c].astype(np.float32)
        if sigma > 0:
            k = _gauss_kernel(sigma)
            blurred = np.asarray(sep_filter(jnp.asarray(x), jnp.asarray(k),
                                            jnp.asarray(k)))
        else:
            blurred = x
        out[c] = np_round_to_word(coef * x.astype(np.float64) /
                                  (blurred.astype(np.float64) + level))
    return out


def _gauss_kernel(sigma: float) -> np.ndarray:
    r = max(1, int(3 * sigma))
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def unsharp(data: np.ndarray, sigma: float, amount: float) -> np.ndarray:
    """cvUnsharpFilter (opencv.cpp:311-335): out = a*(1+amount) -
    blur*amount; amount 0 -> pure Gaussian blur."""
    from siriltpu.ops.interp import sep_filter

    out = np.empty_like(data)
    k = _gauss_kernel(sigma)
    for c in range(data.shape[0]):
        x = data[c].astype(np.float32)
        blurred = np.asarray(sep_filter(jnp.asarray(x), jnp.asarray(k),
                                        jnp.asarray(k))).astype(np.float64)
        if amount == 0.0:
            r = blurred
        else:
            r = x.astype(np.float64) * (1.0 + amount) - blurred * amount
        out[c] = np_round_to_word(r)
    return out


def resize(data: np.ndarray, new_w: int, new_h: int,
           interpolation: int = 1) -> np.ndarray:
    """cvResizeGaussian (opencv.cpp:80-130): cv::resize with the chosen
    interpolation. Implemented via the warp sampler (scale transform)."""
    from siriltpu.ops.warp import warp_perspective

    c, h, w = data.shape
    sx = w / new_w
    sy = h / new_h
    # OpenCV resize samples at (x + 0.5) * scale - 0.5
    Hinv = np.array([[sx, 0, 0.5 * sx - 0.5],
                     [0, sy, 0.5 * sy - 0.5],
                     [0, 0, 1.0]], dtype=np.float64)
    out = np.empty((c, new_h, new_w), dtype=np.uint16)
    for ch in range(c):
        r = warp_perspective(jnp.asarray(data[ch]).astype(jnp.float32),
                             jnp.asarray(Hinv, jnp.float32),
                             (new_h, new_w), interpolation)
        out[ch] = np.clip(np.rint(np.asarray(r)), 0, 65535).astype(np.uint16)
    return out


def rotate(data: np.ndarray, angle_deg: float, *, crop_to_fit: bool = True,
           interpolation: int = 1) -> np.ndarray:
    """cvRotateImage (opencv.cpp:132-205): rotation about the image
    center; when not cropping the output grows to the bounding box."""
    from siriltpu.ops.warp import warp_perspective

    c, h, w = data.shape
    a = np.radians(angle_deg)
    ca, sa = np.cos(a), np.sin(a)
    if crop_to_fit:
        oh, ow = h, w
    else:
        ow = int(np.ceil(abs(w * ca) + abs(h * sa)))
        oh = int(np.ceil(abs(w * sa) + abs(h * ca)))
    cx_in, cy_in = (w - 1) / 2.0, (h - 1) / 2.0
    cx_out, cy_out = (ow - 1) / 2.0, (oh - 1) / 2.0
    # inverse map: src = R^-1 (dst - c_out) + c_in
    Hinv = np.array([[ca, sa, cx_in - ca * cx_out - sa * cy_out],
                     [-sa, ca, cy_in + sa * cx_out - ca * cy_out],
                     [0, 0, 1.0]])
    out = np.empty((c, oh, ow), dtype=np.uint16)
    for ch in range(c):
        r = warp_perspective(jnp.asarray(data[ch]).astype(jnp.float32),
                             jnp.asarray(Hinv, jnp.float32), (oh, ow),
                             interpolation)
        out[ch] = np.clip(np.rint(np.asarray(r)), 0, 65535).astype(np.uint16)
    return out


def sub_background_layer(image: np.ndarray, background: np.ndarray
                         ) -> np.ndarray:
    """sub_background (siril.c:192-240): subtract in [0,1] doubles, then
    add |min| so the result is non-negative."""
    a = image.astype(np.float64) / 65535.0
    b = background.astype(np.float64) / 65535.0
    d = a - b
    d += abs(d.min())
    return np_round_to_word(d * 65535.0)


__all__ = ["soper", "imoper", "fdiv", "ndiv", "addmax", "crop", "mirrorx",
           "mirrory", "rotate_pi", "entropy", "loglut", "ddp", "unsharp",
           "resize", "rotate", "sub_background_layer",
           "OPER_ADD", "OPER_SUB", "OPER_MUL", "OPER_DIV"]
