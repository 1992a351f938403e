"""Perspective / affine image warping with OpenCV-compatible
interpolation kernels — the geometric engine of global star alignment.

Reference: ``cvTransformImage`` (src/opencv/opencv.cpp:242-309) =
``warpPerspective(in, out, H, size, interpolation)`` applied to the
top-down-flipped image (registration.c:720-722 flips, warps, flips back
because the rotation center is at (0,0) in the star coordinate frame).

Semantics: dst(x, y) = src(H^{-1} · (x, y, 1)), constant-0 border.
Interpolations: nearest, linear (bilinear), cubic (Keys, A = -0.75),
lanczos4 (normalized sinc(d)·sinc(d/4), 8-tap — verified weight-exact
vs OpenCV 4.6, tests/goldens/c_cvgeom.bin); OpenCV's warpPerspective/
warpAffine remap INTER_AREA to linear. OpenCV quantizes warp sample
coordinates to 1/32 px (INTER_BITS); we compute in float32 (strictly
more accurate; the golden test emulates the quantization to prove the
kernels match bit-for-bit, see tests/test_cv_goldens.py).

TPU-native: the warp is a fused gather — coordinate grids + k×k weighted
taps, vmapped over channels/frames; no scalar loops.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# Interpolation values are API surface: the reference passes its
# config/GUI integer VERBATIM into cv::resize / warpAffine /
# warpPerspective (opencv.cpp:89,153,262), so at runtime the values
# mean what OpenCV's real InterpolationFlags enum says they mean:
#   0 nearest, 1 linear, 2 CUBIC, 3 AREA, 4 lanczos4.
# The reference's own enum NAMES (siril.h:257-264 "OPENCV_AREA = 2,
# OPENCV_CUBIC = 3") are swapped relative to OpenCV and therefore lie:
# a Siril 0.9 user selecting the GUI item wired to value 2 ("Area")
# actually gets bicubic, and value 3 ("Cubic") actually gets
# area-resample in resize / bilinear in warps. We reproduce the
# OBSERVABLE behavior (what the linked OpenCV executes), not the
# header's mislabels — see PARITY.md "interpolation enum" and the
# real-OpenCV golden suite (tests/goldens/c_cvgeom.bin).
INTER_NEAREST = 0   # cv::INTER_NEAREST
INTER_LINEAR = 1    # cv::INTER_LINEAR
INTER_CUBIC = 2     # cv::INTER_CUBIC   (siril.h mislabels 2 "OPENCV_AREA")
INTER_AREA = 3      # cv::INTER_AREA    (siril.h mislabels 3 "OPENCV_CUBIC")
INTER_LANCZOS4 = 4  # cv::INTER_LANCZOS4

_CUBIC_A = -0.75


def _cubic_weights(t: Array):
    """OpenCV interpolateCubic with A = -0.75; t in [0,1)."""
    A = _CUBIC_A
    w0 = ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A
    w1 = ((A + 2) * t - (A + 3)) * t * t + 1
    u = 1.0 - t
    w2 = ((A + 2) * u - (A + 3)) * u * u + 1
    w3 = 1.0 - w0 - w1 - w2
    return [w0, w1, w2, w3]


def _lanczos4_weights(t: Array):
    """Normalized Lanczos-4 windowed sinc, sinc(d)·sinc(d/4) over taps
    at distances d = t+3-i, i = 0..7 — OpenCV interpolateLanczos4's
    kernel, verified weight-exact against the real cv::resize /
    warpPerspective (c_cvgeom goldens; e.g. t=0.25 tap weights
    0.893389/-0.152304/... match to float precision)."""
    ws = []
    total = 0.0
    for i in range(8):
        d = t + (3 - i)
        x = jnp.where(jnp.abs(d) < 1e-7, 1e-7, d) * np.pi
        w = (jnp.sin(x) / x) * (jnp.sin(x * 0.25) / (x * 0.25))
        ws.append(w)
        total = total + w
    ws = [w / total for w in ws]
    # exact-integer coordinate: delta function on tap 3
    exact = t < 1e-7
    out = []
    for i, w in enumerate(ws):
        out.append(jnp.where(exact, 1.0 if i == 3 else 0.0, w))
    return out


def _tap(img: Array, yi: Array, xi: Array) -> Array:
    h, w = img.shape
    inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    yc = jnp.clip(yi, 0, h - 1)
    xc = jnp.clip(xi, 0, w - 1)
    # flat linear-index gather: measurably faster than a 2-D gather on TPU
    return jnp.where(inb, img.reshape(-1)[yc * w + xc], 0.0)


def _interp(img: Array, xs: Array, ys: Array, interpolation: int) -> Array:
    if interpolation == INTER_AREA:
        # cv::warpPerspective / warpAffine have no AREA path and fall
        # back to INTER_LINEAR (OpenCV remap semantics); same here so a
        # migrated cfg value 2 registers instead of crashing.
        interpolation = INTER_LINEAR
    if interpolation == INTER_NEAREST:
        xi = jnp.floor(xs + 0.5).astype(jnp.int32)
        yi = jnp.floor(ys + 0.5).astype(jnp.int32)
        return _tap(img, yi, xi)
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0).astype(img.dtype)
    fy = (ys - y0).astype(img.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    if interpolation == INTER_LINEAR:
        wx = [1.0 - fx, fx]
        wy = [1.0 - fy, fy]
        offs = (0, 1)
        base = 0
    elif interpolation == INTER_CUBIC:
        wx = _cubic_weights(fx)
        wy = _cubic_weights(fy)
        offs = (0, 1, 2, 3)
        base = -1
    elif interpolation == INTER_LANCZOS4:
        wx = _lanczos4_weights(fx)
        wy = _lanczos4_weights(fy)
        offs = tuple(range(8))
        base = -3
    else:
        raise ValueError(f"unknown interpolation {interpolation}")
    out = jnp.zeros_like(fx)
    for dy in offs:
        row = jnp.zeros_like(fx)
        for dx in offs:
            row = row + wx[dx] * _tap(img, y0i + base + dy, x0i + base + dx)
        out = out + wy[dy] * row
    return out


@functools.partial(jax.jit, static_argnames=("out_shape", "interpolation"))
def warp_perspective(img: Array, H_inv: Array,
                     out_shape: Tuple[int, int],
                     interpolation: int = INTER_LINEAR) -> Array:
    """dst(x,y) = img(H_inv @ (x,y,1)), constant-0 border, float in/out."""
    oh, ow = out_shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)
    w = H_inv[2, 0] * xx + H_inv[2, 1] * yy + H_inv[2, 2]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    xs = (H_inv[0, 0] * xx + H_inv[0, 1] * yy + H_inv[0, 2]) / w
    ys = (H_inv[1, 0] * xx + H_inv[1, 1] * yy + H_inv[1, 2]) / w
    return _interp(img.astype(jnp.float32), xs, ys, interpolation)


def warp_frame_bu(data_bu: np.ndarray, H_td: np.ndarray,
                  out_shape: Tuple[int, int],
                  interpolation: int = INTER_LINEAR) -> np.ndarray:
    """Warp a bottom-up (C, H, W) uint16 frame by a homography expressed
    in TOP-DOWN star coordinates (cvTransformImage + surrounding flips,
    registration.c:720-722). Returns uint16 (C, oh, ow) bottom-up."""
    c = data_bu.shape[0]
    Hinv = np.linalg.inv(np.asarray(H_td, dtype=np.float64))
    Hinv_j = jnp.asarray(Hinv, jnp.float32)
    out = np.empty((c,) + tuple(out_shape), dtype=np.uint16)
    for ch in range(c):
        td = jnp.asarray(np.ascontiguousarray(data_bu[ch][::-1]))
        warped = warp_perspective(td, Hinv_j, tuple(out_shape), interpolation)
        # OpenCV saturate_cast: round-to-nearest-even then clamp
        w = np.asarray(warped)
        out[ch] = np.clip(np.rint(w), 0, 65535).astype(np.uint16)[::-1]
    return out


@functools.partial(jax.jit, static_argnames=("out_shape", "interpolation"))
def _warp_layer_dev(layer_bu, Hinv, out_shape, interpolation):
    td = layer_bu[::-1]
    warped = warp_perspective(td, Hinv, out_shape, interpolation)
    word = jnp.clip(jnp.rint(warped), 0, 65535).astype(jnp.uint16)
    return word[::-1]


@functools.partial(jax.jit, static_argnames=("out_shape", "interpolation"))
def _warp_frame_dev(frame_bu, Hinv, out_shape, interpolation):
    def one(layer):
        return _warp_layer_dev(layer, Hinv, out_shape, interpolation)
    return jax.vmap(one)(frame_bu)


def warp_frame_dev(frame_dev_bu, H_td: np.ndarray,
                   out_shape: Tuple[int, int],
                   interpolation: int = INTER_LINEAR):
    """All-channel device warp: (C, H, W) uint16 in, (C, oh, ow) uint16
    out, one program instead of per-channel host round-trips."""
    Hinv = np.linalg.inv(np.asarray(H_td, dtype=np.float64))
    return _warp_frame_dev(frame_dev_bu, jnp.asarray(Hinv, jnp.float32),
                           tuple(out_shape), interpolation)


@functools.partial(jax.jit, static_argnames=("out_shape", "interpolation"))
def _warp_batch_dev(layers_bu, Hinvs, out_shape, interpolation):
    # lax.map (not vmap): every frame runs the identical single-frame
    # warp program, so sharding the frame axis is partition-invariant.
    def one(t):
        layer, Hinv = t
        return _warp_layer_dev(layer, Hinv, out_shape, interpolation)
    return jax.lax.map(one, (layers_bu, Hinvs))


@functools.lru_cache(maxsize=None)
def _warp_batch_fn(out_shape: Tuple[int, int], interpolation: int):
    """Stable partial for run_frames_sharded's compile cache."""
    return functools.partial(_warp_batch_dev, out_shape=out_shape,
                             interpolation=interpolation)


def warp_batch_dev(layers_bu, Hs_td: np.ndarray,
                   out_shape: Tuple[int, int],
                   interpolation: int = INTER_LINEAR, mesh=None):
    """Frame-batched device warp: (F, H, W) layers with per-frame 3x3
    homographies (F, 3, 3) -> (F, oh, ow) uint16, one device program.
    With ``mesh`` the frame axis shards over it (shard_map with the
    same per-frame body — no collectives, bit-identical to unsharded)."""
    Hinvs = np.linalg.inv(np.asarray(Hs_td, dtype=np.float64))
    fn = _warp_batch_fn(tuple(out_shape), interpolation)
    if mesh is not None:
        from siriltpu.parallel.mesh import run_frames_sharded
        return run_frames_sharded(fn, mesh, np.asarray(layers_bu),
                                  Hinvs.astype(np.float32))
    return fn(layers_bu, jnp.asarray(Hinvs, jnp.float32))


def warp_layer_dev(layer_dev_bu, H_td: np.ndarray,
                   out_shape: Tuple[int, int],
                   interpolation: int = INTER_LINEAR):
    """Device-resident single-layer variant of :func:`warp_frame_bu`:
    the flips, the OpenCV saturate_cast rounding and the uint16 store
    all stay on device, and the input is an already-uploaded layer —
    callers that just found stars on the same layer avoid a second
    host→device pass and read back HALF the bytes (uint16, not the f32
    intermediate). Returns a device (oh, ow) uint16 array."""
    Hinv = np.linalg.inv(np.asarray(H_td, dtype=np.float64))
    return _warp_layer_dev(layer_dev_bu, jnp.asarray(Hinv, jnp.float32),
                           tuple(out_shape), interpolation)


__all__ = ["warp_perspective", "warp_frame_bu", "warp_layer_dev",
           "warp_frame_dev", "warp_batch_dev", "INTER_NEAREST",
           "INTER_LINEAR", "INTER_AREA", "INTER_CUBIC", "INTER_LANCZOS4"]
