"""Image sampling primitives: bilinear/nearest gathers, OpenCV-style
separable filters — shared by ECC alignment and (later) homography warps.

OpenCV semantics reproduced where the reference relies on them:

- ``filter2D`` correlation with BORDER_REFLECT_101 (``gfe|abcdefg|edc``);
- ``GaussianBlur(ksize=5, sigma=0)`` uses OpenCV's fixed small-kernel
  table [1, 4, 6, 4, 1]/16 (getGaussianKernel small_gaussian_tab);
- ``warpAffine(..., WARP_INVERSE_MAP, INTER_LINEAR)`` with constant-0
  border: dst(x, y) = src(M @ (x, y, 1)), bilinear, 0 outside.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray

GAUSS5 = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _reflect101_pad(x: Array, r: int, axis: int) -> Array:
    """BORDER_REFLECT_101 padding by r along axis."""
    idx_lo = [slice(None)] * x.ndim
    idx_lo[axis] = slice(r, 0, -1)
    idx_hi = [slice(None)] * x.ndim
    idx_hi[axis] = slice(-2, -2 - r, -1)
    return jnp.concatenate([x[tuple(idx_lo)], x, x[tuple(idx_hi)]], axis=axis)


def sep_filter(img: Array, kx: Array, ky: Array) -> Array:
    """Separable correlation filter with reflect-101 borders (2D)."""
    rx = kx.shape[0] // 2
    ry = ky.shape[0] // 2
    out = img
    if ry:
        p = _reflect101_pad(out, ry, axis=0)
        out = sum(ky[i] * p[i : i + img.shape[0], :] for i in range(ky.shape[0]))
    else:
        out = ky[0] * out
    if rx:
        p = _reflect101_pad(out, rx, axis=1)
        out = sum(kx[i] * p[:, i : i + img.shape[1]] for i in range(kx.shape[0]))
    else:
        out = kx[0] * out
    return out


def gaussian_blur5(img: Array) -> Array:
    """OpenCV GaussianBlur(Size(5,5), 0): separable [1,4,6,4,1]/16."""
    return sep_filter(img, GAUSS5, GAUSS5)


def cv_gradient_x(img: Array) -> Array:
    """filter2D with Matx13f(-0.5, 0, 0.5): 0.5*(src[x+1] - src[x-1])."""
    k = jnp.array([-0.5, 0.0, 0.5])
    return sep_filter(img, k, jnp.array([1.0]))


def cv_gradient_y(img: Array) -> Array:
    k = jnp.array([-0.5, 0.0, 0.5])
    return sep_filter(img, jnp.array([1.0]), k)


def bilinear_sample(img: Array, xs: Array, ys: Array, fill: float = 0.0) -> Array:
    """Bilinear gather at float coords (x, y); out-of-bounds -> fill.

    Matches OpenCV INTER_LINEAR + BORDER_CONSTANT: any sample whose 2x2
    support touches outside pixels blends with the border value.
    """
    h, w = img.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        return jnp.where(inb, img[yc, xc], fill)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def nearest_sample(img: Array, xs: Array, ys: Array, fill: float = 0.0) -> Array:
    """INTER_NEAREST with constant border (OpenCV rounds half up via
    saturate_cast of x+0.5 floor... effectively round-to-nearest)."""
    h, w = img.shape
    xi = jnp.floor(xs + 0.5).astype(jnp.int32)
    yi = jnp.floor(ys + 0.5).astype(jnp.int32)
    inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    yc = jnp.clip(yi, 0, h - 1)
    xc = jnp.clip(xi, 0, w - 1)
    return jnp.where(inb, img[yc, xc], fill)


def translate_bilinear(img: Array, tx: Array, ty: Array, fill: float = 0.0) -> Array:
    """warpAffine inverse-map for pure translation:
    dst(x, y) = img(x + tx, y + ty), bilinear, constant border."""
    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return bilinear_sample(img, xx + tx, yy + ty, fill)


def translate_mask(shape, tx: Array, ty: Array) -> Array:
    """Nearest-warped all-ones mask for a translation (valid region)."""
    h, w = shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    xi = jnp.floor(xx + tx + 0.5)
    yi = jnp.floor(yy + ty + 0.5)
    return (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)


__all__ = ["gaussian_blur5", "cv_gradient_x", "cv_gradient_y",
           "bilinear_sample", "nearest_sample", "translate_bilinear",
           "translate_mask", "sep_filter"]
