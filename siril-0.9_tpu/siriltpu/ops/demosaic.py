"""Bayer demosaicing.

Reference: src/algos/demosaicing.c — methods (enum src/core/siril.h:249-255):
super-pixel half-size (:32-80), bilinear (OpenCV scheme, :89-175),
nearest neighbor (:177-244), VNG (:284-421), AHD (:473-665).

Implemented vectorized (NumPy phase-slicing): super_pixel, bilinear,
nearest, and exact array-program ports of the dcraw VNG and AHD.

Conventions: input CFA is a top-down single layer as stored in SER
(callers flip afterwards, see siriltpu/io/ser.py); output is (3, H, W)
uint16 in the same row order. Bilinear/nearest leave the 1-pixel border
at 0 exactly like the reference (calloc'd output, interior-only loops).
"""

from __future__ import annotations

import numpy as np

from siriltpu.io.ser import (SER_BAYER_BGGR, SER_BAYER_GBRG, SER_BAYER_GRBG,
                             SER_BAYER_RGGB)
from siriltpu.utils.rounding import np_round_to_word

BAYER_PATTERNS = ("RGGB", "BGGR", "GBRG", "GRBG")


def pattern_from_ser(color_id: int) -> str:
    """retrieveSERBayerPattern (io/ser.c)."""
    return {SER_BAYER_RGGB: "RGGB", SER_BAYER_BGGR: "BGGR",
            SER_BAYER_GBRG: "GBRG", SER_BAYER_GRBG: "GRBG"}[color_id]


def _phase_offsets(pattern: str):
    """(dy, dx) of R, G1, G2, B cells within the 2x2 tile."""
    p = pattern.upper()
    pos = {p[0]: (0, 0), p[3]: (1, 1)}
    # two greens
    greens = [(0, 1), (1, 0)]
    out = {}
    out["R"] = {"RGGB": (0, 0), "BGGR": (1, 1), "GBRG": (1, 0),
                "GRBG": (0, 1)}[p]
    out["B"] = {"RGGB": (1, 1), "BGGR": (0, 0), "GBRG": (0, 1),
                "GRBG": (1, 0)}[p]
    out["G"] = [g for g in [(0, 0), (0, 1), (1, 0), (1, 1)]
                if g not in (out["R"], out["B"])]
    return out


def super_pixel(cfa: np.ndarray, pattern: str) -> np.ndarray:
    """Half-size super-pixel debayer (demosaicing.c:32-80): R and B taken
    directly, G = round((G1+G2)/2)."""
    h, w = cfa.shape
    # reference loops row < height-1, col < width-1 with step 2
    h2 = len(range(0, h - 1, 2))
    w2 = len(range(0, w - 1, 2))
    a = cfa[: 2 * h2, : 2 * w2].astype(np.float64)
    t00 = a[0::2, 0::2]
    t01 = a[0::2, 1::2]
    t10 = a[1::2, 0::2]
    t11 = a[1::2, 1::2]
    tiles = {(0, 0): t00, (0, 1): t01, (1, 0): t10, (1, 1): t11}
    off = _phase_offsets(pattern)
    r = tiles[off["R"]]
    b = tiles[off["B"]]
    g = np_round_to_word((tiles[off["G"][0]] + tiles[off["G"][1]]) / 2.0)
    out = np.stack([r.astype(np.uint16), g, b.astype(np.uint16)])
    return out


def bilinear(cfa: np.ndarray, pattern: str) -> np.ndarray:
    """Bilinear debayer (OpenCV scheme, demosaicing.c:89-175): missing
    colors averaged from 2/4 neighbors with (sum + n/2) >> log2(n)
    integer rounding; the 1-pixel border is left at 0."""
    h, w = cfa.shape
    a = cfa.astype(np.int64)
    out = np.zeros((3, h, w), dtype=np.uint16)
    off = _phase_offsets(pattern)

    # neighbor aggregates for interior pixels
    cross4 = np.zeros((h, w), dtype=np.int64)
    diag4 = np.zeros((h, w), dtype=np.int64)
    horiz2 = np.zeros((h, w), dtype=np.int64)
    vert2 = np.zeros((h, w), dtype=np.int64)
    cross4[1:-1, 1:-1] = (a[:-2, 1:-1] + a[2:, 1:-1] + a[1:-1, :-2] +
                          a[1:-1, 2:] + 2) >> 2
    diag4[1:-1, 1:-1] = (a[:-2, :-2] + a[:-2, 2:] + a[2:, :-2] +
                         a[2:, 2:] + 2) >> 2
    horiz2[1:-1, 1:-1] = (a[1:-1, :-2] + a[1:-1, 2:] + 1) >> 1
    vert2[1:-1, 1:-1] = (a[:-2, 1:-1] + a[2:, 1:-1] + 1) >> 1

    yy, xx = np.mgrid[0:h, 0:w]
    phase = ((yy & 1) * 2 + (xx & 1))

    def phase_of(dydx):
        return dydx[0] * 2 + dydx[1]

    at_r = phase == phase_of(off["R"])
    at_b = phase == phase_of(off["B"])
    g_phases = [phase_of(g) for g in off["G"]]
    at_g = (phase == g_phases[0]) | (phase == g_phases[1])
    # green rows containing R vs containing B
    r_row = off["R"][0]

    R = np.zeros((h, w), dtype=np.int64)
    G = np.zeros((h, w), dtype=np.int64)
    B = np.zeros((h, w), dtype=np.int64)
    # at R: R = value, G = cross4, B = diag4
    R[at_r] = a[at_r]
    G[at_r] = cross4[at_r]
    B[at_r] = diag4[at_r]
    # at B: B = value, G = cross4, R = diag4
    B[at_b] = a[at_b]
    G[at_b] = cross4[at_b]
    R[at_b] = diag4[at_b]
    # at G: G = value; the same-row color comes from horiz2, the other
    # from vert2
    G[at_g] = a[at_g]
    in_r_row = (yy & 1) == r_row
    g_in_r_row = at_g & in_r_row
    g_in_b_row = at_g & ~in_r_row
    R[g_in_r_row] = horiz2[g_in_r_row]
    B[g_in_r_row] = vert2[g_in_r_row]
    R[g_in_b_row] = vert2[g_in_b_row]
    B[g_in_b_row] = horiz2[g_in_b_row]

    interior = np.zeros((h, w), dtype=bool)
    interior[1:-1, 1:-1] = True
    out[0][interior] = np.clip(R[interior], 0, 65535)
    out[1][interior] = np.clip(G[interior], 0, 65535)
    out[2][interior] = np.clip(B[interior], 0, 65535)
    return out


def nearest(cfa: np.ndarray, pattern: str) -> np.ndarray:
    """Nearest-neighbor debayer (demosaicing.c:177-244): like bilinear but
    each missing color copies one fixed neighbor."""
    h, w = cfa.shape
    a = cfa.astype(np.int64)
    out = np.zeros((3, h, w), dtype=np.uint16)
    off = _phase_offsets(pattern)
    yy, xx = np.mgrid[0:h, 0:w]
    phase = ((yy & 1) * 2 + (xx & 1))

    def phase_of(dydx):
        return dydx[0] * 2 + dydx[1]

    right = np.zeros((h, w), dtype=np.int64)
    down = np.zeros((h, w), dtype=np.int64)
    diag = np.zeros((h, w), dtype=np.int64)
    right[1:-1, 1:-1] = a[1:-1, 2:]
    down[1:-1, 1:-1] = a[2:, 1:-1]
    diag[1:-1, 1:-1] = a[2:, 2:]

    at_r = phase == phase_of(off["R"])
    at_b = phase == phase_of(off["B"])
    at_g = ~(at_r | at_b)
    r_row = off["R"][0]
    in_r_row = (yy & 1) == r_row

    R = np.zeros((h, w), dtype=np.int64)
    G = np.zeros((h, w), dtype=np.int64)
    B = np.zeros((h, w), dtype=np.int64)
    R[at_r] = a[at_r]
    G[at_r] = right[at_r]
    B[at_r] = diag[at_r]
    B[at_b] = a[at_b]
    G[at_b] = right[at_b]
    R[at_b] = diag[at_b]
    G[at_g] = a[at_g]
    g_in_r_row = at_g & in_r_row
    g_in_b_row = at_g & ~in_r_row
    R[g_in_r_row] = right[g_in_r_row]
    B[g_in_r_row] = down[g_in_r_row]
    R[g_in_b_row] = down[g_in_b_row]
    B[g_in_b_row] = right[g_in_b_row]

    interior = np.zeros((h, w), dtype=bool)
    interior[1:-1, 1:-1] = True
    out[0][interior] = np.clip(R[interior], 0, 65535)
    out[1][interior] = np.clip(G[interior], 0, 65535)
    out[2][interior] = np.clip(B[interior], 0, 65535)
    return out


def debayer_buffer(cfa: np.ndarray, pattern: str,
                   method: str = "bilinear") -> np.ndarray:
    """``debayer_buffer`` (demosaicing.c:667-728): dispatch by method;
    AHD currently maps to VNG."""
    cfa = np.asarray(cfa, dtype=np.uint16)
    method = method.lower()
    if method in ("super_pixel", "superpixel", "super-pixel"):
        return super_pixel(cfa, pattern)
    if method in ("nearest", "nearestneighbor"):
        return nearest(cfa, pattern)
    if method == "vng":
        return vng(cfa, pattern)
    if method == "ahd":
        return ahd(cfa, pattern)
    if method == "bilinear":
        return bilinear(cfa, pattern)
    raise ValueError(f"unknown debayer method {method}")


__all__ = ["debayer_buffer", "super_pixel", "bilinear", "nearest", "vng", "ahd",
           "pattern_from_ser", "BAYER_PATTERNS"]


# ------------------------------------------------------------------- VNG

_VNG_TERMS = [
    -2, -2, +0, -1, 0, 0x01, -2, -2, +0, +0, 1, 0x01, -2, -1, -1, +0, 0, 0x01,
    -2, -1, +0, -1, 0, 0x02, -2, -1, +0, +0, 0, 0x03, -2, -1, +0, +1, 1, 0x01,
    -2, +0, +0, -1, 0, 0x06, -2, +0, +0, +0, 1, 0x02, -2, +0, +0, +1, 0, 0x03,
    -2, +1, -1, +0, 0, 0x04, -2, +1, +0, -1, 1, 0x04, -2, +1, +0, +0, 0, 0x06,
    -2, +1, +0, +1, 0, 0x02, -2, +2, +0, +0, 1, 0x04, -2, +2, +0, +1, 0, 0x04,
    -1, -2, -1, +0, 0, 0x80, -1, -2, +0, -1, 0, 0x01, -1, -2, +1, -1, 0, 0x01,
    -1, -2, +1, +0, 1, 0x01, -1, -1, -1, +1, 0, 0x88, -1, -1, +1, -2, 0, 0x40,
    -1, -1, +1, -1, 0, 0x22, -1, -1, +1, +0, 0, 0x33, -1, -1, +1, +1, 1, 0x11,
    -1, +0, -1, +2, 0, 0x08, -1, +0, +0, -1, 0, 0x44, -1, +0, +0, +1, 0, 0x11,
    -1, +0, +1, -2, 1, 0x40, -1, +0, +1, -1, 0, 0x66, -1, +0, +1, +0, 1, 0x22,
    -1, +0, +1, +1, 0, 0x33, -1, +0, +1, +2, 1, 0x10, -1, +1, +1, -1, 1, 0x44,
    -1, +1, +1, +0, 0, 0x66, -1, +1, +1, +1, 0, 0x22, -1, +1, +1, +2, 0, 0x10,
    -1, +2, +0, +1, 0, 0x04, -1, +2, +1, +0, 1, 0x04, -1, +2, +1, +1, 0, 0x04,
    +0, -2, +0, +0, 1, 0x80, +0, -1, +0, +1, 1, 0x88, +0, -1, +1, -2, 0, 0x40,
    +0, -1, +1, +0, 0, 0x11, +0, -1, +2, -2, 0, 0x40, +0, -1, +2, -1, 0, 0x20,
    +0, -1, +2, +0, 0, 0x30, +0, -1, +2, +1, 1, 0x10, +0, +0, +0, +2, 1, 0x08,
    +0, +0, +2, -2, 1, 0x40, +0, +0, +2, -1, 0, 0x60, +0, +0, +2, +0, 1, 0x20,
    +0, +0, +2, +1, 0, 0x30, +0, +0, +2, +2, 1, 0x10, +0, +1, +1, +0, 0, 0x44,
    +0, +1, +1, +2, 0, 0x10, +0, +1, +2, -1, 1, 0x40, +0, +1, +2, +0, 0, 0x60,
    +0, +1, +2, +1, 0, 0x20, +0, +1, +2, +2, 0, 0x10, +1, -2, +1, +0, 0, 0x80,
    +1, -1, +1, +1, 0, 0x88, +1, +0, +1, +2, 0, 0x08, +1, +0, +2, -1, 0, 0x40,
    +1, +0, +2, +1, 0, 0x10,
]
_VNG_CHOOD = [-1, -1, -1, 0, -1, +1, 0, +1, +1, +1, +1, 0, +1, -1, 0, -1]

_VNG_FILTERS = {"BGGR": 0x16161616, "GRBG": 0x61616161,
                "RGGB": 0x94949494, "GBRG": 0x49494949}


def _fc(filters: int, row: int, col: int) -> int:
    return (filters >> ((((row << 1) & 14) + (col & 1)) << 1)) & 3


def vng(cfa: np.ndarray, pattern: str) -> np.ndarray:
    """VNG demosaic — an exact array-program port of the dcraw-derived
    ``bayer_VNG`` (demosaicing.c:246-421).

    The reference delays write-back by two rows, so every gradient and
    neighbor read sees BILINEAR values; reading from the bilinear result
    and writing a fresh output reproduces it exactly. Pixels sharing
    (row & 7, col & 1) share the precalculated code table, so each of
    the 16 classes vectorizes over a strided subgrid.
    """
    cfa = np.asarray(cfa, dtype=np.uint16)
    h, w = cfa.shape
    filters = _VNG_FILTERS[pattern.upper()]
    rgb = bilinear(cfa, pattern)
    img = rgb.astype(np.int64)
    out = rgb.copy()

    def sub(ch, rows, cols, dy, dx):
        return img[ch][np.ix_(rows + dy, cols + dx)]

    all_rows = np.arange(2, h - 2)
    all_cols = np.arange(2, w - 2)
    for r8 in range(8):
        rows = all_rows[(all_rows & 7) == r8]
        if rows.size == 0:
            continue
        for c2 in range(2):
            cols = all_cols[(all_cols & 1) == c2]
            if cols.size == 0:
                continue
            color = _fc(filters, r8, c2)
            # ---- gradients (bayervng_terms decode, demosaicing.c:316-341)
            gval = np.zeros((8, rows.size, cols.size), dtype=np.int64)
            t = 0
            while t < len(_VNG_TERMS):
                y1, x1, y2, x2, weight, grads = _VNG_TERMS[t : t + 6]
                t += 6
                c1 = _fc(filters, r8 + y1, c2 + x1)
                if _fc(filters, r8 + y2, c2 + x2) != c1:
                    continue
                diag = 2 if (_fc(filters, r8, c2 + 1) == c1 and
                             _fc(filters, r8 + 1, c2) == c1) else 1
                if abs(y1 - y2) == diag and abs(x1 - x2) == diag:
                    continue
                diff = np.abs(sub(c1, rows, cols, y1, x1) -
                              sub(c1, rows, cols, y2, x2)) << weight
                for g in range(8):
                    if grads & (1 << g):
                        gval[g] += diff
            gmin = gval.min(axis=0)
            gmax = gval.max(axis=0)
            thold = gmin + (gmax >> 1)
            # ---- average the low-gradient directions (chood decode)
            sums = np.zeros((3, rows.size, cols.size), dtype=np.int64)
            num = np.zeros((rows.size, cols.size), dtype=np.int64)
            for g in range(8):
                dy, dx = _VNG_CHOOD[2 * g], _VNG_CHOOD[2 * g + 1]
                pair = (_fc(filters, r8 + dy, c2 + dx) != color and
                        _fc(filters, r8 + 2 * dy, c2 + 2 * dx) == color)
                use = gval[g] <= thold
                for c in range(3):
                    if c == color and pair:
                        contrib = (sub(c, rows, cols, 0, 0) +
                                   sub(color, rows, cols, 2 * dy, 2 * dx)) >> 1
                    else:
                        contrib = sub(c, rows, cols, dy, dx)
                    sums[c] += np.where(use, contrib, 0)
                num += use
            center = sub(color, rows, cols, 0, 0)
            numsafe = np.maximum(num, 1)
            for c in range(3):
                tval = center.astype(np.float64)
                if True:
                    dsum = sums[c] - sums[color]
                    # C integer division truncates toward zero
                    q = np.trunc(dsum / numsafe)
                    tval = np.where(c == color, tval, tval + q)
                vals = np_round_to_word(tval)
                keep = gmax == 0  # untouched pixels keep bilinear values
                block = out[c][np.ix_(rows, cols)]
                out[c][np.ix_(rows, cols)] = np.where(keep, block, vals)
    return out


# ------------------------------------------------------------------- AHD

_XYZ_RGB = np.array([[0.412453, 0.357580, 0.180423],
                     [0.212671, 0.715160, 0.072169],
                     [0.019334, 0.119193, 0.950227]])
_D65 = np.array([0.950456, 1.0, 1.088754])


def _ahd_cbrt_lut() -> np.ndarray:
    i = np.arange(0x10000, dtype=np.float32)
    r = i / np.float32(65535.0)
    return np.where(r > 0.008856, np.cbrt(r),
                    np.float32(7.787) * r + np.float32(16.0 / 116)
                    ).astype(np.float32)


_CBRT_LUT = None


def _cam_to_lab64(rgb3: np.ndarray) -> np.ndarray:
    """cam_to_cielab (demosaicing.c:433-466) vectorized: rgb3 (3, H, W)
    uint16 -> int16 lab*64 (C truncation to short)."""
    global _CBRT_LUT
    if _CBRT_LUT is None:
        _CBRT_LUT = _ahd_cbrt_lut()
    xyz_cam = (_XYZ_RGB / _D65[:, None]).astype(np.float32)
    cam = rgb3.astype(np.float32)
    xyz = np.tensordot(xyz_cam, cam, axes=1) + np.float32(0.5)
    idx = np_round_to_word(xyz.astype(np.float64))
    f = _CBRT_LUT[idx]
    L = np.float32(116) * f[1] - np.float32(16)
    a = np.float32(500) * (f[0] - f[1])
    b = np.float32(200) * (f[1] - f[2])
    lab = np.stack([L, a, b]) * np.float32(64)
    return np.trunc(lab).astype(np.int16)


def ahd(cfa: np.ndarray, pattern: str) -> np.ndarray:
    """AHD demosaic — exact array-program port of the dcraw-derived
    ``bayer_AHD`` (demosaicing.c:473-665, Hirakawa-Parks adaptive
    homogeneity-directed interpolation).

    The reference tiles at TS=256 purely to bound memory; the dependency
    cone of every output pixel is identical in a full-image computation
    (verified against a literal transcription), so each step vectorizes:
    green H/V candidates, R/B from green differences, CIELAB via the
    cbrt LUT, homogeneity maps, 3x3 homogeneity vote.
    """
    cfa = np.asarray(cfa, dtype=np.int64)
    h, w = cfa.shape
    filters = _VNG_FILTERS[pattern.upper()]
    yy, xx = np.mgrid[0:h, 0:w]
    fcmap = (((yy << 1) & 14) + (xx & 1))
    fcmap = (filters >> (fcmap << 1)) & 3

    # known CFA values placed; everything else 0
    dst = np.zeros((3, h, w), dtype=np.int64)
    for c in range(3):
        m = fcmap == c
        dst[c][m] = cfa[m]

    # ---- border_interpolate(3) (demosaicing.c:521-546)
    border = 3
    is_border = np.zeros((h, w), dtype=bool)
    is_border[:border, :] = True
    is_border[h - border :, :] = True
    is_border[:, :border] = True
    is_border[:, w - border :] = True
    for c in range(3):
        known = (fcmap == c).astype(np.int64)
        vals = np.where(fcmap == c, cfa, 0)
        ps = np.pad(vals, 1)
        pc = np.pad(known, 1)
        s3 = sum(ps[dy : dy + h, dx : dx + w]
                 for dy in range(3) for dx in range(3))
        c3 = sum(pc[dy : dy + h, dx : dx + w]
                 for dy in range(3) for dx in range(3))
        fill = is_border & (fcmap != c) & (c3 > 0)
        dst[c][fill] = (s3[fill] // np.maximum(c3[fill], 1))

    g_cfa = dst[1]

    def shift(a, dy, dx, fill=0):
        out = np.full_like(a, fill)
        ys0, ys1 = max(dy, 0), min(h + dy, h)
        xs0, xs1 = max(dx, 0), min(w + dx, w)
        out[ys0:ys1, xs0:xs1] = a[ys0 - dy : ys1 - dy, xs0 - dx : xs1 - dx]
        return out

    nong = fcmap != 1
    # value of the pixel's own CFA color at every position
    own = cfa

    # ---- green H / V candidates at non-green positions (:560-577)
    valid_g = np.zeros((h, w), dtype=bool)
    valid_g[2 : h - 2, 2 : w - 2] = True
    valid_g &= nong
    gl = shift(g_cfa, 0, 1)    # green at col-1 (value from left)
    gr = shift(g_cfa, 0, -1)   # green at col+1
    fl2 = shift(own, 0, 2)
    fr2 = shift(own, 0, -2)
    vh = ((gl + own + gr) * 2 - fl2 - fr2) >> 2
    gh = np.clip(vh, np.minimum(gl, gr), np.maximum(gl, gr))  # ULIM
    gu = shift(g_cfa, 1, 0)
    gd = shift(g_cfa, -1, 0)
    fu2 = shift(own, 2, 0)
    fd2 = shift(own, -2, 0)
    vv = ((gu + own + gd) * 2 - fu2 - fd2) >> 2
    gv = np.clip(vv, np.minimum(gu, gd), np.maximum(gu, gd))

    out = [np.zeros((3, h, w), dtype=np.int64), None]
    labs = [None, None]
    inner = np.zeros((h, w), dtype=bool)
    inner[1 : h - 1, 1 : w - 1] = True
    at_g = fcmap == 1
    for d, gcand in enumerate((gh, gv)):
        G = np.where(valid_g, gcand, 0)
        G = np.where(at_g, own, G)  # greens keep their CFA value
        rgbd = np.zeros((3, h, w), dtype=np.int64)
        rgbd[1] = G
        # at green pixels: c = FC(row+1, col) (:585-596)
        c_below = np.roll(fcmap, -1, axis=0)
        for cb in (0, 2):
            m = at_g & inner & (c_below == cb)
            hcol = 2 - cb
            val_h = own + ((shift(dst[hcol], 0, 1) + shift(dst[hcol], 0, -1)
                            - shift(G, 0, 1) - shift(G, 0, -1)) >> 1)
            val_v = own + ((shift(dst[cb], 1, 0) + shift(dst[cb], -1, 0)
                            - shift(G, 1, 0) - shift(G, -1, 0)) >> 1)
            rgbd[hcol][m] = np.clip(val_h, 0, 65535)[m]
            rgbd[cb][m] = np.clip(val_v, 0, 65535)[m]
        # at non-green pixels: opposite color from diagonals (:597-607)
        diag_g = (shift(G, 1, 1) + shift(G, 1, -1) +
                  shift(G, -1, 1) + shift(G, -1, -1))
        for fc_ in (0, 2):
            o = 2 - fc_
            m = (fcmap == fc_) & inner
            diag_o = (shift(dst[o], 1, 1) + shift(dst[o], 1, -1) +
                      shift(dst[o], -1, 1) + shift(dst[o], -1, -1))
            val = G + ((diag_o - diag_g + 1) >> 2)
            rgbd[o][m] = np.clip(val, 0, 65535)[m]
            rgbd[fc_][m] = own[m]
        out[d] = rgbd
        labs[d] = _cam_to_lab64(rgbd.astype(np.uint16))

    # ---- homogeneity maps (:609-637); dirs: col-1, col+1, row-1, row+1
    dirs = ((0, 1), (0, -1), (1, 0), (-1, 0))
    ldiff = np.zeros((2, 4, h, w), dtype=np.int64)
    abdiff = np.zeros((2, 4, h, w), dtype=np.int64)
    for d in range(2):
        L = labs[d][0].astype(np.int64)
        A = labs[d][1].astype(np.int64)
        B = labs[d][2].astype(np.int64)
        for i, (dy, dx) in enumerate(dirs):
            ldiff[d, i] = np.abs(L - shift(L, dy, dx))
            abdiff[d, i] = ((A - shift(A, dy, dx)) ** 2 +
                            (B - shift(B, dy, dx)) ** 2)
    leps = np.minimum(np.maximum(ldiff[0, 0], ldiff[0, 1]),
                      np.maximum(ldiff[1, 2], ldiff[1, 3]))
    abeps = np.minimum(np.maximum(abdiff[0, 0], abdiff[0, 1]),
                       np.maximum(abdiff[1, 2], abdiff[1, 3]))
    homo = np.zeros((2, h, w), dtype=np.int64)
    hvalid = np.zeros((h, w), dtype=bool)
    hvalid[2 : h - 2, 2 : w - 2] = True
    for d in range(2):
        for i in range(4):
            homo[d] += (hvalid & (ldiff[d, i] <= leps) &
                        (abdiff[d, i] <= abeps))

    # ---- combine (:639-658): 3x3 homogeneity vote on rows/cols [3, n-4]
    hm = np.zeros((2, h, w), dtype=np.int64)
    for d in range(2):
        p = np.pad(homo[d], 1)
        hm[d] = sum(p[dy : dy + h, dx : dx + w]
                    for dy in range(3) for dx in range(3))
    final = np.zeros((h, w), dtype=bool)
    final[3 : h - 3, 3 : w - 3] = True
    use_v = hm[1] > hm[0]
    tie = hm[0] == hm[1]
    result = dst.copy()
    for c in range(3):
        pick = np.where(use_v, out[1][c], out[0][c])
        avg = (out[0][c] + out[1][c]) >> 1
        val = np.where(tie, avg, pick)
        result[c][final] = np.clip(val, 0, 65535)[final]
    return np.clip(result, 0, 65535).astype(np.uint16)
