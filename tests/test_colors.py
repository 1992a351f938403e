"""Color ops: conversions round-trip + literal scalar parity, SCNR,
saturation, neutralization, white balance."""

import numpy as np
import pytest

from siriltpu.core.frame import Rect
from siriltpu.ops import colors as C


def scalar_rgb_to_hsl(r, g, b):
    """Literal transcription (colors.c:111-146)."""
    v = max(r, g, b)
    m = min(r, g, b)
    h = s = 0.0
    l = (m + v) / 2.0
    if l <= 0:
        return 0.0, 0.0, 0.0
    vm = v - m
    s = vm
    if s > 0:
        s /= (v + m) if l <= 0.5 else (2.0 - v - m)
    else:
        return h, 0.0, l
    r2 = (v - r) / vm
    g2 = (v - g) / vm
    b2 = (v - b) / vm
    if r == v:
        h = 5.0 + b2 if g == m else 1.0 - g2
    elif g == v:
        h = 1.0 + r2 if b == m else 3.0 - b2
    else:
        h = 3.0 + g2 if r == m else 5.0 - r2
    return h / 6.0, s, l


def test_hsl_matches_literal():
    rng = np.random.default_rng(80)
    for _ in range(200):
        r, g, b = rng.uniform(0, 1, 3)
        h1, s1, l1 = C.rgb_to_hsl(np.float64(r), np.float64(g), np.float64(b))
        h2, s2, l2 = scalar_rgb_to_hsl(r, g, b)
        assert float(h1) == pytest.approx(h2, abs=1e-12)
        assert float(s1) == pytest.approx(s2, abs=1e-12)
        assert float(l1) == pytest.approx(l2, abs=1e-12)


def test_hsl_roundtrip():
    rng = np.random.default_rng(81)
    rgb = rng.uniform(0, 1, (3, 100))
    h, s, l = C.rgb_to_hsl(rgb[0], rgb[1], rgb[2])
    r, g, b = C.hsl_to_rgb(h, s, l)
    np.testing.assert_allclose([r, g, b], rgb, atol=1e-10)


def test_hsv_roundtrip():
    rng = np.random.default_rng(82)
    rgb = rng.uniform(0, 1, (3, 100))
    h, s, v = C.rgb_to_hsv(rgb[0], rgb[1], rgb[2])
    r, g, b = C.hsv_to_rgb(h, s, v)
    np.testing.assert_allclose([r, g, b], rgb, atol=1e-10)


def test_lab_roundtrip():
    rng = np.random.default_rng(83)
    rgb = rng.uniform(0.01, 1, (3, 50))
    x, y, z = C.rgb_to_xyz(rgb[0], rgb[1], rgb[2])
    L, a, b2 = C.xyz_to_lab(x, y, z)
    x2, y2, z2 = C.lab_to_xyz(L, a, b2)
    r2, g2, b3 = C.xyz_to_rgb(x2, y2, z2)
    # the reference's published XYZ matrices are not exact inverses;
    # ~5e-6 roundtrip error is inherent to the C code too
    np.testing.assert_allclose([r2, g2, b3], rgb, atol=1e-5)


@pytest.mark.parametrize("scnr_type", [0, 1, 2, 3])
def test_scnr_reduces_green(scnr_type):
    rng = np.random.default_rng(84)
    data = rng.integers(1000, 20000, size=(3, 16, 16)).astype(np.uint16)
    data[1] = np.clip(data[1].astype(np.int64) + 15000, 0, 65535)  # green cast
    out = C.scnr(data, scnr_type, amount=0.8, preserve_lightness=False)
    assert out[1].astype(np.float64).mean() < data[1].astype(np.float64).mean()
    # red/blue unchanged without lightness preservation
    np.testing.assert_array_equal(out[0], data[0])
    np.testing.assert_array_equal(out[2], data[2])


def test_scnr_preserve_lightness_runs():
    rng = np.random.default_rng(85)
    data = rng.integers(1000, 30000, size=(3, 8, 8)).astype(np.uint16)
    out = C.scnr(data, 1, preserve_lightness=True)
    assert out.shape == data.shape


def test_enhance_saturation():
    # saturated red region should gain saturation
    data = np.zeros((3, 8, 8), dtype=np.uint16)
    data[0] = 30000
    data[1] = 20000
    data[2] = 20000
    out = C.enhance_saturation(data, 0.5, preserve_background=False)
    # more saturation -> bigger spread between R and G/B
    assert int(out[0, 4, 4]) - int(out[1, 4, 4]) > 10000


def test_background_neutralize():
    rng = np.random.default_rng(86)
    data = np.stack([
        np.clip(rng.normal(1200, 10, (32, 32)), 0, 65535),
        np.clip(rng.normal(900, 10, (32, 32)), 0, 65535),
        np.clip(rng.normal(1500, 10, (32, 32)), 0, 65535),
    ]).astype(np.uint16)
    out = C.background_neutralize(data, Rect(0, 0, 32, 32))
    meds = [np.median(out[c]) for c in range(3)]
    assert max(meds) - min(meds) < 30


def test_white_balance_selections():
    rng = np.random.default_rng(87)
    # white patch with channel imbalance
    data = np.stack([
        np.full((32, 32), 2000), np.full((32, 32), 2000),
        np.full((32, 32), 2000)]).astype(np.uint16)
    data[0, 4:12, 4:12] = 40000
    data[1, 4:12, 4:12] = 30000
    data[2, 4:12, 4:12] = 20000
    out = C.white_balance(
        data, white_selection=Rect(4, 32 - 12, 8, 8),
        black_selection=Rect(20, 2, 8, 8))
    # after calibration the white patch channels converge
    vals = [float(out[c][4:12, 4:12].mean()) for c in range(3)]
    # note: selection y is top-down; white patch rows 4:12 bottom-up =
    # top-down rows 20:28 -> Rect y = 32-12=20
    assert max(vals) - min(vals) < 0.15 * max(vals)


def test_extract_channels():
    data = np.arange(3 * 4, dtype=np.uint16).reshape(3, 2, 2)
    r, g, b = C.extract_channels_rgb(data)
    np.testing.assert_array_equal(r[0], data[0])
    np.testing.assert_array_equal(g[0], data[1])
