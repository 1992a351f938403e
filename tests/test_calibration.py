"""Calibration, cosmetic correction, demosaic, background extraction,
MTF/autostretch, image ops. BASELINE config-5 component math."""

import numpy as np
import pytest

from siriltpu.core.frame import Frame
from siriltpu.ops import imops
from siriltpu.ops.background import BackgroundParams, compute_background, subtract_background
from siriltpu.ops.cosmetic import (auto_detect_and_fix, cosmetic_correction,
                                   find_deviant_pixels)
from siriltpu.ops.demosaic import bilinear, nearest, super_pixel
from siriltpu.ops.histogram_ops import (apply_mtf, autostretch,
                                        find_midtones_balance, histeq, mtf)
from siriltpu.pipelines.preprocess import (PreproConfig, dark_optimization,
                                           preprocess_single, seq_preprocess)
from siriltpu.testing.synth import gradient_frame, noise_frame


# ------------------------------------------------------------------ imops

def test_imoper_int_semantics():
    a = np.array([[[100, 200], [65535, 50]]], dtype=np.uint16)
    b = np.array([[[150, 50], [2, 100]]], dtype=np.uint16)
    sub = imops.imoper(a, b, imops.OPER_SUB)
    np.testing.assert_array_equal(sub[0], [[0, 150], [65533, 0]])
    div = imops.imoper(a, b, imops.OPER_DIV)
    # integer division like the C code
    np.testing.assert_array_equal(div[0], [[0, 4], [32767, 0]])


def test_soper_rounding():
    a = np.array([[[10, 20]]], dtype=np.uint16)
    out = imops.soper(a, 1.25, imops.OPER_MUL)
    np.testing.assert_array_equal(out[0], [[13, 25]])  # 12.5 -> 13 (half up)


def test_fdiv_zero_divisor_and_overflow():
    a = np.array([[[100, 60000]]], dtype=np.uint16)
    b = np.array([[[0, 1]]], dtype=np.uint16)
    out, overflow = imops.fdiv(a, b, 2.0)
    assert overflow == 1
    np.testing.assert_array_equal(out[0], [[200, 65535]])


def test_crop_topdown():
    data = np.arange(24, dtype=np.uint16).reshape(1, 4, 6)
    out = imops.crop(data, x=1, y=1, w=3, h=2)
    # top-down y=1..2 -> bottom-up rows 1..2
    np.testing.assert_array_equal(out[0], data[0][1:3, 1:4])


# ------------------------------------------------------------ calibration

def test_preprocess_chain():
    rng = np.random.default_rng(70)
    sky = rng.integers(5000, 6000, size=(1, 32, 32)).astype(np.uint16)
    offset = np.full((1, 32, 32), 300, dtype=np.uint16)
    dark = np.full((1, 32, 32), 200, dtype=np.uint16)
    flat = np.full((1, 32, 32), 20000, dtype=np.uint16)
    flat[0, :, :16] = 10000  # vignetting
    brut = np.clip(sky.astype(np.int64) * flat.astype(np.int64) // 20000
                   + offset + dark, 0, 65535).astype(np.uint16)
    cfg = PreproConfig(use_offset=True, use_dark=True, use_flat=True,
                       normalisation=20000.0, autolevel=False)
    out = preprocess_single(brut, offset=offset, dark=dark, flat=flat,
                            config=cfg)
    # should recover ~sky
    err = np.abs(out.astype(np.int64) - sky.astype(np.int64))
    assert err.mean() < 3


def test_dark_optimization_finds_scale():
    rng = np.random.default_rng(71)
    dark_pattern = rng.integers(0, 2000, size=(1, 64, 64)).astype(np.uint16)
    sky = np.clip(rng.normal(1000, 20, (1, 64, 64)), 0, 65535)
    k_true = 0.7
    brut = np.clip(sky + k_true * dark_pattern, 0, 65535).astype(np.uint16)
    out, k = dark_optimization(brut, dark_pattern, None, False)
    assert k == pytest.approx(k_true, abs=0.05)


def test_cosmetic_correction_fixes_pixels():
    rng = np.random.default_rng(72)
    dark = np.clip(rng.normal(500, 10, (64, 64)), 0, 65535).astype(np.uint16)
    dark[10, 20] = 60000  # hot
    dark[30, 40] = 0      # cold (below median - 3 sigma... 0 <= thres)
    devs, icold, ihot = find_deviant_pixels(dark, (3.0, 3.0))
    assert ihot == 1
    assert icold >= 1
    light = np.clip(rng.normal(1200, 15, (64, 64)), 0, 65535).astype(np.uint16)
    light[10, 20] = 65000
    fixed = cosmetic_correction(light, devs)
    assert abs(int(fixed[10, 20]) - 1200) < 100


def test_auto_detect_and_fix():
    rng = np.random.default_rng(73)
    img = np.clip(rng.normal(800, 10, (64, 64)), 0, 65535).astype(np.uint16)
    img[5, 5] = 65000
    fixed, icold, ihot = auto_detect_and_fix(img, (3.0, 3.0))
    assert ihot >= 1
    assert abs(int(fixed[5, 5]) - 800) < 80


# -------------------------------------------------------------- demosaic

def test_super_pixel_rggb():
    cfa = np.zeros((4, 4), dtype=np.uint16)
    # RGGB tile values
    cfa[0, 0] = 1000  # R
    cfa[0, 1] = 2000  # G1
    cfa[1, 0] = 3000  # G2
    cfa[1, 1] = 4000  # B
    out = super_pixel(cfa, "RGGB")
    assert out.shape == (3, 2, 2)
    assert out[0, 0, 0] == 1000
    assert out[1, 0, 0] == 2500
    assert out[2, 0, 0] == 4000


def test_bilinear_flat_field():
    """A uniform CFA must debayer to a uniform interior."""
    cfa = np.full((16, 16), 5000, dtype=np.uint16)
    out = bilinear(cfa, "RGGB")
    interior = out[:, 1:-1, 1:-1]
    assert (interior == 5000).all()
    # border stays zero (reference calloc)
    assert (out[:, 0, :] == 0).all()


def test_bilinear_recovers_gradient():
    """Smooth scene: bilinear interpolation error is small."""
    yy, xx = np.mgrid[0:32, 0:32]
    scene_r = (1000 + 30 * xx).astype(np.float64)
    scene_g = (2000 + 20 * yy).astype(np.float64)
    scene_b = (1500 + 10 * xx + 10 * yy).astype(np.float64)
    cfa = np.zeros((32, 32), dtype=np.uint16)
    cfa[0::2, 0::2] = scene_r[0::2, 0::2]
    cfa[0::2, 1::2] = scene_g[0::2, 1::2]
    cfa[1::2, 0::2] = scene_g[1::2, 0::2]
    cfa[1::2, 1::2] = scene_b[1::2, 1::2]
    out = bilinear(cfa, "RGGB")
    err_r = np.abs(out[0, 2:-2, 2:-2] - scene_r[2:-2, 2:-2])
    err_g = np.abs(out[1, 2:-2, 2:-2] - scene_g[2:-2, 2:-2])
    assert err_r.mean() < 35
    assert err_g.mean() < 25


def test_nearest_flat():
    cfa = np.full((12, 12), 7000, dtype=np.uint16)
    out = nearest(cfa, "BGGR")
    assert (out[:, 1:-1, 1:-1] == 7000).all()


# ------------------------------------------------------------ background

def test_background_extraction_gradient():
    """A pure polynomial gradient is recovered closely."""
    h = w = 200
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    true_bkg = 1000 + 3.0 * xx + 1.5 * yy + 0.01 * xx * yy
    rng = np.random.default_rng(74)
    img = np.clip(true_bkg + rng.normal(0, 5, (h, w)), 0,
                  65535).astype(np.uint16)
    model = compute_background(img, BackgroundParams(order=2, box=20))
    err = np.abs(model - true_bkg)
    assert err.mean() < 10


def test_subtract_background_flattens():
    h = w = 200
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    grad = 2000 + 8.0 * xx + 4.0 * yy
    rng = np.random.default_rng(75)
    img = np.clip(grad + rng.normal(0, 5, (h, w)), 0,
                  65535).astype(np.uint16)[None]
    out = subtract_background(img, BackgroundParams(order=1, box=20))
    # flattened: residual spread far below original gradient spread
    assert out[0].astype(np.float64).std() < 30
    assert img[0].astype(np.float64).std() > 500


# ---------------------------------------------------------- MTF/stretch

def test_mtf_formula():
    assert mtf(0.25, 0.5) == 0.25
    assert mtf(0.0, 0.3) == 0.0
    assert mtf(1.0, 0.3) == pytest.approx(1.0)
    # reference formula value
    x, m = 0.2, 0.3
    assert mtf(x, m) == pytest.approx(((m - 1) * x) / ((2 * m - 1) * x - m))


def test_apply_mtf_range():
    rng = np.random.default_rng(76)
    data = rng.integers(0, 3000, size=(1, 32, 32)).astype(np.uint16)
    out = apply_mtf(data, m=0.2, lo=0.0, hi=1.0)
    assert out.dtype == np.uint16
    assert out.max() <= 65535


def test_autostretch_brightens_dark_image():
    rng = np.random.default_rng(77)
    data = np.clip(rng.normal(800, 40, (1, 128, 128)), 0,
                   65535).astype(np.uint16)
    m, lo, hi = find_midtones_balance(data)
    assert 0 < m < 1
    assert lo < 800 / 65535.0
    out = autostretch(data)
    # target background ~0.25 of full scale
    med = np.median(out)
    assert 0.1 * 65535 < med < 0.45 * 65535


def test_histeq_uniformizes():
    rng = np.random.default_rng(78)
    data = np.clip(rng.normal(500, 30, (1, 64, 64)), 0, 65535).astype(np.uint16)
    out = histeq(data)
    assert out.std() > data.std()  # spread over the full range


# ----------------------------------------------------------- sequence pp

def test_seq_preprocess_writes_pp_sequence(tmp_path):
    from siriltpu.io import fits as fits_io
    from siriltpu.io.sequence import check_seq

    d = str(tmp_path)
    rng = np.random.default_rng(79)
    dark = np.full((1, 16, 16), 100, dtype=np.uint16)
    for i in range(3):
        raw = np.clip(rng.normal(1000, 10, (1, 16, 16)) + 100, 0,
                      65535).astype(np.uint16)
        fits_io.write_fits(f"{d}/raw{i+1:02d}.fit", Frame(raw))
    seq = check_seq(d)[0]
    cfg = PreproConfig(use_dark=True)
    frames = seq_preprocess(seq, dark=Frame(dark), config=cfg)
    assert len(frames) == 3
    assert abs(float(frames[0].data.mean()) - 1000) < 20
    # pp_ files exist and form a sequence
    seqs = check_seq(d)
    names = sorted(s.seqname for s in seqs)
    assert any(n.startswith("pp_") for n in names)
