"""Film import, PIC format, display modes, plots, VNG demosaic."""

import os

import numpy as np
import pytest

from siriltpu.core.frame import Frame
from siriltpu.testing.synth import noise_frame


# ------------------------------------------------------------------ VNG

def literal_vng(cfa, pattern):
    """Literal per-pixel transcription of bayer_VNG (demosaicing.c:246-421)."""
    from siriltpu.ops.demosaic import (_VNG_CHOOD, _VNG_FILTERS, _VNG_TERMS,
                                       _fc, bilinear)
    from siriltpu.utils.rounding import np_round_to_word

    h, w = cfa.shape
    filters = _VNG_FILTERS[pattern]
    rgb = bilinear(cfa, pattern).astype(np.int64)
    out = rgb.copy().astype(np.uint16)
    for row in range(2, h - 2):
        for col in range(2, w - 2):
            r8, c2 = row & 7, col & 1
            gval = [0] * 8
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
                diff = abs(int(rgb[c1, row + y1, col + x1]) -
                           int(rgb[c1, row + y2, col + x2])) << weight
                for g in range(8):
                    if grads & (1 << g):
                        gval[g] += diff
            gmin, gmax = min(gval), max(gval)
            if gmax == 0:
                continue
            thold = gmin + (gmax >> 1)
            color = _fc(filters, r8, c2)
            sums = [0, 0, 0]
            num = 0
            for g in range(8):
                dy, dx = _VNG_CHOOD[2 * g], _VNG_CHOOD[2 * g + 1]
                if gval[g] > thold:
                    continue
                pair = (_fc(filters, r8 + dy, c2 + dx) != color and
                        _fc(filters, r8 + 2 * dy, c2 + 2 * dx) == color)
                for c in range(3):
                    if c == color and pair:
                        sums[c] += (int(rgb[color, row, col]) +
                                    int(rgb[color, row + 2 * dy,
                                            col + 2 * dx])) >> 1
                    else:
                        sums[c] += int(rgb[c, row + dy, col + dx])
                num += 1
            for c in range(3):
                tval = float(rgb[color, row, col])
                if c != color:
                    tval += int((sums[c] - sums[color]) / num)
                out[c, row, col] = np_round_to_word(np.float64(tval))
    return out


@pytest.mark.parametrize("pattern", ["RGGB", "BGGR", "GRBG", "GBRG"])
def test_vng_matches_literal(pattern):
    from siriltpu.ops.demosaic import vng
    rng = np.random.default_rng(hash(pattern) % 100)
    cfa = rng.integers(100, 40000, size=(18, 20)).astype(np.uint16)
    got = vng(cfa, pattern)
    want = literal_vng(cfa, pattern)
    np.testing.assert_array_equal(got, want)


def test_vng_flat_field():
    from siriltpu.ops.demosaic import vng
    cfa = np.full((16, 16), 9000, dtype=np.uint16)
    out = vng(cfa, "RGGB")
    assert (out[:, 2:-2, 2:-2] == 9000).all()


# ------------------------------------------------------------------ PIC

def test_pic_roundtrip(tmp_path):
    from siriltpu.io.formats import load_pic, save_pic
    f = Frame(noise_frame(10, 14, seed=1, nlayers=3))
    p = str(tmp_path / "img.pic")
    save_pic(p, f)
    g = load_pic(p)
    np.testing.assert_array_equal(g.data, f.data)


def test_pic_bad_magic(tmp_path):
    p = str(tmp_path / "bad.pic")
    open(p, "wb").write(b"\x00" * 400)
    from siriltpu.io.formats import load_pic
    with pytest.raises(ValueError, match="magic"):
        load_pic(p)


# ------------------------------------------------------------------ films

def test_film_avi_roundtrip(tmp_path):
    from siriltpu.io.avi import AviWriter
    from siriltpu.io.films import FilmFile, film_sequence

    path = str(tmp_path / "film.avi")
    wtr = AviWriter(path, 24, 16, fps=12.5)
    frames = [Frame(noise_frame(16, 24, seed=i, nlayers=3)) for i in range(4)]
    for f in frames:
        wtr.write_frame(f)
    wtr.close()

    film = FilmFile.open(path)
    assert film.nb_frames == 4
    assert film.width == 24 and film.height == 16
    assert film.fps == pytest.approx(12.5, rel=0.01)
    # 8-bit export roundtrip: values equal the display-scaled originals
    got = film.read_frame(2)
    expect = (frames[2].data.astype(np.float64) / 65535.0 * 255.0 /
              255.0 * 255.0).astype(np.uint8)
    assert got.nlayers == 3
    # sequence wrapper
    seq = film_sequence(path)
    assert seq.number == 4
    fr = seq.read_frame(0)
    assert fr.rx == 24


# ---------------------------------------------------------------- display

def test_display_modes():
    from siriltpu.ops.display import MODES, remap
    data = noise_frame(32, 32, seed=2, mean=4000, sigma=800)
    for mode in MODES:
        out = remap(data, 0, 65535, mode)
        assert out.dtype == np.uint8
        assert out.shape == data.shape
    # linear respects cutoffs
    lin = remap(data, 3000, 5000, "linear")
    assert lin.min() == 0 or lin.max() == 255


def test_display_stf_targets_background():
    data = np.clip(np.random.default_rng(3).normal(700, 30, (1, 64, 64)),
                   0, 65535).astype(np.uint16)
    from siriltpu.ops.display import remap
    out = remap(data, mode="autostretch")
    assert 0.1 * 255 < np.median(out) < 0.5 * 255


# ------------------------------------------------------------------ plots

def test_plots_exports(tmp_path):
    from siriltpu.core.frame import RegData
    from siriltpu.io.sequence import internal_sequence
    from siriltpu.pipelines.plots import (export_registration_dat,
                                          registration_curve, plot_png)

    frames = [Frame(noise_frame(8, 8, seed=i)) for i in range(5)]
    seq = internal_sequence(frames)
    seq.regparam[0] = [RegData(quality=0.1 * i, fwhm=3.0 + i)
                       for i in range(5)]
    rows = registration_curve(seq, 0)
    assert rows.shape == (5, 3)
    p = export_registration_dat(seq, str(tmp_path / "reg.dat"))
    lines = open(p).read().splitlines()
    assert len(lines) == 6
    png = plot_png(rows, str(tmp_path / "reg.png"))
    if png:
        assert os.path.getsize(png) > 0


def test_light_curve_export(tmp_path):
    from siriltpu.ops.photometry import Photometry
    from siriltpu.pipelines.plots import export_light_curve_dat
    from siriltpu.registration.onestar import SeqPsfResult

    res = [SeqPsfResult(image_index=i, ok=True,
                        photometry=Photometry(mag=-8.0 + 0.01 * i,
                                              s_mag=0.02))
           for i in range(6)]
    p = export_light_curve_dat(res, str(tmp_path / "lc.dat"))
    assert len(open(p).read().splitlines()) == 7
