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
    # dependency-free SVG renderer: valid XML with axes, grid, labels,
    # the series polyline and one marker per point
    import xml.etree.ElementTree as ET

    from siriltpu.pipelines.plots import plot_svg
    svg = plot_svg(rows, str(tmp_path / "reg.svg"),
                   title="Registration quality")
    root = ET.parse(svg).getroot()
    ns = "{http://www.w3.org/2000/svg}"
    assert root.tag == ns + "svg"
    assert len(root.findall(f"{ns}polyline")) == 1
    assert len(root.findall(f"{ns}circle")) == 5
    assert len(root.findall(f"{ns}text")) > 4  # ticks + labels + title


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
    # rendered light curve with error bars
    import xml.etree.ElementTree as ET

    from siriltpu.pipelines.plots import light_curve, plot_svg
    svg = plot_svg(light_curve(res), str(tmp_path / "lc.svg"),
                   ylabel="magnitude", err_column=2)
    root = ET.parse(svg).getroot()
    ns = "{http://www.w3.org/2000/svg}"
    assert len(root.findall(f"{ns}circle")) == 6
    bars = [e for e in root.findall(f"{ns}line")
            if e.get("stroke") == "#888"]
    assert len(bars) == 6


# ------------------------------------------------------------------ AHD

def literal_ahd(cfa, pattern):
    """Literal (tiled, per-pixel) transcription of bayer_AHD
    (demosaicing.c:473-665) for small images."""
    from siriltpu.ops.demosaic import _VNG_FILTERS, _fc, _cam_to_lab64
    from siriltpu.utils.rounding import np_round_to_word

    TS = 16  # small tile to exercise the tiling path
    h, w = cfa.shape
    filters = _VNG_FILTERS[pattern]
    dst = np.zeros((h, w, 3), dtype=np.int64)
    for r in range(h):
        for c in range(w):
            dst[r, c, _fc(filters, r, c)] = cfa[r, c]
    # border_interpolate(3)
    border = 3
    for row in range(h):
        col = 0
        while col < w:
            if (col == border and border <= row < h - border):
                col = w - border
            s = [0] * 8
            for y in range(row - 1, row + 2):
                for x in range(col - 1, col + 2):
                    if 0 <= y < h and 0 <= x < w:
                        f = _fc(filters, y, x)
                        s[f] += dst[y, x, f]
                        s[f + 4] += 1
            f = _fc(filters, row, col)
            for c in range(3):
                if c != f and s[c + 4]:
                    dst[row, col, c] = s[c] // s[c + 4]
            col += 1

    def ulim(x, a, b):
        lo2, hi2 = (a, b) if a < b else (b, a)
        return max(lo2, min(x, hi2))

    out = dst.copy()
    for top in range(0, h, TS - 6):
        for left in range(0, w, TS - 6):
            rgb = np.zeros((2, TS, TS, 3), dtype=np.int64)
            lab = np.zeros((2, TS, TS, 3), dtype=np.int64)
            # green H/V
            for row in range(max(top, 2), min(top + TS, h - 2)):
                col = left + (1 if _fc(filters, row, left) == 1 else 0)
                if col < 2:
                    col += 2
                fc_ = _fc(filters, row, col)
                while col < min(left + TS, w - 2):
                    val = ((dst[row, col - 1, 1] + dst[row, col, fc_] +
                            dst[row, col + 1, 1]) * 2
                           - dst[row, col - 2, fc_] - dst[row, col + 2, fc_]) >> 2
                    rgb[0, row - top, col - left, 1] = ulim(
                        val, dst[row, col - 1, 1], dst[row, col + 1, 1])
                    val = ((dst[row - 1, col, 1] + dst[row, col, fc_] +
                            dst[row + 1, col, 1]) * 2
                           - dst[row - 2, col, fc_] - dst[row + 2, col, fc_]) >> 2
                    rgb[1, row - top, col - left, 1] = ulim(
                        val, dst[row - 1, col, 1], dst[row + 1, col, 1])
                    col += 2
            # R/B + lab
            for d in range(2):
                for row in range(top + 1, min(top + TS - 1, h - 1)):
                    for col in range(left + 1, min(left + TS - 1, w - 1)):
                        tr, tc = row - top, col - left
                        c = 2 - _fc(filters, row, col)
                        if c == 1:
                            c = _fc(filters, row + 1, col)
                            val = dst[row, col, 1] + (
                                (dst[row, col - 1, 2 - c] + dst[row, col + 1, 2 - c]
                                 - rgb[d, tr, tc - 1, 1] - rgb[d, tr, tc + 1, 1]) >> 1)
                            rgb[d, tr, tc, 2 - c] = int(np_round_to_word(
                                np.float64(val)))
                            val = dst[row, col, 1] + (
                                (dst[row - 1, col, c] + dst[row + 1, col, c]
                                 - rgb[d, tr - 1, tc, 1] - rgb[d, tr + 1, tc, 1]) >> 1)
                        else:
                            val = rgb[d, tr, tc, 1] + (
                                (dst[row - 1, col - 1, c] + dst[row - 1, col + 1, c]
                                 + dst[row + 1, col - 1, c] + dst[row + 1, col + 1, c]
                                 - rgb[d, tr - 1, tc - 1, 1] - rgb[d, tr - 1, tc + 1, 1]
                                 - rgb[d, tr + 1, tc - 1, 1] - rgb[d, tr + 1, tc + 1, 1]
                                 + 1) >> 2)
                        rgb[d, tr, tc, c] = int(np_round_to_word(np.float64(val)))
                        fcc = _fc(filters, row, col)
                        rgb[d, tr, tc, fcc] = dst[row, col, fcc]
                        lab[d, tr, tc] = _cam_to_lab64(
                            rgb[d, tr, tc].astype(np.uint16)[:, None, None]
                        )[:, 0, 0]
            # homogeneity
            homo = np.zeros((2, TS, TS), dtype=np.int64)
            dirs = [(0, -1), (0, 1), (-1, 0), (1, 0)]
            for row in range(top + 2, min(top + TS - 2, h)):
                for col in range(left + 2, min(left + TS - 2, w)):
                    tr, tc = row - top, col - left
                    ld = np.zeros((2, 4), dtype=np.int64)
                    ab = np.zeros((2, 4), dtype=np.int64)
                    for d in range(2):
                        for i, (dy, dx) in enumerate(dirs):
                            ld[d, i] = abs(lab[d, tr, tc, 0] -
                                           lab[d, tr + dy, tc + dx, 0])
                    leps = min(max(ld[0, 0], ld[0, 1]),
                               max(ld[1, 2], ld[1, 3]))
                    for d in range(2):
                        for i, (dy, dx) in enumerate(dirs):
                            ab[d, i] = ((lab[d, tr, tc, 1] -
                                         lab[d, tr + dy, tc + dx, 1]) ** 2 +
                                        (lab[d, tr, tc, 2] -
                                         lab[d, tr + dy, tc + dx, 2]) ** 2)
                    abeps = min(max(ab[0, 0], ab[0, 1]),
                                max(ab[1, 2], ab[1, 3]))
                    for d in range(2):
                        for i in range(4):
                            if ld[d, i] <= leps and ab[d, i] <= abeps:
                                homo[d, tr, tc] += 1
            # combine
            for row in range(top + 3, min(top + TS - 3, h - 3)):
                for col in range(left + 3, min(left + TS - 3, w - 3)):
                    tr, tc = row - top, col - left
                    hm = [int(homo[d, tr - 1 : tr + 2, tc - 1 : tc + 2].sum())
                          for d in range(2)]
                    for c in range(3):
                        if hm[0] != hm[1]:
                            out[row, col, c] = rgb[1 if hm[1] > hm[0] else 0,
                                                   tr, tc, c]
                        else:
                            out[row, col, c] = (rgb[0, tr, tc, c] +
                                                rgb[1, tr, tc, c]) >> 1
    return np.clip(out.transpose(2, 0, 1), 0, 65535).astype(np.uint16)


@pytest.mark.parametrize("pattern", ["RGGB", "GRBG"])
def test_ahd_matches_literal(pattern):
    from siriltpu.ops.demosaic import ahd
    rng = np.random.default_rng(17)
    cfa = rng.integers(100, 40000, size=(20, 22)).astype(np.uint16)
    got = ahd(cfa, pattern)
    want = literal_ahd(cfa, pattern)
    np.testing.assert_array_equal(got, want)


def test_ahd_flat_field():
    from siriltpu.ops.demosaic import ahd
    cfa = np.full((20, 20), 12000, dtype=np.uint16)
    out = ahd(cfa, "RGGB")
    assert (out[:, 3:-3, 3:-3] == 12000).all()


def test_demosaic_device_matches_host():
    """Device VNG is bit-identical to the host reference; device AHD
    matches except at most a few knife-edge f32 direction-vote ties
    (PARITY.md #7) on adversarial data."""
    from siriltpu.ops.demosaic import ahd, ahd_device, vng, vng_device
    from siriltpu.testing.synth import starfield

    img, _ = starfield(96, 128, nstars=20, seed=9)
    cfa = img[0]
    for pat in ["RGGB", "BGGR", "GRBG", "GBRG"]:
        assert np.array_equal(vng(cfa, pat), vng_device(cfa, pat))
        a, b = ahd(cfa, pat), ahd_device(cfa, pat)
        ndiff = int((a != b).sum())
        assert ndiff <= 12, f"{pat}: {ndiff} device/host AHD pixel diffs"


# ------------------------------------------------------------ MJPEG films

def _write_mjpeg_avi(path, jpeg_chunks, w, h, fps=30.0):
    """Minimal MJPEG AVI muxer for tests: RIFF(AVI )/hdrl/movi layout."""
    import struct

    def chunk(tag, data):
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    def lst(kind, data):
        return chunk(b"LIST", kind + data)

    avih = struct.pack("<IIIIIIIIIIIIII", int(1e6 / fps), 0, 0, 0x10,
                       len(jpeg_chunks), 0, 1, 0, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"MJPG", 0, 0, 0, 0,
                       1, int(fps), 0, len(jpeg_chunks), 0, 0xFFFFFFFF, 0,
                       0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) +
               lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpeg_chunks))
    body = b"AVI " + hdrl + movi
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)


def _strip_dht(jpeg):
    """Remove every DHT segment from a baseline JPEG (MJPEG convention)."""
    import struct
    out, pos = bytearray(jpeg[:2]), 2
    while pos + 4 <= len(jpeg):
        marker = jpeg[pos + 1]
        if marker == 0xDA:
            out += jpeg[pos:]
            break
        if 0xD0 <= marker <= 0xD9 or marker == 0x01:
            out += jpeg[pos:pos + 2]
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        if marker != 0xC4:
            out += jpeg[pos:pos + 2 + seglen]
        pos += 2 + seglen
    return bytes(out)


def _pil_jpeg(arr, quality=90):
    import io
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_mjpeg_dht_insertion_matches_pil_standard_tables():
    # PIL (libjpeg, optimize=False) writes the T.81 Annex K tables; after
    # stripping DHT, reinserting OUR standard tables must decode to the
    # exact same pixels — this externally validates the table constants.
    import io
    from PIL import Image
    from siriltpu.io.films import ensure_jpeg_dht
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8)
    jpeg = _pil_jpeg(arr)
    ref = np.asarray(Image.open(io.BytesIO(jpeg)))
    stripped = _strip_dht(jpeg)
    assert b"\xff\xc4" not in stripped[:stripped.find(b"\xff\xda")]
    fixed = ensure_jpeg_dht(stripped)
    assert b"\xff\xc4" in fixed[:fixed.find(b"\xff\xda")]
    got = np.asarray(Image.open(io.BytesIO(fixed)))
    np.testing.assert_array_equal(got, ref)
    # a JPEG that already has DHT passes through untouched
    assert ensure_jpeg_dht(jpeg) is jpeg


def test_mjpeg_avi_demux(tmp_path):
    import io
    from PIL import Image
    from siriltpu.io.films import FilmFile, film_sequence
    rng = np.random.default_rng(3)
    w, h, n = 48, 32, 5
    raws = [rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            for _ in range(n)]
    # half the frames carry DHT, half follow the MJPEG omit-DHT convention
    jpegs = [_pil_jpeg(a) for a in raws]
    jpegs = [j if i % 2 else _strip_dht(j) for i, j in enumerate(jpegs)]
    path = str(tmp_path / "mj.avi")
    _write_mjpeg_avi(path, jpegs, w, h, fps=17.0)

    film = FilmFile.open(path)
    assert film._backend == "mjpeg"
    assert (film.nb_frames, film.width, film.height) == (n, w, h)
    assert film.fps == pytest.approx(17.0, rel=0.01)
    for i, j in enumerate(jpegs):
        from siriltpu.io.films import ensure_jpeg_dht
        want = np.asarray(Image.open(io.BytesIO(ensure_jpeg_dht(j))))
        got = film.read_frame(i)
        assert got.nlayers == 3
        # frame is bottom-up CHW; compare against the top-down decode
        np.testing.assert_array_equal(
            got.data, want[::-1].transpose(2, 0, 1).astype(np.uint16))
    seq = film_sequence(path)
    assert seq.number == n and seq.rx == w and seq.ry == h


def test_unknown_avi_codec_clear_error(tmp_path):
    from siriltpu.io.films import FilmFile
    path = str(tmp_path / "x264.avi")
    _write_mjpeg_avi(path, [b"\x00" * 10], 8, 8)
    data = bytearray(open(path, "rb").read())
    data = data.replace(b"MJPG", b"H264")
    open(path, "wb").write(bytes(data))
    with pytest.raises(RuntimeError, match="no ffmpeg backend"):
        FilmFile.open(path)


def test_convert_dir_with_mjpeg_film(tmp_path):
    # film → FITS sequence conversion (conversion.c film branch)
    from PIL import Image
    from siriltpu.io.conversion import convert_dir
    from siriltpu.io.fits import read_fits
    rng = np.random.default_rng(11)
    raws = [rng.integers(0, 255, size=(16, 24, 3), dtype=np.uint8)
            for _ in range(4)]
    _write_mjpeg_avi(str(tmp_path / "cap.avi"),
                     [_pil_jpeg(a, quality=95) for a in raws], 24, 16)
    n = convert_dir(str(tmp_path), "film")
    assert n == 4
    fr = read_fits(str(tmp_path / "film00001.fit"))
    assert fr.data.shape[1:] == (16, 24)


def test_malformed_containers_fail_cleanly(tmp_path):
    """Truncated/garbage AVI, MP4 and SER inputs raise clean errors —
    never unhandled struct/index crashes (parsers take untrusted files)."""
    import struct

    from siriltpu.io.films import FilmFile
    from siriltpu.io.ser import SER_HEADER_LEN, SerFile

    cases = {
        "garbage.avi": b"RIFF\x10\x00\x00\x00AVI LIST\xff\xff\xff\xff",
        "short.avi": b"RI",
        "garbage.mp4": b"\x00\x00\x00\x08ftypisom" + b"\x00" * 4,
        "truncmoov.mp4": (b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00"
                          + b"\x00\x00\xff\xffmoov" + b"\x12" * 16),
        "noise.mp4": bytes(range(256)) * 8,
    }
    for name, payload in cases.items():
        p = tmp_path / name
        p.write_bytes(payload)
        try:
            FilmFile.open(str(p))
            raise AssertionError(f"{name}: expected an error")
        except (ValueError, RuntimeError):
            pass  # clean, typed failure

    bad_ser = tmp_path / "bad.ser"
    hdr = bytearray(SER_HEADER_LEN)
    hdr[:14] = b"LUCAM-RECORDER"
    struct.pack_into("<iiiiii", hdr, 18, 0, 0, -5, 7, 16, 3)  # negative w
    bad_ser.write_bytes(bytes(hdr))
    try:
        SerFile.open(str(bad_ser))
        raise AssertionError("bad.ser: expected an error")
    except ValueError:
        pass
    short_ser = tmp_path / "short.ser"
    short_ser.write_bytes(b"LUCAM")
    try:
        SerFile.open(str(short_ser))
        raise AssertionError("short.ser: expected an error")
    except (ValueError, struct.error):
        pass
