"""FITS / SER / .seq round-trip and convention tests."""

import numpy as np
import pytest

from siriltpu.core.frame import Frame, ImgParam, Rect, RegData
from siriltpu.io import fits as fits_io
from siriltpu.io.seqfile import read_seqfile, write_seqfile
from siriltpu.io.sequence import Sequence, check_seq, ser_sequence
from siriltpu.io.ser import SerFile, SER_MONO, SER_RGB
from siriltpu.testing.synth import noise_frame


def test_fits_roundtrip_mono(tmp_path):
    data = noise_frame(37, 53, seed=3)
    f = Frame(data, {"exposure": 1.5})
    path = str(tmp_path / "a.fit")
    fits_io.write_fits(path, f)
    g = fits_io.read_fits(path)
    np.testing.assert_array_equal(g.data, data)
    assert g.meta["exposure"] == 1.5


def test_fits_roundtrip_rgb(tmp_path):
    data = noise_frame(16, 24, seed=4, nlayers=3)
    path = str(tmp_path / "rgb.fit")
    fits_io.write_fits(path, Frame(data))
    g = fits_io.read_fits(path)
    assert g.nlayers == 3
    np.testing.assert_array_equal(g.data, data)


def test_fits_float_conversion(tmp_path):
    """float FITS in [0,1] scales by 65535; >1 rounds directly
    (image_format_fits.c:334-348)."""
    import struct
    h, w = 4, 6
    vals = np.linspace(0.0, 1.0, h * w).astype(">f4").reshape(h, w)
    cards = []
    for k, v in [("SIMPLE", "T"), ("BITPIX", -32), ("NAXIS", 2),
                 ("NAXIS1", w), ("NAXIS2", h)]:
        if isinstance(v, str):
            cards.append(f"{k:<8}= {v:>20}".ljust(80).encode())
        else:
            cards.append(f"{k:<8}= {v:>20d}".ljust(80).encode())
    cards.append(b"END".ljust(80))
    header = b"".join(cards)
    header += b" " * (-len(header) % 2880)
    payload = vals.tobytes()
    payload += b"\x00" * (-len(payload) % 2880)
    path = str(tmp_path / "f.fit")
    with open(path, "wb") as f:
        f.write(header + payload)
    g = fits_io.read_fits(path)
    expect = np.floor(vals.astype(np.float64) * 65535.0 + 0.5).astype(np.uint16)
    np.testing.assert_array_equal(g.data[0], expect)


def test_fits_partial_read_topdown(tmp_path):
    """Partial reads return top-down rows of the top-down area
    (read_opened_fits_partial, image_format_fits.c:581-638)."""
    h, w = 10, 8
    data = (np.arange(h * w, dtype=np.uint16)).reshape(1, h, w)
    path = str(tmp_path / "p.fit")
    fits_io.write_fits(path, Frame(data))
    area = Rect(x=2, y=1, w=4, h=3)
    block = fits_io.read_fits_partial(path, 0, area)
    # top-down image row t corresponds to stored (bottom-up) row h-1-t
    expect = np.stack([data[0, h - 1 - (area.y + r), area.x : area.x + area.w]
                       for r in range(area.h)])
    np.testing.assert_array_equal(block, expect)


def test_ser_roundtrip_mono(tmp_path):
    path = str(tmp_path / "v.ser")
    ser = SerFile.create(path, width=32, height=20, color_id=SER_MONO)
    frames = [Frame(noise_frame(20, 32, seed=i)) for i in range(5)]
    for fr in frames:
        ser.write_frame(fr)
    ser.write_and_close()

    r = SerFile.open(path)
    assert r.frame_count == 5
    for i, fr in enumerate(frames):
        got = r.read_frame(i)
        np.testing.assert_array_equal(got.data, fr.data)


def test_ser_roundtrip_rgb(tmp_path):
    path = str(tmp_path / "c.ser")
    ser = SerFile.create(path, width=16, height=12, color_id=SER_RGB)
    fr = Frame(noise_frame(12, 16, seed=7, nlayers=3))
    ser.write_frame(fr)
    ser.write_and_close()
    r = SerFile.open(path)
    got = r.read_frame(0)
    assert got.nlayers == 3
    np.testing.assert_array_equal(got.data, fr.data)


def test_ser_partial_matches_full(tmp_path):
    path = str(tmp_path / "v.ser")
    ser = SerFile.create(path, width=32, height=20, color_id=SER_MONO)
    fr = Frame(noise_frame(20, 32, seed=9))
    ser.write_frame(fr)
    ser.write_and_close()
    r = SerFile.open(path)
    area = Rect(x=4, y=3, w=10, h=6)
    block = r.read_opened_partial(0, 0, area)
    full = r.read_frame(0).data[0][::-1]  # top-down
    np.testing.assert_array_equal(
        block, full[area.y : area.y + area.h, area.x : area.x + area.w])


def test_seqfile_roundtrip(tmp_path):
    seq = Sequence(seqname="lights", number=3, selnum=3, fixed=5,
                   reference_image=1, nb_layers=1, seq_dir=str(tmp_path))
    seq.imgparam = [ImgParam(filenum=i + 1) for i in range(3)]
    from siriltpu.core.frame import ImStats
    seq.imgparam[0].stats = ImStats(mean=100.5, median=99, sigma=3.25,
                                    avgdev=1, mad=2, sqrtbwmv=2.5,
                                    location=98.7, scale=3.1, min=0, max=65535)
    seq.regparam[0] = [RegData(shiftx=1, shifty=-2, fwhm=3.5, quality=0.8),
                       RegData(), RegData(shiftx=-4, shifty=5)]
    path = write_seqfile(seq, str(tmp_path))
    got = read_seqfile(path)
    assert got.seqname == "lights"
    assert got.number == 3
    assert got.reference_image == 1
    assert got.fixed == 5
    assert got.imgparam[0].stats.mean == 100.5
    assert got.imgparam[0].stats.scale == 3.1
    assert got.regparam[0][0].shiftx == 1
    assert got.regparam[0][0].shifty == -2
    assert got.regparam[0][2].shifty == 5


def test_check_seq_discovery(tmp_path):
    d = str(tmp_path)
    for i in range(1, 4):
        fits_io.write_fits(f"{d}/light{i:03d}.fit",
                           Frame(noise_frame(8, 8, seed=i)))
    seqs = check_seq(d)
    assert len(seqs) == 1
    seq = seqs[0]
    assert seq.seqname == "light"
    assert seq.number == 3
    assert seq.fixed == 3
    fr = seq.read_frame(1)
    assert fr.rx == 8


def test_sequence_frame_part_regular(tmp_path):
    d = str(tmp_path)
    data = noise_frame(12, 10, seed=11)
    fits_io.write_fits(f"{d}/s001.fit", Frame(data))
    fits_io.write_fits(f"{d}/s002.fit", Frame(data))
    seqs = check_seq(d)
    seq = seqs[0]
    area = Rect(1, 2, 5, 4)
    block = seq.read_frame_part(0, 0, area)
    full_topdown = data[0][::-1]
    np.testing.assert_array_equal(
        block, full_topdown[area.y : area.y + area.h, area.x : area.x + area.w])


def test_seqfile_corruption_rejected(tmp_path):
    """readseqfile parity for broken .seq files: no-S/no-I files are
    'corrupted' (seqfile.c:249), extra I lines are refused (the C would
    write past its allocation), and a wrong selnum is fixed in memory
    like the reference does (seqfile.c:258-261)."""
    from siriltpu.io.seqfile import read_seqfile

    bad = {
        "noS.seq": "L 1\nI 1 1\n",
        "toofew.seq": "S 'x' 1 3 1 5 0\nL 1\nI 1 1\n",
        "toomany.seq": "S 'x' 1 1 1 5 0\nL 1\nI 1 1\nI 2 1\n",
        "empty.seq": "",
    }
    for name, text in bad.items():
        p = tmp_path / name
        p.write_text(text)
        with pytest.raises(ValueError):
            read_seqfile(str(p))
    ok = tmp_path / "selfix.seq"
    ok.write_text("S 'x' 1 2 9 5 0\nL 1\nI 1 1\nI 2 0\n"
                  "R0 0 0 0 0 0 0 0\nR0 0 0 0 0 0 0 0\n")
    seq = read_seqfile(str(ok))
    assert seq.selnum == 1  # fixed from the bogus 9
