"""Non-self-referential anchors for the raw decoders.

The per-format round-trip tests pair a test encoder and the production
decoder written in this repo from the same dcraw notes — a shared
misreading passes both (PARITY.md raw-provenance note). These tests
anchor the machinery against INDEPENDENT third-party implementations
shipped in this image:

- libavcodec's mjpeg decoder (ffmpeg) decodes our lossless-JPEG (SOF3)
  streams — if the test encoder misread ITU T.81, ffmpeg would reject
  or mismatch; its exact agreement with native/lj92.cpp on the same
  bytes anchors the whole lossless-JPEG family (DNG, CR2 contents).
- Pillow writes uncompressed 16-bit TIFFs that read_tiffraw_cfa must
  parse — an independently-written container exercises the TIFF IFD /
  strip-layout reader against bytes this repo did not produce.
- One identical sensor plane through every vendor encoder/decoder pair
  must reproduce identically across families (shared geometry and
  orientation conventions confirmed cross-format).
"""

import ctypes
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_raw import encode_lossless_jpeg  # noqa: E402


def _av_decode():
    from siriltpu.utils.native import load_film_native
    lib = load_film_native()
    if lib is None or not hasattr(lib, "lj92_av_decode"):
        pytest.skip("libavcodec bridge unavailable")
    fn = lib.lj92_av_decode
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_char_p, ctypes.c_int,
                   ctypes.POINTER(ctypes.c_uint16), ctypes.c_long,
                   ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

    def decode(buf, h, w):
        out = np.zeros(h * w, np.uint16)
        ww, hh = ctypes.c_int(0), ctypes.c_int(0)
        rc = fn(buf, len(buf),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                out.size, ctypes.byref(ww), ctypes.byref(hh))
        assert rc == 0, f"libavcodec decode failed rc={rc}"
        assert (hh.value, ww.value) == (h, w)
        return out.reshape(h, w)

    return decode


@pytest.mark.parametrize("bits,predictor", [
    (16, 1), (16, 4), (16, 7),
    (14, 2), (14, 5),
    (12, 1), (12, 3), (12, 6),
])
def test_lj92_native_matches_libavcodec(bits, predictor):
    """The native lj92.cpp decoder and ffmpeg's independent lossless-
    JPEG decoder must produce identical samples from the same stream
    (ffmpeg normalizes <16-bit grays by a left shift — compensated)."""
    from siriltpu.io.raw import decode_lossless_jpeg

    av = _av_decode()
    rng = np.random.default_rng(bits * 100 + predictor)
    h, w = 24, 40
    img = rng.integers(0, 1 << bits, size=(h, w)).astype(np.uint16)
    img[3, :7] = (1 << bits) - 1          # runs at the range extremes
    img[5, 5:9] = 0
    buf = encode_lossless_jpeg(img, bits, predictor=predictor)

    ours, ncomp = decode_lossless_jpeg(buf, h * w)
    assert ncomp == 1
    theirs = av(buf, h, w) >> (16 - bits)
    np.testing.assert_array_equal(ours.reshape(h, w), theirs)
    np.testing.assert_array_equal(ours.reshape(h, w), img)


def test_tiffstrip_reader_parses_pillow_tiff(tmp_path):
    """read_tiffraw_cfa must parse a 16-bit uncompressed TIFF written
    by Pillow — container bytes produced by an independent
    implementation (IFD layout, strip offsets/counts, rows-per-strip
    chosen by Pillow, not by this repo's writers)."""
    PIL = pytest.importorskip("PIL.Image")
    from siriltpu.io.raw import read_tiffraw_cfa

    rng = np.random.default_rng(17)
    img = rng.integers(0, 65536, size=(40, 56)).astype(np.uint16)
    p = str(tmp_path / "plane.mef")          # a TIFF-strip raw extension
    PIL.fromarray(img).save(p, format="TIFF")
    cfa, pattern = read_tiffraw_cfa(p, "mef")
    np.testing.assert_array_equal(cfa, img)
    assert pattern == "RGGB"


def test_same_plane_across_vendor_formats(tmp_path):
    """One identical sensor plane encoded by every vendor test encoder
    and decoded by the matching production decoder must come back
    bit-identical across families (cross-format geometry/orientation
    consistency; each family's tables are further pinned by their own
    suites)."""
    from siriltpu.io.raw import read_raw_cfa
    from siriltpu.testing.mrw import write_mrw
    from siriltpu.testing.nef import write_nef
    from siriltpu.testing.orf import write_orf
    from siriltpu.testing.pef import write_pef
    from siriltpu.testing.raf import write_raf
    from test_raw import write_dng

    rng = np.random.default_rng(23)
    h, w = 32, 48
    plane12 = rng.integers(0, 1 << 12, size=(h, w)).astype(np.uint16)

    got = {}
    p = str(tmp_path / "x.dng")
    write_dng(p, plane12, pattern="RGGB", bits=16)
    got["dng"] = read_raw_cfa(p).data[0][::-1]     # undo bottom-up flip
    p = str(tmp_path / "x.nef")
    write_nef(p, plane12, bps=12)
    got["nef"] = read_raw_cfa(p).data[0][::-1]
    p = str(tmp_path / "x.pef")
    write_pef(p, plane12, bps=12)
    got["pef"] = read_raw_cfa(p).data[0][::-1]
    p = str(tmp_path / "x.orf")
    write_orf(p, plane12)
    got["orf"] = read_raw_cfa(p).data[0][::-1]
    # rw2 (and arw2) are excluded: Panasonic/Sony delta schemes
    # QUANTIZE by the active shift code (testing/rw2.py docstring), so
    # an arbitrary plane is not exactly representable — their own
    # suites pin encoder-tracked round trips instead
    p = str(tmp_path / "x.mrw")
    write_mrw(p, plane12)
    got["mrw"] = read_raw_cfa(p).data[0][::-1]
    p = str(tmp_path / "x.raf")
    write_raf(p, plane12)
    got["raf"] = read_raw_cfa(p).data[0][::-1]

    for name, plane in got.items():
        np.testing.assert_array_equal(
            plane, plane12, err_msg=f"{name} diverged from the source")
