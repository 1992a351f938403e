"""Interop anchor: the REAL cfitsio (libcfitsio.so, the library behind
the reference's entire FITS layer — src/io/image_format_fits.c) reads
what siriltpu writes, and siriltpu reads what cfitsio writes, for every
bitpix the reference ingests (readfits :287-349).

The distro ships libcfitsio.so.10 without headers; the tests drive it
through ctypes with the documented public ABI (short names ffdkopn /
ffgipr / ffgpxv / ffinit / ffcrim / ffppx — stable since cfitsio 2.x).
Skipped cleanly if the shared library is absent.
"""

import ctypes
import ctypes.util
import os

import numpy as np
import pytest

from siriltpu.core.frame import Frame
from siriltpu.io import fits as fits_io

# cfitsio public constants (fitsio.h, stable API)
READONLY = 0
BYTE_IMG, SHORT_IMG, USHORT_IMG = 8, 16, 20
LONG_IMG, FLOAT_IMG, DOUBLE_IMG = 32, -32, -64
TBYTE, TUSHORT, TSHORT, TLONG = 11, 20, 21, 41
TFLOAT, TDOUBLE = 42, 82


def _load():
    for name in ("libcfitsio.so.10", "libcfitsio.so",
                 ctypes.util.find_library("cfitsio")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    else:
        return None
    c = ctypes
    lib.ffdkopn.argtypes = [c.POINTER(c.c_void_p), c.c_char_p, c.c_int,
                            c.POINTER(c.c_int)]
    lib.ffinit.argtypes = [c.POINTER(c.c_void_p), c.c_char_p,
                           c.POINTER(c.c_int)]
    lib.ffclos.argtypes = [c.c_void_p, c.POINTER(c.c_int)]
    lib.ffgipr.argtypes = [c.c_void_p, c.c_int, c.POINTER(c.c_int),
                           c.POINTER(c.c_int), c.POINTER(c.c_long),
                           c.POINTER(c.c_int)]
    lib.ffgpxv.argtypes = [c.c_void_p, c.c_int, c.POINTER(c.c_long),
                           c.c_longlong, c.c_void_p, c.c_void_p,
                           c.POINTER(c.c_int), c.POINTER(c.c_int)]
    lib.ffcrim.argtypes = [c.c_void_p, c.c_int, c.c_int,
                           c.POINTER(c.c_long), c.POINTER(c.c_int)]
    lib.ffppx.argtypes = [c.c_void_p, c.c_int, c.POINTER(c.c_long),
                          c.c_longlong, c.c_void_p, c.POINTER(c.c_int)]
    lib.ffgkys.argtypes = [c.c_void_p, c.c_char_p, c.c_char_p, c.c_char_p,
                           c.POINTER(c.c_int)]
    return lib


CFITSIO = _load()
pytestmark = pytest.mark.skipif(CFITSIO is None,
                                reason="libcfitsio not installed")


def _check(status):
    assert status.value == 0, f"cfitsio status {status.value}"


def _cf_open(path):
    fptr = ctypes.c_void_p()
    status = ctypes.c_int(0)
    CFITSIO.ffdkopn(ctypes.byref(fptr), path.encode(), READONLY,
                    ctypes.byref(status))
    _check(status)
    return fptr


def _cf_close(fptr):
    status = ctypes.c_int(0)
    CFITSIO.ffclos(fptr, ctypes.byref(status))
    _check(status)


def _cf_read(path):
    """Read full image via real cfitsio as (bitpix, naxes, TUSHORT
    data) — the exact call pattern of readfits :298."""
    fptr = _cf_open(path)
    status = ctypes.c_int(0)
    bitpix = ctypes.c_int()
    naxis = ctypes.c_int()
    naxes = (ctypes.c_long * 3)(1, 1, 1)
    CFITSIO.ffgipr(fptr, 3, ctypes.byref(bitpix), ctypes.byref(naxis),
                   naxes, ctypes.byref(status))
    _check(status)
    n = naxes[0] * naxes[1] * naxes[2]
    arr = np.empty(n, np.uint16)
    first = (ctypes.c_long * 3)(1, 1, 1)
    anynul = ctypes.c_int(0)
    zero = ctypes.c_ushort(0)
    CFITSIO.ffgpxv(fptr, TUSHORT, first, n, ctypes.byref(zero),
                   arr.ctypes.data_as(ctypes.c_void_p),
                   ctypes.byref(anynul), ctypes.byref(status))
    _check(status)
    _cf_close(fptr)
    shape = (naxes[2], naxes[1], naxes[0])
    return bitpix.value, shape, arr.reshape(shape)


def _cf_write(path, bitpix, datatype, arr):
    """Create a FITS image with real cfitsio (ffinit/ffcrim/ffppx)."""
    if os.path.exists(path):
        os.unlink(path)
    fptr = ctypes.c_void_p()
    status = ctypes.c_int(0)
    CFITSIO.ffinit(ctypes.byref(fptr), path.encode(), ctypes.byref(status))
    _check(status)
    c, h, w = arr.shape
    naxes = (ctypes.c_long * 3)(w, h, c)
    CFITSIO.ffcrim(fptr, bitpix, 3 if c > 1 else 2, naxes,
                   ctypes.byref(status))
    _check(status)
    first = (ctypes.c_long * 3)(1, 1, 1)
    buf = np.ascontiguousarray(arr)
    CFITSIO.ffppx(fptr, datatype, first, arr.size,
                  buf.ctypes.data_as(ctypes.c_void_p), ctypes.byref(status))
    _check(status)
    _cf_close(fptr)


def test_cfitsio_reads_our_fits(tmp_path):
    """A siriltpu-written FITS opens in the genuine cfitsio with the
    Siril geometry/bitpix and IDENTICAL pixel values (the USHORT
    BZERO=32768 convention cfitsio applies transparently)."""
    rng = np.random.default_rng(5)
    data = rng.integers(0, 65536, size=(3, 13, 17), dtype=np.uint16)
    p = str(tmp_path / "ours.fit")
    fits_io.write_fits(p, Frame(data))
    bitpix, shape, got = _cf_read(p)
    assert bitpix == SHORT_IMG  # 16-bit with BZERO, savefits convention
    assert shape == (3, 13, 17)
    np.testing.assert_array_equal(got, data)


def test_cfitsio_reads_our_mono_8bit(tmp_path):
    rng = np.random.default_rng(6)
    data = (rng.integers(0, 256, size=(1, 9, 11))).astype(np.uint16)
    p = str(tmp_path / "ours8.fit")
    fits_io.write_fits(p, Frame(data), bitpix=8)
    bitpix, shape, got = _cf_read(p)
    assert bitpix == BYTE_IMG
    assert shape == (1, 9, 11)
    np.testing.assert_array_equal(got, data)


@pytest.mark.parametrize("bitpix,datatype,gen", [
    (BYTE_IMG, TBYTE,
     lambda rng, sh: rng.integers(0, 256, sh).astype(np.uint8)),
    (USHORT_IMG, TUSHORT,
     lambda rng, sh: rng.integers(0, 65536, sh).astype(np.uint16)),
    (SHORT_IMG, TSHORT,
     lambda rng, sh: rng.integers(-32768, 32768, sh).astype(np.int16)),
    (LONG_IMG, TLONG,
     lambda rng, sh: rng.integers(0, 1 << 20, sh).astype(np.int64)),
    (FLOAT_IMG, TFLOAT,
     lambda rng, sh: rng.random(sh).astype(np.float32)),  # [0,1] heuristic
    (DOUBLE_IMG, TDOUBLE,
     lambda rng, sh: (rng.random(sh) * 60000).astype(np.float64)),
])
def test_we_read_cfitsio_fits(tmp_path, bitpix, datatype, gen):
    """Files created by the genuine cfitsio for every reference-ingested
    bitpix (readfits :287-349) load through siriltpu.io.fits with the
    same WORD conversion the reference applies: what cfitsio returns
    for TUSHORT (integer types), the [0,1]*65535 float heuristic
    (:334-348), and the >16-bit rescale."""
    rng = np.random.default_rng(int(abs(bitpix)) + 7)
    arr = gen(rng, (1, 12, 10))
    p = str(tmp_path / f"cf_{abs(bitpix)}.fit")
    _cf_write(p, bitpix, datatype, arr)

    ours = fits_io.read_fits(p).data
    assert ours.dtype == np.uint16
    assert ours.shape == (1, 12, 10)

    if bitpix in (BYTE_IMG, USHORT_IMG):
        # integer types: must equal cfitsio's own TUSHORT view
        # bit-for-bit
        _, _, cf_view = _cf_read(p)
        np.testing.assert_array_equal(ours, cf_view)
    elif bitpix == SHORT_IMG:
        # the reference reads TSHORT into its unsigned WORD buffer
        # (image_format_fits.c:300-303), so negative values WRAP
        # (two's-complement reinterpretation) — matched bit-for-bit.
        # (A TUSHORT read of the same data overflows inside cfitsio,
        # status 412, so the expectation is computed directly.)
        expect = arr.astype(np.int16).view(np.uint16)
        np.testing.assert_array_equal(ours, expect)
    elif bitpix == FLOAT_IMG:
        # [0,1] floats scale by 65535 (readfits :334-348)
        expect = np.clip(np.rint(arr.astype(np.float64) * 65535), 0,
                         65535).astype(np.uint16)
        assert np.abs(ours.astype(int) - expect.astype(int)).max() <= 1
    else:
        assert ours.max() > 0  # rescaled into WORD range


def test_header_keys_visible_to_cfitsio(tmp_path):
    """savefits-style header keys round-trip through the real parser."""
    data = np.full((1, 4, 4), 1234, np.uint16)
    p = str(tmp_path / "hdr.fit")
    fits_io.write_fits(p, Frame(data, {"instrume": "siriltpu"}))
    fptr = _cf_open(p)
    status = ctypes.c_int(0)
    val = ctypes.create_string_buffer(80)
    com = ctypes.create_string_buffer(80)
    CFITSIO.ffgkys(fptr, b"PROGRAM", val, com, ctypes.byref(status))
    _cf_close(fptr)
    if status.value == 0:
        assert b"iril" in val.value or b"IRIL" in val.value.upper()
