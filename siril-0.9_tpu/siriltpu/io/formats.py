"""Host-side image format support beyond FITS/SER.

Reference: src/io/image_formats_internal.c (BMP/PPM/PGM/PNM/PIC) and
src/io/image_formats_libraries.c (TIFF/JPG/PNG/RAW via libtiff/libjpeg/
libpng/libraw). Here: BMP and PNM are written natively; TIFF/JPG/PNG go
through Pillow/imageio; DSLR RAW decoding is gated on rawpy availability
(not in this environment — the conversion subsystem reports it).

All writers take bottom-up Frames and emit top-down files.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

from siriltpu.core.frame import Frame
from siriltpu.utils.rounding import np_round_to_byte


def _to_display8(frame: Frame) -> np.ndarray:
    """uint16 -> uint8 via the conv_to_BYTE scale (utils.c:84-91)."""
    x = frame.data.astype(np.float64)
    out = (x / 65535.0) * 255.0
    return out.astype(np.uint8)


def save_bmp(path: str, frame: Frame) -> None:
    """BMP writer (image_formats_internal.c savebmp)."""
    img8 = _to_display8(frame)
    c, h, w = img8.shape
    if c == 1:
        rgb = np.repeat(img8, 3, axis=0)
    else:
        rgb = img8
    # BMP stores BGR bottom-up — our data is already bottom-up
    bgr = rgb[::-1].transpose(1, 2, 0)  # (h, w, 3) B,G,R
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    with open(path, "wb") as f:
        f.write(header)
        f.write(info)
        pad = b"\x00" * (row_size - w * 3)
        for row in range(h):
            f.write(bgr[row].tobytes())
            f.write(pad)


def save_pnm(path: str, frame: Frame) -> None:
    """PPM/PGM 16-bit writer (image_formats_internal.c saveppm/pgm)."""
    data = frame.data[:, ::-1, :]  # top-down
    c, h, w = data.shape
    if not path.endswith((".ppm", ".pgm", ".pnm")):
        path += ".ppm" if c == 3 else ".pgm"
    with open(path, "wb") as f:
        if c == 3:
            f.write(f"P6\n{w} {h}\n65535\n".encode())
            f.write(data.transpose(1, 2, 0).astype(">u2").tobytes())
        else:
            f.write(f"P5\n{w} {h}\n65535\n".encode())
            f.write(data[0].astype(">u2").tobytes())


def load_pnm(path: str) -> Frame:
    with open(path, "rb") as f:
        magic = f.readline().strip()
        line = f.readline()
        while line.startswith(b"#"):
            line = f.readline()
        w, h = map(int, line.split())
        maxval = int(f.readline())
        dt = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
        if magic == b"P6":
            raw = np.fromfile(f, dtype=dt, count=w * h * 3)
            data = raw.reshape(h, w, 3).transpose(2, 0, 1)
        elif magic == b"P5":
            raw = np.fromfile(f, dtype=dt, count=w * h)
            data = raw.reshape(1, h, w)
        else:
            raise ValueError(f"unsupported PNM magic {magic}")
    return Frame(np.ascontiguousarray(
        data.astype(np.uint16)[:, ::-1, :]))


def save_tiff(path: str, frame: Frame, bits: int = 16) -> None:
    from PIL import Image
    data = frame.data[:, ::-1, :]
    if bits == 8:
        data = _to_display8(Frame(frame.data))[:, ::-1, :]
    arr = data[0] if data.shape[0] == 1 else data.transpose(1, 2, 0)
    if not path.endswith((".tif", ".tiff")):
        path += ".tif"
    if bits == 16 and arr.ndim == 3:
        # Pillow lacks native 16-bit RGB; fall back to imageio
        import imageio.v3 as iio
        iio.imwrite(path, arr.astype(np.uint16))
        return
    Image.fromarray(arr).save(path)


def load_tiff(path: str) -> Frame:
    import imageio.v3 as iio
    arr = np.asarray(iio.imread(path))
    return _from_topdown_array(arr)


def save_jpg(path: str, frame: Frame, quality: int = 100) -> None:
    from PIL import Image
    img8 = _to_display8(frame)[:, ::-1, :]
    arr = img8[0] if img8.shape[0] == 1 else img8.transpose(1, 2, 0)
    if not path.endswith((".jpg", ".jpeg")):
        path += ".jpg"
    Image.fromarray(arr).save(path, quality=quality)


def load_any(path: str) -> Optional[Frame]:
    """Best-effort loader for conversion inputs (PNG/JPG/TIFF/BMP/PNM)."""
    low = path.lower()
    if low.endswith((".pnm", ".ppm", ".pgm")):
        return load_pnm(path)
    if low.endswith((".fit", ".fits", ".fts")):
        from siriltpu.io.fits import read_fits
        return read_fits(path)
    try:
        import imageio.v3 as iio
        arr = np.asarray(iio.imread(path))
    except Exception:
        return None
    return _from_topdown_array(arr)


def _from_topdown_array(arr: np.ndarray) -> Frame:
    if arr.ndim == 2:
        data = arr[None]
    else:
        data = arr[..., :3].transpose(2, 0, 1)
    if data.dtype == np.uint8:
        data = data.astype(np.uint16)  # BYTE values kept as-is (readfits rule)
    elif data.dtype != np.uint16:
        data = np.clip(data, 0, 65535).astype(np.uint16)
    return Frame(np.ascontiguousarray(data[:, ::-1, :]))


__all__ = ["save_bmp", "save_pnm", "load_pnm", "save_tiff", "load_tiff",
           "save_jpg", "load_any"]


def load_pic(path: str) -> Frame:
    """IRIS PIC reader (image_formats_internal.c:653-780): 290-byte
    header, magic 0x31fc/0x0122, u16 LE geometry at offsets 68/70,
    nbplane at 92; plane-sequential uint16 data in file (bottom-up) order."""
    with open(path, "rb") as f:
        header = f.read(290)
        if len(header) != 290:
            raise ValueError("truncated PIC header")
        m0, m1 = struct.unpack_from("<HH", header, 0)
        if not (m0 == 0x31FC and m1 == 0x0122):
            raise ValueError("Wrong magic cookie in PIC file")
        w, h = struct.unpack_from("<HH", header, 68)
        nbplane = struct.unpack_from("<H", header, 92)[0]
        if nbplane not in (1, 3):
            raise ValueError(f"PIC with {nbplane} planes not supported")
        raw = np.fromfile(f, dtype="<u2", count=w * h * nbplane)
    if raw.size != w * h * nbplane:
        raise ValueError("truncated PIC data")
    return Frame(raw.reshape(nbplane, h, w).astype(np.uint16))


def save_pic(path: str, frame: Frame) -> None:
    """PIC writer (for round-trip tests; the reference is read-only)."""
    header = bytearray(290)
    struct.pack_into("<HH", header, 0, 0x31FC, 0x0122)
    struct.pack_into("<HH", header, 68, frame.rx, frame.ry)
    struct.pack_into("<H", header, 92, frame.nlayers)
    with open(path, "wb") as f:
        f.write(bytes(header))
        frame.data.astype("<u2").tofile(f)
