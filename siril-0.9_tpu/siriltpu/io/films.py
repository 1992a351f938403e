"""Film import: AVI (and, when an ffmpeg backend exists, MP4/WEBM/...).

Reference: src/io/films.c (FFMS2-based ``film_open_file`` :66,
``film_read_frame`` :245). This environment has no ffmpeg/FFMS2, so:

- uncompressed DIB AVI files (what the reference's AVI exporter and our
  native writer produce) are demuxed natively with a small RIFF parser;
- other containers go through imageio if a plugin can handle them,
  otherwise a clear error explains the missing backend.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from siriltpu.core.frame import Frame

FILM_EXTENSIONS = ("avi", "mpg", "mpeg", "mp4", "webm", "mov", "mkv")


@dataclass
class FilmFile:
    path: str
    width: int = 0
    height: int = 0
    nb_frames: int = 0
    fps: float = 25.0
    _dib_offsets: List[int] = field(default_factory=list)
    _dib_bpp: int = 24
    _backend: str = "dib"

    @classmethod
    def open(cls, path: str) -> "FilmFile":
        if path.lower().endswith(".avi"):
            try:
                return cls._open_dib_avi(path)
            except ValueError:
                pass
        # fallback: imageio plugin (requires an ffmpeg backend for most)
        try:
            import imageio.v3 as iio
            props = iio.improps(path, index=0)
            meta = iio.immeta(path)
            n = meta.get("nframes") or meta.get("n_frames") or 0
            if not isinstance(n, int) or n <= 0:
                n = len(iio.imread(path, index=None))
            f = cls(path=path, width=props.shape[1], height=props.shape[0],
                    nb_frames=int(n), fps=float(meta.get("fps", 25.0)))
            f._backend = "imageio"
            return f
        except Exception as e:
            raise RuntimeError(
                f"Cannot open film {os.path.basename(path)}: no ffmpeg "
                f"backend available ({e})") from e

    @classmethod
    def _open_dib_avi(cls, path: str) -> "FilmFile":
        """Minimal RIFF demuxer for uncompressed DIB AVIs."""
        size = os.path.getsize(path)
        with open(path, "rb") as f:
            if f.read(4) != b"RIFF":
                raise ValueError("not a RIFF file")
            f.seek(8)
            if f.read(4) != b"AVI ":
                raise ValueError("not an AVI")
            width = height = 0
            fps = 25.0
            offsets: List[int] = []
            bpp = 24
            # walk chunks
            def walk(end):
                nonlocal width, height, fps, bpp
                while f.tell() + 8 <= end:
                    tag = f.read(4)
                    (sz,) = struct.unpack("<I", f.read(4))
                    start = f.tell()
                    if tag == b"LIST":
                        f.read(4)  # list type
                        walk(start + sz)
                    elif tag == b"avih":
                        data = f.read(sz)
                        (uspf,) = struct.unpack_from("<I", data, 0)
                        if uspf:
                            fps = 1e6 / uspf
                        width, height = struct.unpack_from("<II", data, 32)
                    elif tag == b"strf":
                        data = f.read(sz)
                        if sz >= 40:
                            bpp = struct.unpack_from("<H", data, 14)[0]
                    elif tag in (b"00db", b"00dc"):
                        offsets.append(start)
                        f.seek(sz, 1)
                    else:
                        f.seek(sz, 1)
                    if (f.tell() - start) % 2:
                        f.seek(1, 1)  # chunk padding
            walk(size)
            if not offsets or not width:
                raise ValueError("no DIB frames found")
        film = cls(path=path, width=width, height=height,
                   nb_frames=len(offsets), fps=fps)
        film._dib_offsets = offsets
        film._dib_bpp = bpp
        return film

    def read_frame(self, index: int) -> Frame:
        """film_read_frame: returns a bottom-up uint16 Frame."""
        if self._backend == "imageio":
            import imageio.v3 as iio
            arr = np.asarray(iio.imread(self.path, index=index))
            from siriltpu.io.formats import _from_topdown_array
            return _from_topdown_array(arr)
        if index < 0 or index >= self.nb_frames:
            raise IndexError(index)
        w, h = self.width, self.height
        row_bytes = (w * 3 + 3) & ~3
        with open(self.path, "rb") as f:
            f.seek(self._dib_offsets[index])
            raw = np.frombuffer(f.read(row_bytes * h), dtype=np.uint8)
        rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        # DIB rows are bottom-up BGR; our convention is bottom-up RGB
        rgb = rows[..., ::-1].transpose(2, 0, 1).astype(np.uint16)
        if (rgb[0] == rgb[1]).all() and (rgb[1] == rgb[2]).all():
            return Frame(np.ascontiguousarray(rgb[:1]))
        return Frame(np.ascontiguousarray(rgb))


def film_sequence(path: str):
    """Open a film as a Sequence (SEQ_AVI analog)."""
    from siriltpu.core.frame import ImgParam
    from siriltpu.io.sequence import Sequence

    film = FilmFile.open(path)
    base = os.path.basename(path).rsplit(".", 1)[0]

    class _FilmSequence(Sequence):
        def read_frame(self, index):
            frame = film.read_frame(index)
            self._ensure_geometry(frame)
            return frame

        def read_frame_part(self, index, layer, area):
            img = self.read_frame(index).data[layer][::-1]
            return np.ascontiguousarray(
                img[area.y : area.y + area.h, area.x : area.x + area.w])

    seq = _FilmSequence(seqname=base, seqtype="film", number=film.nb_frames,
                        selnum=film.nb_frames,
                        seq_dir=os.path.dirname(os.path.abspath(path)) or ".")
    seq.imgparam = [ImgParam(filenum=i) for i in range(film.nb_frames)]
    seq.rx, seq.ry = film.width, film.height
    return seq


__all__ = ["FilmFile", "film_sequence", "FILM_EXTENSIONS"]
