"""Golden suite 23: the reference's OWN MP4/WEBM exporter
(src/io/mp4_output.c, compiled whole-TU by parity_harness/harness_mp4.c
against the same system libavformat/libavcodec our film bridge links).

The golden embeds the input WORD frames plus the H.264 MP4 and VP9 WEBM
files the COMPILED REFERENCE produced from them. The tests prove:

1. siriltpu's film decoder ingests the reference's own exports
   (geometry, frame count, content fidelity);
2. siriltpu's FilmEncoder is parameter-equivalent: same container/codec
   family, same geometry/fps/frame count, comparable rate/fidelity on
   identical input.

Requires the libav film bridge; skipped if it cannot build.
"""

import os
import struct

import numpy as np
import pytest

from siriltpu.io import film_codec

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "c_mp4.bin")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(GOLDEN) and film_codec.available()),
    reason="c_mp4.bin or libav bridge unavailable")


def _load():
    buf = open(GOLDEN, "rb").read()
    assert buf[:4] == b"MP4G"
    nf, nl, h, w = struct.unpack_from("<IIII", buf, 4)
    fps, = struct.unpack_from("<d", buf, 20)
    quality, = struct.unpack_from("<I", buf, 28)
    off = 32
    frames = np.frombuffer(buf, "<u2", nf * nl * h * w, off)
    frames = frames.reshape(nf, nl, h, w).copy()
    off += 2 * nf * nl * h * w
    n1, = struct.unpack_from("<I", buf, off)
    off += 4
    mp4 = buf[off:off + n1]
    off += n1
    n2, = struct.unpack_from("<I", buf, off)
    off += 4
    webm = buf[off:off + n2]
    assert off + n2 == len(buf)
    return nf, nl, h, w, fps, quality, frames, mp4, webm


def _expected_rgb8(frame_chw):
    """fill_rgb_image's WORD→BYTE map with default cutoffs lo=0
    hi=65535 (mp4_output.c:225-276) + the bottom-up → top-down flip."""
    img8 = np.clip(frame_chw.astype(np.float64) * (255.0 / 65535.0)
                   + 0.5, 0, 255).astype(np.uint8)
    return img8.transpose(1, 2, 0)[::-1]


@pytest.mark.parametrize("which", ["mp4", "webm"])
def test_decode_reference_export(tmp_path, which):
    nf, nl, h, w, fps, quality, frames, mp4, webm = _load()
    p = str(tmp_path / f"ref.{which}")
    with open(p, "wb") as f:
        f.write(mp4 if which == "mp4" else webm)
    dec = film_codec.FilmDecoder(p)
    assert (dec.width, dec.height) == (w, h)
    # the reference writes zero-duration packets; the mp4 muxer then
    # under-counts the track duration (N-1 frame periods), so the
    # declared rate reads high (N/(N-1)·fps) and the edit list may
    # clip the final frame — REFERENCE bugs our encoder does not share
    # (film_codec.cpp sets frame/packet durations). Accept the skewed
    # rate for the reference file; test_our_encoder_equivalent pins
    # the exact fps for ours.
    assert fps <= dec.fps <= fps * nf / (nf - 1) + 0.01
    assert dec.nb_frames in (nf, nf - 1)
    for i in (0, dec.nb_frames - 1):
        got = dec.read(i).astype(np.float64)
        want = _expected_rgb8(frames[i]).astype(np.float64)
        # heavy lossy compression at the reference's tiny bitrate
        # ((q+1)*w*h/2 bps): structural agreement, not pixel equality
        assert got.shape == want.shape
        err = np.abs(got - want).mean()
        assert err < 48.0, f"{which} frame {i}: mean |err| {err:.1f}"
        # luminance correlation proves it is the same scene
        cc = np.corrcoef(got.mean(-1).ravel(), want.mean(-1).ravel())[0, 1]
        assert cc > 0.8, f"{which} frame {i}: corr {cc:.3f}"
    dec.close()


@pytest.mark.parametrize("which", ["mp4", "webm"])
def test_our_encoder_equivalent_to_reference(tmp_path, which):
    """Encoding the SAME frames with siriltpu's FilmEncoder (reference
    parameter set) produces an equivalent stream: same codec family and
    geometry, all frames retained, fidelity at least as good."""
    nf, nl, h, w, fps, quality, frames, mp4, webm = _load()
    ours_p = str(tmp_path / f"ours.{which}")
    enc = film_codec.FilmEncoder(ours_p, w, h, fps, nl, quality=quality)
    for i in range(nf):
        enc.add_frame(_expected_rgb8(frames[i]))
    enc.close()

    ref_p = str(tmp_path / f"ref.{which}")
    with open(ref_p, "wb") as f:
        f.write(mp4 if which == "mp4" else webm)

    ours = film_codec.FilmDecoder(ours_p)
    ref = film_codec.FilmDecoder(ref_p)
    assert (ours.width, ours.height) == (ref.width, ref.height)
    assert ours.nb_frames == nf          # no dropped last frame
    assert ours.fps == pytest.approx(fps, rel=0.02)

    def mean_err(dec, i):
        got = dec.read(i).astype(np.float64)
        return np.abs(got - _expected_rgb8(frames[i])).mean()

    # fidelity: ours within 1.5x of the reference's error on the first
    # frame (same bitrate formula; codec versions differ slightly)
    e_ours = mean_err(ours, 0)
    e_ref = mean_err(ref, 0)
    assert e_ours <= max(1.5 * e_ref, 8.0), (e_ours, e_ref)
    ours.close()
    ref.close()
