"""BASELINE config-5 end-to-end: SER convert -> background extraction ->
register -> rejection stack -> autostretch, on an RGB sequence (reduced
size for CI; the full 6Kx4K path differs only in shapes)."""

import os

import numpy as np
import pytest

from siriltpu.core.frame import Frame, Rect
from siriltpu.io.ser import SerFile, SER_RGB
from siriltpu.io.sequence import ser_sequence
from siriltpu.ops.background import BackgroundParams, subtract_background
from siriltpu.ops.histogram_ops import autostretch, find_midtones_balance
from siriltpu.registration.translation import register_shift_dft
from siriltpu.stacking.api import stack_sequence
from siriltpu.testing.synth import starfield


def build_rgb_ser(path, n=6, h=160, w=200, seed=100):
    rng = np.random.default_rng(seed)
    stars = np.column_stack([
        rng.uniform(20, w - 20, 15), rng.uniform(20, h - 20, 15),
        rng.uniform(6000, 25000, 15), rng.uniform(3, 6, 15)])
    shifts = rng.integers(-6, 7, size=(n, 2))
    shifts[0] = 0
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    gradient = 400 + 3.0 * xx + 2.0 * yy  # sky gradient for bgextract
    ser = SerFile.create(path, width=w, height=h, color_id=SER_RGB)
    for i in range(n):
        mono, _ = starfield(h, w, 15, seed=seed, noise_sigma=0.0,
                            stars=stars, background=0.0,
                            shift=(shifts[i, 0], shifts[i, 1]))
        base = mono[0].astype(np.float64)
        rgb = np.stack([base * 0.9, base * 1.0, base * 0.8]) + gradient
        rgb += rng.normal(0, 6, rgb.shape)
        ser.write_frame(Frame(np.clip(np.rint(rgb), 0, 65535).astype(np.uint16)))
    ser.write_and_close()
    return shifts, stars


def test_config5_full_pipeline(tmp_path):
    d = str(tmp_path)
    ser_path = os.path.join(d, "capture.ser")
    gen_shifts, stars = build_rgb_ser(ser_path)

    # 1. open the SER capture as a sequence
    seq = ser_sequence(ser_path)
    assert seq.nb_layers == 3

    # 2. background extraction per frame -> new FITS sequence
    from siriltpu.io import fits as fits_io
    for i in range(seq.number):
        frame = seq.read_frame(i)
        flat = subtract_background(frame.data,
                                   BackgroundParams(order=1, box=16))
        fits_io.write_fits(os.path.join(d, f"bkg_{i+1:03d}.fit"),
                           Frame(flat, dict(frame.meta)))
    from siriltpu.io.sequence import check_seq
    seqs = {s.seqname: s for s in check_seq(d)}
    bseq = seqs["bkg_"]

    # 3. register (DFT on the green layer)
    rep = register_shift_dft(bseq, 1, Rect(40, 20, 128, 128))
    got = bseq.reg_shifts(1)
    np.testing.assert_array_equal(got[:, 0], -gen_shifts[:, 0])
    np.testing.assert_array_equal(got[:, 1], -gen_shifts[:, 1])

    # 4. rejection stack with normalization
    res = stack_sequence(bseq, method="mean", layer_shifts=1,
                         rejection="winsorized", sig=(3.0, 3.0),
                         normalize="additive_scaling")
    stacked = Frame(res.data)
    assert stacked.nlayers == 3

    # 5. autostretch
    m, lo, hi = find_midtones_balance(stacked.data)
    assert 0.0 < m < 1.0
    out = autostretch(stacked.data)
    fits_io.write_fits(os.path.join(d, "final.fit"), Frame(out))

    # quality checks: stars are aligned & sharp in the stack, and the
    # stretched image has a bright background around the 0.25 target
    g = stacked.data[1].astype(np.float64)
    # brightest true star position (bottom-up coords)
    k = int(np.argmax(stars[:, 2]))
    sx_, sy_ = stars[k, 0], stars[k, 1]
    win = g[int(sy_) - 3 : int(sy_) + 4, int(sx_) - 3 : int(sx_) + 4]
    assert win.max() > 0.5 * stars[k, 2], "stacked star lost flux (misaligned?)"
    med = np.median(out)
    assert 0.08 * 65535 < med < 0.5 * 65535

    # SNR improved vs a single frame: background residual spread shrinks
    one = fits_io.read_fits(os.path.join(d, "bkg_001.fit")).data[1]
    patch = np.s_[5:60, 5:60]
    assert g[patch].std() < one.astype(np.float64)[patch].std()


def test_config5_chain_end_to_end(tmp_path):
    """The BASELINE config-5 chain as ONE call (pipelines/full.py):
    SER convert -> per-frame bgextract -> global-star register ->
    rejection stack -> autostretch -> FITS. Reduced scale; every stage's
    effect is asserted, and the final image equals composing the SAME
    anchored stage functions by hand (the pipeline adds wiring, not
    math)."""
    import numpy as np
    from siriltpu.core.frame import Frame
    from siriltpu.io import fits as fits_io
    from siriltpu.io.ser import SER_RGB, SerFile
    from siriltpu.io.sequence import ser_sequence
    from siriltpu.ops.background import subtract_background
    from siriltpu.ops.histogram_ops import autostretch
    from siriltpu.pipelines.full import config5_pipeline
    from siriltpu.stacking.api import stack_frames
    from siriltpu.testing.synth import starfield

    h, w, nframes = 128, 160, 4
    rng = np.random.default_rng(42)
    base = np.column_stack([
        rng.uniform(20, w - 20, 18), rng.uniform(20, h - 20, 18),
        rng.uniform(9000, 30000, 18), rng.uniform(3.5, 5.5, 18)])
    yy, xx = np.mgrid[0:h, 0:w]
    gradient = 0.06 * (xx * 65535 / w) + 0.03 * (yy * 65535 / h)

    d = str(tmp_path)
    path = f"{d}/lights.ser"
    ser = SerFile.create(path, width=w, height=h, color_id=SER_RGB)
    for i in range(nframes):
        st = base.copy()
        st[:, 0] += [0, 3, -2, 4][i]
        st[:, 1] += [0, -2, 3, 1][i]
        mono, _ = starfield(h, w, 18, seed=42, background=700,
                            noise_sigma=5.0, stars=st)
        frame = np.clip(
            np.repeat(mono.astype(np.float64), 3, axis=0) + gradient[None],
            0, 65535).astype(np.uint16)
        ser.write_frame(Frame(frame))
    ser.write_and_close()

    # order 2: a quartic surface is ill-posed on a 128x160 test image
    # (10x10 overlapping 20-px boxes); real 6K frames use the default 4
    rep = config5_pipeline(path, layer=1, rejection="winsorized",
                           bg_order=2)
    assert rep.frames == nframes
    assert rep.failed == 0 and rep.registered == nframes
    assert set(rep.stage_seconds) == {"convert", "bgextract", "register",
                                      "stack", "autostretch", "save"}
    out = fits_io.read_fits(rep.output_path)
    assert out.data.shape == (3, h, w)

    # autostretch target: background lands near 0.25 * 65535
    # (TARGET_BACKGROUND, histogram.c:33-34)
    med = np.median(out.data)
    assert 0.15 * 65535 < med < 0.40 * 65535

    # the chain == hand-composed stages (same functions the verbs run)
    seq = ser_sequence(path)
    from siriltpu.ops.background import BackgroundParams
    bg_frames = [subtract_background(seq.read_frame(i).data,
                                     BackgroundParams(order=2))
                 for i in range(nframes)]
    rseq = ser_sequence(f"{d}/r_bkg_lights.ser")
    regged = np.stack([rseq.read_frame(i).data for i in range(nframes)])
    res = stack_frames(regged, method="mean", rejection="winsorized")
    want = autostretch(res.data)
    np.testing.assert_array_equal(out.data, want)

    # background gradient actually removed before stacking: the bkg_
    # intermediate's corner-to-corner spread collapses
    bseq = ser_sequence(f"{d}/bkg_lights.ser")
    b0 = bseq.read_frame(0).data[0].astype(np.float64)
    raw0 = seq.read_frame(0).data[0].astype(np.float64)
    def spread(img):
        return abs(np.median(img[:20, :20]) - np.median(img[-20:, -20:]))
    assert spread(b0) < 0.1 * spread(raw0)

    # alignment: stars stay sharp through the stack (the registered
    # stack's peak is close to a single frame's peak)
    assert res.data[1].max() > 0.7 * bg_frames[0][1].max()
