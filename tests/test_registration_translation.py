"""Translation registration: DFT phase correlation, ECC, quality estimate.
BASELINE config-3 math (FFT shift registration on planetary sequences)."""

import numpy as np
import pytest

from siriltpu.core.frame import Frame, Rect
from siriltpu.ops.fftreg import register_shift_frames
from siriltpu.ops.quality import (QUALTYPE_NINOX, QUALTYPE_NORMAL,
                                  quality_estimate, quality_estimate_batch)
from siriltpu.testing.synth import make_sequence_frames, starfield


# --------------------------------------------------------------- quality

def literal_quality(layer, qtype=QUALTYPE_NORMAL):
    """Literal transcription of QualityEstimate (quality.c:46-218)
    including the buggy maxp insert — validates the derived semantics."""
    MAXP = 6
    buffer = np.asarray(layer, dtype=np.int64)
    height, width = buffer.shape
    region_w, region_h = width - 1, height - 1
    dval = 0.0
    subsample = 3
    while subsample <= 5:
        xs = region_w // subsample
        ys = region_h // subsample
        if xs < 2 or ys < 2:
            break
        y_last = (ys - 1) * subsample
        maxp = [0] * MAXP
        buf = np.zeros(ys * xs, dtype=np.int64)
        n = 0
        # first row
        for x in range(xs):
            box = buffer[0:subsample, x * subsample:(x + 1) * subsample]
            buf[n] = box.sum() // (subsample * subsample)
            n += 1
        # middle rows with maxp tracking
        y = subsample
        while y < y_last:
            for x in range(xs):
                box = buffer[y:y + subsample, x * subsample:(x + 1) * subsample]
                v = int(box.sum() // (subsample * subsample))
                if v > maxp[2] and v < 65530:
                    if v > maxp[0]:
                        slot = 0
                    elif v > maxp[1]:
                        slot = 1
                    else:
                        slot = 2
                    for j in range(MAXP - 1, slot, -1):
                        maxp[j] = maxp[j - 1]
                        maxp[j] = v
                buf[n] = v
                n += 1
            y += subsample
        # last row
        for x in range(xs):
            box = buffer[y:y + subsample, x * subsample:(x + 1) * subsample]
            buf[n] = box.sum() // (subsample * subsample)
            n += 1
        mx = sum(maxp[3:6]) // 3
        if mx > 0:
            mult = 60000.0 / mx
            buf = np.minimum((buf.astype(np.float64) * mult).astype(np.int64),
                             65535)
        img = buf.reshape(ys, xs)
        # smooth
        sm = np.zeros_like(img)
        for yy in range(1, ys - 1):
            for xx in range(1, xs - 1):
                sm[yy, xx] = img[yy - 1:yy + 2, xx - 1:xx + 2].sum() // 9
        # gradient
        yb = int(ys * 0.1) + 1
        xb = int(xs * 0.1) + 1
        thresh = 40 << 8
        mp = np.zeros((ys, xs), dtype=bool)
        pixels = 0
        avg = 0.0
        for yy in range(yb, ys - yb):
            for xx in range(xb, xs - xb):
                if sm[yy, xx] >= thresh:
                    mp[yy - 1:yy + 2, xx - 1:xx + 2] = True
                    pixels += 1
                    avg += sm[yy, xx]
        if pixels == 0:
            q = -1.0
        else:
            avg /= pixels
            val = 0.0
            cnt = 0
            for yy in range(yb, ys - yb):
                for xx in range(xb, xs - xb):
                    if mp[yy, xx]:
                        d1 = float(sm[yy, xx]) - float(sm[yy, xx + 1]) if xx + 1 < xs else float(sm[yy, xx])
                        d2 = float(sm[yy, xx]) - float(sm[yy + 1, xx]) if yy + 1 < ys else float(sm[yy, xx])
                        if qtype == QUALTYPE_NINOX:
                            val += abs(d1) + abs(d2)
                        else:
                            val += d1 * d1 + d2 * d2
                        cnt += 1
            val /= cnt
            q = (val * 50.0 / avg) if qtype == QUALTYPE_NINOX else val / 10.0
        if qtype == QUALTYPE_NINOX:
            dval += q
        else:
            dval += q * ((3 * 3) // (subsample * subsample))
        while True:
            subsample += 1
            if not (width // subsample == xs and height // subsample == ys):
                break
    return float(np.sqrt(dval)) if dval >= 0 else float("nan")


@pytest.mark.parametrize("qtype", [QUALTYPE_NORMAL, QUALTYPE_NINOX])
def test_quality_vs_literal(qtype):
    data, _ = starfield(96, 120, 10, seed=21, background=500,
                        noise_sigma=20.0, amp_range=(20000, 50000))
    got = quality_estimate(data[0], qtype)
    want = literal_quality(data[0], qtype)
    assert got == pytest.approx(want, rel=1e-12)


def test_quality_no_signal_nan():
    """Zero image: no stretch, nothing reaches the threshold, gradient
    returns -1, sqrt(-1) = NaN (reference behavior)."""
    data = np.zeros((64, 64), dtype=np.uint16)
    assert np.isnan(quality_estimate(data))


def test_quality_uniform_bright_zero():
    """A uniform image stretches to 60000 (above threshold) but has zero
    gradient energy -> quality 0."""
    data = np.full((64, 64), 100, dtype=np.uint16)
    assert quality_estimate(data) == 0.0


def test_quality_batch_close():
    import jax.numpy as jnp
    frames, _, _ = make_sequence_frames(4, 100, 100, seed=22, noise_sigma=10.0)
    got = np.asarray(quality_estimate_batch(jnp.asarray(frames[:, 0])))
    want = np.array([quality_estimate(frames[i, 0]) for i in range(4)])
    np.testing.assert_allclose(got, want, rtol=1e-3)


# ---------------------------------------------------------- DFT registration

def test_phase_correlation_recovers_shifts():
    n, h, w = 6, 128, 128
    rng = np.random.default_rng(30)
    gen_shifts = rng.integers(-10, 11, size=(n, 2))
    gen_shifts[0] = 0
    frames, _, _ = make_sequence_frames(n, h, w, seed=30, shifts=gen_shifts,
                                        noise_sigma=5.0)
    sel = Rect(0, 0, 128, 128)
    sx, sy = register_shift_frames(frames[0, 0], frames[:, 0])
    # content displaced by +d -> aligning shift is -d
    np.testing.assert_array_equal(sx, -gen_shifts[:, 0])
    np.testing.assert_array_equal(sy, -gen_shifts[:, 1])


def test_register_dft_sequence_and_stack(tmp_path):
    """End to end: register a shifted sequence, stack with the recovered
    shifts, compare against stacking with ground-truth shifts."""
    from siriltpu.io import fits as fits_io
    from siriltpu.io.sequence import check_seq
    from siriltpu.registration.translation import register_shift_dft
    from siriltpu.stacking.api import stack_frames

    n, h, w = 8, 96, 96
    rng = np.random.default_rng(31)
    gen_shifts = rng.integers(-6, 7, size=(n, 2))
    gen_shifts[0] = 0
    frames, _, _ = make_sequence_frames(n, h, w, seed=31, shifts=gen_shifts,
                                        noise_sigma=4.0)
    d = str(tmp_path)
    for i in range(n):
        fits_io.write_fits(f"{d}/pl{i+1:02d}.fit", Frame(frames[i]))
    seq = check_seq(d)[0]
    rep = register_shift_dft(seq, 0, Rect(16, 16, 64, 64))
    got_shifts = seq.reg_shifts(0)
    np.testing.assert_array_equal(got_shifts[:, 0], -gen_shifts[:, 0])
    np.testing.assert_array_equal(got_shifts[:, 1], -gen_shifts[:, 1])
    # qualities normalized to [0,1]
    q = [seq.regparam[0][i].quality for i in range(n)]
    assert max(q) == pytest.approx(1.0)
    assert min(q) == pytest.approx(0.0)
    # stack with recovered shifts == stack with ground truth
    res = stack_frames(frames, method="mean", shifts=got_shifts,
                       rejection="sigma", sig=(3.0, 3.0))
    want = stack_frames(frames, method="mean", shifts=-gen_shifts,
                        rejection="sigma", sig=(3.0, 3.0))
    np.testing.assert_array_equal(res.data, want.data)


def test_dft_requires_square_selection():
    from siriltpu.ops.fftreg import register_shift_frames
    with pytest.raises(ValueError):
        register_shift_frames(np.zeros((32, 16), np.uint16),
                              np.zeros((1, 32, 16), np.uint16))


# ------------------------------------------------------------------- ECC

def test_ecc_recovers_translation():
    from siriltpu.ops.ecc import ecc_find_translation
    h, w = 96, 96
    # bright, 8-bit-range planetary disk (survives the u8 saturation)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    disk = 200.0 / (1 + np.exp((np.hypot(yy - 48, xx - 48) - 25)))
    rng = np.random.default_rng(33)
    ref = np.clip(disk + rng.normal(0, 2, (h, w)) + 20, 0, 255).astype(np.uint16)
    d = (3, -2)  # displacement (dy, dx)
    img = np.roll(ref, d, axis=(0, 1))
    dx, dy, rho = ecc_find_translation(ref, img)
    assert rho > 0.9
    assert dx == pytest.approx(d[1], abs=0.15)
    assert dy == pytest.approx(d[0], abs=0.15)


def test_register_ecc_sequence():
    from siriltpu.io.sequence import internal_sequence
    from siriltpu.registration.translation import register_ecc

    h, w = 80, 80
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    disk = 180.0 / (1 + np.exp((np.hypot(yy - 40, xx - 40) - 18)))
    rng = np.random.default_rng(34)
    base = np.clip(disk + 30 + rng.normal(0, 2, (h, w)), 0, 255).astype(np.uint16)
    shifts = [(0, 0), (2, 1), (-3, 2), (1, -2)]
    frames = [Frame(np.roll(base, (sy, sx), axis=(0, 1))[None])
              for sx, sy in [(s[1], s[0]) for s in shifts]]
    # note: np.roll((dy, dx)) displaces content by (+dy, +dx)
    frames = [Frame(np.roll(base, (dy, dx), axis=(0, 1))[None])
              for dy, dx in shifts]
    seq = internal_sequence(frames)
    rep = register_ecc(seq, 0)
    assert rep.failed == 0
    got = seq.reg_shifts(0)
    for i, (dy, dx) in enumerate(shifts):
        assert got[i, 0] == -dx, f"frame {i} shiftx"
        assert got[i, 1] == -dy, f"frame {i} shifty"
