"""Frame filtering criteria and FOLLOW_STAR framing."""

import numpy as np
import pytest

from siriltpu.core.frame import Frame, Rect, RegData
from siriltpu.io.sequence import internal_sequence
from siriltpu.stacking.api import filter_indices
from siriltpu.testing.synth import gaussian_star, noise_frame


def make_seq_with_reg(fwhms, qualities):
    frames = [Frame(noise_frame(8, 8, seed=i)) for i in range(len(fwhms))]
    seq = internal_sequence(frames)
    seq.regparam[0] = [RegData(fwhm=f, quality=q)
                       for f, q in zip(fwhms, qualities)]
    return seq


def test_filter_all_and_included():
    seq = make_seq_with_reg([3, 4, 5], [0.9, 0.5, 0.1])
    assert filter_indices(seq, filter_type="all") == [0, 1, 2]
    seq.set_included(1, False)
    assert filter_indices(seq, filter_type="included") == [0, 2]


def test_filter_best_fwhm():
    """Keep the best (smallest-FWHM) percentile. The reference threshold is
    val[(int)(percent*N/100)] over all N sorted values
    (compute_highest_accepted_fwhm, stacking.c:2275), so at an exact integer
    boundary (40% of 5 -> index 2) a third frame is included."""
    seq = make_seq_with_reg([2.0, 3.0, 4.0, 5.0, 6.0], [1] * 5)
    got = filter_indices(seq, filter_type="best_fwhm", param=40.0)
    assert got == [0, 1, 2]
    got = filter_indices(seq, filter_type="best_fwhm", param=100.0)
    assert got == [0, 1, 2, 3, 4]


def test_filter_best_quality():
    seq = make_seq_with_reg([1] * 5, [0.2, 0.9, 0.5, 0.7, 0.1])
    got = filter_indices(seq, filter_type="best_quality", param=40.0)
    assert sorted(got) == [1, 3]


def test_filter_best_respects_incl():
    """stack_filter_fwhm/quality require imgparam[i].incl
    (stacking.c:2192-2213): excluded frames never pass, but their values
    still participate in the threshold computation (stacking.c:2248-2309)."""
    seq = make_seq_with_reg([2.0, 3.0, 4.0, 5.0, 6.0], [1] * 5)
    seq.set_included(0, False)
    got = filter_indices(seq, filter_type="best_fwhm", param=40.0)
    assert got == [1, 2]  # threshold still val[2]=4.0; frame 0 excluded
    seq2 = make_seq_with_reg([1] * 5, [0.2, 0.9, 0.5, 0.7, 0.1])
    seq2.set_included(1, False)
    got = filter_indices(seq2, filter_type="best_quality", param=40.0)
    assert got == [3]


def test_filter_requires_regdata():
    seq = make_seq_with_reg([1], [1])
    seq.regparam.clear()
    with pytest.raises(ValueError):
        filter_indices(seq, filter_type="best_fwhm", param=50)


def test_follow_star_framing():
    """FOLLOW_STAR re-centers the box on the found star
    (sequence.c:1657-1660), tracking a drifting star beyond the original
    box."""
    from siriltpu.registration.onestar import seqpsf

    h, w = 128, 128
    frames = []
    positions = [(40.0, 60.0), (48.0, 64.0), (56.0, 68.0), (64.0, 72.0)]
    for (sx, sy) in positions:
        img = 500.0 + gaussian_star(h, w, sx, sy, 20000.0, 6.0, 6.0)
        frames.append(Frame(np.clip(np.rint(img), 0, 65535).astype(np.uint16)[None]))
    seq = internal_sequence(frames)
    # 30x30 box centered on the first position (top-down coords)
    sel = Rect(40 - 15, (h - 1 - 60) - 15, 30, 30)
    res_follow = seqpsf(seq, 0, sel, follow_star=True)
    assert all(r.ok for r in res_follow)
    for r, (sx, sy) in zip(res_follow, positions):
        # xpos = x0 + area.x with 1-based fit coords (sequence.c:1652):
        # absolute x reads one high; the y conversion cancels the offset.
        # Differences (what registration uses) are unaffected.
        assert r.xpos == pytest.approx(sx + 1, abs=0.5)
        assert (h - 1) - r.ypos == pytest.approx(sy, abs=0.5)
    # without follow, the last frame's star (24 px away) is outside the box
    res_fixed = seqpsf(seq, 0, sel, follow_star=False)
    last = res_fixed[-1]
    assert (not last.ok) or abs(last.xpos - positions[-1][0]) > 2.0
