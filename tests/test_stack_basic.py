"""Sum / max / min stacking: JAX kernels vs the literal C-semantics oracle.
This is the BASELINE config-1 harness (1-LSB acceptance)."""

import numpy as np
import pytest

from siriltpu.ops.stack import stack_max, stack_min, stack_sum
from siriltpu.testing.synth import make_sequence_frames, noise_frame
from siriltpu.verify import oracle


@pytest.fixture(scope="module")
def seq_small():
    frames, _, shifts = make_sequence_frames(7, 32, 40, seed=1)
    return frames, shifts


def test_sum_no_shift_exact():
    frames = np.stack([noise_frame(16, 24, seed=i, mean=30000, sigma=500)
                       for i in range(10)])
    shifts = np.zeros((10, 2), dtype=np.int32)
    got, hi = stack_sum(frames, shifts)
    want, hi_w = oracle.stack_sum(frames, shifts)
    np.testing.assert_array_equal(got, want)
    assert hi == hi_w


def test_sum_with_shifts_exact(seq_small):
    frames, shifts = seq_small
    got, hi = stack_sum(frames, shifts)
    want, hi_w = oracle.stack_sum(frames, shifts)
    np.testing.assert_array_equal(got, want)
    assert hi == hi_w


def test_sum_no_rescale_path():
    """Sum below 65535 is copied unscaled."""
    frames = np.stack([noise_frame(8, 8, seed=i, mean=100, sigma=5)
                       for i in range(3)])
    shifts = np.zeros((3, 2), dtype=np.int32)
    got, hi = stack_sum(frames, shifts)
    want, _ = oracle.stack_sum(frames, shifts)
    np.testing.assert_array_equal(got, want)
    assert hi <= 65535


def test_skip_origin_quirk():
    """Input pixel (0,0) is never accumulated (ii > 0, stacking.c:305)."""
    frames = np.full((2, 1, 4, 4), 100, dtype=np.uint16)
    shifts = np.zeros((2, 2), dtype=np.int32)
    got, _ = stack_sum(frames, shifts)
    assert got[0, 0, 0] == 0  # origin excluded
    assert got[0, 0, 1] == 200


def test_max_exact(seq_small):
    frames, shifts = seq_small
    got = stack_max(frames, shifts)
    want = oracle.stack_max(frames, shifts)
    np.testing.assert_array_equal(got, want)


def test_min_exact(seq_small):
    frames, shifts = seq_small
    got = stack_min(frames, shifts)
    want = oracle.stack_min(frames, shifts)
    np.testing.assert_array_equal(got, want)


def test_sum_rgb():
    frames = np.stack([noise_frame(12, 16, seed=i, nlayers=3, mean=20000,
                                   sigma=1000) for i in range(5)])
    shifts = np.array([[0, 0], [1, -1], [-2, 2], [3, 0], [0, -3]],
                      dtype=np.int32)
    got, _ = stack_sum(frames, shifts)
    want, _ = oracle.stack_sum(frames, shifts)
    np.testing.assert_array_equal(got, want)


def test_sum_chunking_invariance(seq_small):
    frames, shifts = seq_small
    a, _ = stack_sum(frames, shifts, chunk=2)
    b, _ = stack_sum(frames, shifts, chunk=100)
    np.testing.assert_array_equal(a, b)


def test_stack_summary_report():
    # the consolidated report matching _show_summary (stacking.c:1929-2011)
    from siriltpu.stacking.api import stack_summary
    lines = stack_summary(42, "mean", "winsorized", (2.5, 3.0),
                          "additive_scaling")
    assert lines == [
        "Integration of 42 images:",
        "Pixel combination ......... average",
        "Normalization ............. additive + scaling",
        "Pixel rejection ........... Winsorized sigma clipping",
        "Rejection parameters ...... low=2.500 high=3.000",
    ]
    # non-mean methods report normalization/rejection as none
    lines = stack_summary(3, "median", "sigma", (3.0, 3.0), "additive")
    assert lines[1].endswith("median")
    assert lines[2].endswith("none")
    assert lines[3].endswith("none")
    assert lines[4].endswith("none")
    # mean with no rejection still prints the sig parameters
    lines = stack_summary(3, "mean", "none", (3.0, 3.0), "none")
    assert lines[3].endswith("none")
    assert lines[4] == "Rejection parameters ...... low=3.000 high=3.000"
