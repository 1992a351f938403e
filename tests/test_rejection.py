"""Rejection stacking: vectorized JAX kernels vs the literal C-semantics
oracle (per-pixel loops). Covers BASELINE configs 2 and 3 math."""

import numpy as np
import pytest

from siriltpu.ops.rejection import reject_and_mean, masked_median
from siriltpu.stacking.api import compute_normalization, stack_frames
from siriltpu.utils.rounding import np_round_to_word
from siriltpu.verify import oracle


def random_vectors(f, p, seed, outliers=True):
    rng = np.random.default_rng(seed)
    base = rng.normal(1000, 50, size=(f, p))
    if outliers:
        mask = rng.random((f, p)) < 0.08
        base = np.where(mask, rng.uniform(0, 20000, size=(f, p)), base)
    return np.clip(np.rint(base), 0, 65535).astype(np.uint16)


def oracle_mean(vec, rejection, sig):
    surv = oracle.reject_pixel(vec, rejection, sig)
    return int(np_round_to_word(surv.astype(np.float64).sum() / surv.size))


@pytest.mark.parametrize("rejection", ["sigma", "sigmedian", "winsorized",
                                       "linearfit", "percentile", "none"])
def test_rejection_parity(rejection):
    sig = (0.2, 0.1) if rejection == "percentile" else (2.5, 2.5)
    f, p = 15, 257
    seeds = {"sigma": 1, "sigmedian": 2, "winsorized": 3, "linearfit": 4,
             "percentile": 5, "none": 6}
    vals = random_vectors(f, p, seed=seeds[rejection])
    import jax.numpy as jnp
    got, rejl, rejh = reject_and_mean(jnp.asarray(vals, jnp.float32),
                                      rejection, sig)
    got = np.asarray(got)
    mism = 0
    for j in range(p):
        want = oracle_mean(vals[:, j], rejection, sig)
        if abs(int(got[j]) - want) > 1:
            mism += 1
    assert mism == 0, f"{mism}/{p} pixels differ by >1 LSB"


@pytest.mark.parametrize("rejection", ["sigma", "winsorized"])
def test_rejection_exact_majority(rejection):
    """Most pixels should be bit-exact (f32 vs f64 differences only at
    rounding boundaries)."""
    sig = (3.0, 3.0)
    f, p = 25, 200
    vals = random_vectors(f, p, seed=7)
    import jax.numpy as jnp
    got, _, _ = reject_and_mean(jnp.asarray(vals, jnp.float32), rejection, sig)
    got = np.asarray(got)
    exact = sum(int(got[j]) == oracle_mean(vals[:, j], rejection, sig)
                for j in range(p))
    assert exact >= p - 2


def test_small_n_guard():
    """N <= 3 never iterates (while n>0 && N>3)."""
    vals = np.array([[100], [200], [50000]], dtype=np.uint16)
    import jax.numpy as jnp
    got, _, _ = reject_and_mean(jnp.asarray(vals, jnp.float32), "sigma", (1.0, 1.0))
    want = oracle_mean(vals[:, 0], "sigma", (1.0, 1.0))
    assert int(got[0]) == want


def test_median_kernel_parity():
    f, p = 12, 100
    vals = random_vectors(f, p, seed=3)
    import jax.numpy as jnp
    got = np.asarray(masked_median(jnp.asarray(vals, jnp.float32)))
    s = np.sort(vals.astype(np.float64), axis=0)
    want = ((s[f // 2 - 1] + s[f // 2]) / 2).astype(np.uint16)
    np.testing.assert_array_equal(got, want)


def test_stack_mean_rejection_full():
    """Full blockwise driver vs literal oracle, with shifts."""
    rng = np.random.default_rng(11)
    f, c, h, w = 9, 1, 12, 14
    frames = np.clip(rng.normal(2000, 100, (f, c, h, w)), 0,
                     65535).astype(np.uint16)
    frames[3, 0, 5, 5] = 60000  # outlier
    shifts = rng.integers(-2, 3, size=(f, 2)).astype(np.int32)
    res = stack_frames(frames, method="mean", shifts=shifts,
                       rejection="sigma", sig=(3.0, 3.0), block_rows=5)
    want = oracle.stack_mean_rejection(frames, shifts, "sigma", (3.0, 3.0))
    diff = np.abs(res.data.astype(int) - want.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_stack_mean_rejection_normalized():
    rng = np.random.default_rng(13)
    f, c, h, w = 8, 1, 10, 10
    base = rng.normal(1500, 60, (1, c, h, w))
    gains = rng.uniform(0.7, 1.4, f)
    offs = rng.uniform(-100, 200, f)
    frames = np.clip(base * gains[:, None, None, None] +
                     offs[:, None, None, None], 0, 65535).astype(np.uint16)
    shifts = np.zeros((f, 2), dtype=np.int32)

    from siriltpu.ops.stats import statistics, STATS_EXTRA
    stats = [statistics(frames[i], 0, option=STATS_EXTRA) for i in range(f)]
    coeffs = compute_normalization(stats, 0, "additive_scaling")

    res = stack_frames(frames, method="mean", shifts=shifts,
                       rejection="winsorized", sig=(3.0, 3.0),
                       normalize="additive_scaling", coeffs=coeffs)
    want = oracle.stack_mean_rejection(frames, shifts, "winsorized",
                                       (3.0, 3.0), "additive_scaling", coeffs)
    diff = np.abs(res.data.astype(int) - want.astype(int))
    assert diff.max() <= 1


def test_stack_median_full():
    rng = np.random.default_rng(17)
    frames = np.clip(rng.normal(3000, 500, (10, 1, 8, 9)), 0,
                     65535).astype(np.uint16)
    res = stack_frames(frames, method="median")
    want = oracle.stack_median(frames)
    np.testing.assert_array_equal(res.data, want)


def test_rejection_percent_reporting():
    rng = np.random.default_rng(19)
    frames = np.clip(rng.normal(2000, 100, (10, 1, 16, 16)), 0,
                     65535).astype(np.uint16)
    frames[2] = 50000  # whole frame outlier
    res = stack_frames(frames, method="mean", rejection="sigma",
                       sig=(3.0, 3.0))
    lo, hi = res.rejection_percent(0)
    assert hi > 5.0  # the outlier frame got rejected
    assert 0 <= lo < 5.0


def test_stack_sequence_streaming_matches_inmemory(tmp_path):
    """Bounded-memory streaming path (partial reads, y-shift folded into
    the read window) equals the in-memory path, FITS and SER."""
    import os
    from siriltpu.core.frame import Frame
    from siriltpu.io import fits as fits_io
    from siriltpu.io.sequence import check_seq, ser_sequence
    from siriltpu.io.ser import SerFile
    from siriltpu.io.seqfile import write_seqfile
    from siriltpu.core.frame import RegData
    from siriltpu.stacking.api import stack_sequence
    from siriltpu.testing.synth import make_sequence_frames

    d = str(tmp_path)
    frames, _, shifts = make_sequence_frames(6, 24, 32, seed=33)
    for i, f in enumerate(frames):
        fits_io.write_fits(os.path.join(d, f"st{i+1:02d}.fit"), Frame(f))
    seq = check_seq(d)[0]
    seq.regparam[0] = [RegData(shiftx=int(-shifts[i, 0]),
                               shifty=int(-shifts[i, 1]))
                       for i in range(6)]
    a = stack_sequence(seq, method="mean", rejection="sigma",
                       stream=False)
    b = stack_sequence(seq, method="mean", rejection="sigma",
                       stream=True, block_rows=7)
    np.testing.assert_array_equal(a.data, b.data)
    assert a.rejection_low.sum() == b.rejection_low.sum()
    m1 = stack_sequence(seq, method="median", stream=False)
    m2 = stack_sequence(seq, method="median", stream=True, block_rows=5)
    np.testing.assert_array_equal(m1.data, m2.data)

    # SER container too
    ser = SerFile.create(os.path.join(d, "v.ser"), width=32, height=24)
    for f in frames:
        ser.write_frame(Frame(f))
    ser.write_and_close()
    sseq = ser_sequence(os.path.join(d, "v.ser"))
    sseq.regparam[0] = seq.regparam[0]
    s1 = stack_sequence(sseq, method="mean", rejection="winsorized",
                        stream=False)
    s2 = stack_sequence(sseq, method="mean", rejection="winsorized",
                        stream=True, block_rows=9)
    np.testing.assert_array_equal(s1.data, s2.data)


def test_early_break_with_carried_rejections():
    """Regression: the N-r<=4 early-break scan walks only the compacted
    survivor stack (stacking.c:1684-1688); already-removed slots must not
    trigger phantom breaks once r carries over from earlier passes."""
    import jax.numpy as jnp
    vec = np.array([65535, 65535, 65523, 65535, 65519, 65535, 65520,
                    65532, 65507, 65534], dtype=np.uint16)
    got, _, _ = reject_and_mean(jnp.asarray(vec[:, None], jnp.float32),
                                "winsorized", (3.0, 3.0))
    assert int(got[0]) == oracle_mean(vec, "winsorized", (3.0, 3.0)) == 65535


@pytest.mark.parametrize("rejection", ["sigma", "sigma_masked",
                                       "winsorized", "sigmedian"])
def test_rejection_hard_values(rejection):
    """Near-saturation ties and zero-filled borders (shifted stacks):
    exact vs oracle (winsorized/linearfit run centered on an integer
    anchor to escape f32 ulp(65535) granularity)."""
    rng = np.random.default_rng(0)
    F, P = 10, 600
    suites = [
        np.where(rng.random((F, P)) < 0.3, 65535,
                 np.clip(65535 - rng.exponential(20, (F, P)), 65400,
                         65535)).astype(np.uint16),
        np.where(rng.random((F, P)) < 0.3, 0,
                 np.clip(rng.normal(990, 10, (F, P)), 0,
                         65535)).astype(np.uint16),
    ]
    import jax.numpy as jnp
    orej = "sigma" if rejection == "sigma_masked" else rejection
    for vals in suites:
        got, _, _ = reject_and_mean(jnp.asarray(vals, jnp.float32),
                                    rejection, (3.0, 3.0))
        got = np.asarray(got)
        nbad = sum(abs(int(got[j]) - oracle_mean(vals[:, j], orej,
                                                 (3.0, 3.0))) > 1
                   for j in range(P))
        assert nbad == 0


def test_linearfit_only_ties_deviate():
    """Precision-boundary contract (PARITY.md round-2 section): on real
    starfield data, every device-vs-oracle linearfit disagreement must be
    an EXACT TIE — a pixel whose residual/sigma ratio sits within 1e-9 of
    the clip threshold in the f64 oracle (where the C's own answer is
    double-rounding noise). Any disagreement with a real margin is a bug.
    """
    import numpy as np
    from siriltpu.testing.synth import make_sequence_frames
    from siriltpu.verify import oracle

    import jax.numpy as jnp

    frames, _, _ = make_sequence_frames(8, 32, 32, seed=7,
                                        shifts=np.zeros((8, 2), int))
    flat = frames[:, 0].reshape(8, -1)
    sig = (2.0, 1.5)
    gm, _, _ = reject_and_mean(jnp.asarray(flat, jnp.float32),
                               "linearfit", sig)
    gm = np.asarray(gm)
    real_bugs = []
    nties = 0
    for pidx in range(flat.shape[1]):
        surv, _ = oracle.c_reject_block(flat[:, pidx], "linearfit", sig)
        with np.errstate(all="ignore"):
            want = (oracle._round_word(
                surv.astype(np.float64).sum() / surv.size)
                if surv.size else 0)
        if int(gm[pidx]) == want:
            continue
        # disagreement: measure the minimum threshold margin across the
        # oracle's passes
        stack = [int(v) for v in flat[:, pidx]]
        N = len(stack)
        rejected = [0] * N
        crej = [0, 0]
        r = 0
        mmin = np.inf
        while True:
            stack.sort()
            b, a = oracle.gsl_fit_linear(stack)
            s = np.float64(0.0)
            for f_ in range(N):
                s += np.float64(abs(np.float64(stack[f_])
                                    - (a * np.float64(f_) + b)))
            s = float(s / np.float64(N))
            if s > 0:
                for i, v in enumerate(stack):
                    lo = (a * np.float64(i) + b - np.float64(v)) \
                        / np.float64(s) - sig[0]
                    hi = (np.float64(v) - a * np.float64(i) - b) \
                        / np.float64(s) - sig[1]
                    mmin = min(mmin, abs(lo), abs(hi))
            n = 0
            NN = N
            for frame in range(NN):
                rejected[frame] = oracle._line_clipping(
                    stack[frame], sig, s, frame, a, b, crej)
                if rejected[frame]:
                    r += 1
                if NN - r <= 4:
                    break
            frame = 0
            j = 0
            while frame < NN - n:
                if rejected[j] != 0:
                    del stack[frame]
                    frame -= 1
                    n += 1
                frame += 1
                j += 1
            N -= n
            if not (n > 0 and N > 3):
                break
        if mmin < 1e-9:
            nties += 1
        else:
            real_bugs.append((pidx, flat[:, pidx].tolist(), mmin))
    assert not real_bugs, \
        f"non-tie linearfit mismatches (real bugs): {real_bugs[:3]}"


def test_linearfit_stack_hybrid_hard_values():
    """stack_frames with linearfit runs the hybrid fixup: pathological
    near-saturated stacks (PARITY.md 7a's 8-LSB flip territory) come out
    exact vs the f64 oracle, counters included."""
    import numpy as np
    from siriltpu.stacking.api import stack_frames
    from siriltpu.verify import oracle
    from siriltpu.utils.rounding import np_round_to_word

    rng = np.random.default_rng(8)
    F, h, w = 10, 8, 24
    frames = np.where(rng.random((F, 1, h, w)) < 0.3, 65535,
                      np.clip(65535 - rng.exponential(20, (F, 1, h, w)),
                              65400, 65535)).astype(np.uint16)
    sig = (3.0, 3.0)
    res = stack_frames(frames, method="mean", rejection="linearfit", sig=sig)
    want_rl = want_rh = 0
    for y in range(h):
        for x in range(w):
            surv, crej = oracle.c_reject_block(
                frames[:, 0, y, x], "linearfit", sig)
            want = (np_round_to_word(
                surv.astype(np.float64).sum() / surv.size)
                if surv.size else 0)
            assert int(res.data[0, y, x]) == int(want), (y, x)
            want_rl += crej[0]
            want_rh += crej[1]
    assert int(res.rejection_low[0]) == want_rl
    assert int(res.rejection_high[0]) == want_rh
