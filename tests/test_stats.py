"""Statistics parity tests: histogram-domain implementation vs literal
brute-force f64 implementations of the C semantics."""

import numpy as np
import pytest

from siriltpu.ops import stats as S
from siriltpu.testing.synth import noise_frame, starfield


def brute_median_hist(data, nullcheck):
    """Literal siril_stats_ushort_median on a 65536-bin GSL histogram."""
    counts = np.bincount(data.reshape(-1), minlength=65536).astype(np.float64)
    counts[65535] = 0.0  # GSL upper-edge drop
    n = (data != 0).sum() if nullcheck else data.size
    total = 0.0
    for i in range(1 if nullcheck else 0, 65536):
        total += counts[i]
        if total > n * 0.5:
            return float(i)
    return 0.0


@pytest.mark.parametrize("nullcheck", [False, True])
def test_median_parity(nullcheck):
    rng = np.random.default_rng(0)
    data = rng.integers(0, 4000, size=(64, 64)).astype(np.uint16)
    data[0, :10] = 0
    st = S.statistics(data, option=S.STATS_BASIC, nullcheck=nullcheck)
    assert st.median == brute_median_hist(data, nullcheck)


def test_mean_sigma_parity():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 65535, size=(32, 48)).astype(np.uint16)
    st = S.statistics(data, option=S.STATS_BASIC)
    x = data.astype(np.float64)
    assert st.mean == pytest.approx(x.mean(), abs=1e-9)
    # population sigma
    assert st.sigma == pytest.approx(np.sqrt((x * x).mean() - x.mean() ** 2), rel=1e-12)
    assert st.min == data.min()
    assert st.max == data.max()


def test_mean_sigma_nullcheck():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 1000, size=(16, 16)).astype(np.uint16)
    data[data < 100] = 0
    st = S.statistics(data, option=S.STATS_BASIC, nullcheck=True)
    good = data[data != 0].astype(np.float64)
    assert st.ngoodpix == good.size
    assert st.mean == pytest.approx(good.mean())


def test_avgdev_mad():
    rng = np.random.default_rng(3)
    data = rng.integers(500, 2000, size=(40, 40)).astype(np.uint16)
    st = S.statistics(data, option=S.STATS_MAIN)
    x = data.astype(np.float64)
    med = st.median
    assert st.avgdev == pytest.approx(np.abs(x - med).mean(), rel=1e-12)
    # MAD via histogram semantics: integer deltas, hist median
    deltas = np.abs(x - med).astype(np.int64)
    mad_brute = brute_median_hist(deltas.astype(np.uint16), False)
    assert st.mad == mad_brute


def test_bwmv_formula():
    rng = np.random.default_rng(4)
    data = rng.integers(500, 2000, size=(30, 30)).astype(np.uint16)
    st = S.statistics(data, option=S.STATS_MAIN)
    x = data.astype(np.float64)
    m, mad = st.median, st.mad
    yi = (x - m) / (9 * mad)
    yi2 = yi * yi
    ai = (np.abs(yi) < 1.0).astype(np.float64)
    up = (ai * (x - m) ** 2 * (1 - yi2) ** 4).sum()
    down = (ai * (1 - yi2) * (1 - 5 * yi2)).sum()
    bwmv = x.size * up / (down * down)
    assert st.sqrtbwmv == pytest.approx(np.sqrt(bwmv), rel=1e-12)


def test_ikss_matches_literal():
    """IKSS histogram-domain result == literal sorted-data iteration
    (statistics.c:152-187)."""
    rng = np.random.default_rng(5)
    data = np.clip(rng.normal(1200, 80, size=(64, 64)), 0, 65535).astype(np.uint16)
    # add outliers
    data[0, 0:5] = 60000

    def literal_ikss(arr):
        d = np.sort(arr.reshape(-1).astype(np.float64) / 65535.0)
        i, j = 0, d.size
        s0 = 1.0
        while True:
            if j - i < 1:
                return 0.0, 0.0
            window = d[i:j]
            n = window.size
            m = (window[(n - 1) // 2] if n % 2 else
                 (window[n // 2 - 1] + window[n // 2]) / 2)
            dl = np.sort(np.abs(window - m))
            mad = (dl[(n - 1) // 2] if n % 2 else (dl[n // 2 - 1] + dl[n // 2]) / 2)
            if mad > 0:
                yi = (window - m) / (9 * mad)
                yi2 = yi * yi
                ai = (np.abs(yi) < 1.0).astype(np.float64)
                up = (ai * (window - m) ** 2 * (1 - yi2) ** 4).sum()
                down = (ai * (1 - yi2) * (1 - 5 * yi2)).sum()
                bwmv = n * up / (down * down)
            else:
                bwmv = 0.0
            s = np.sqrt(bwmv)
            if s < 2e-23:
                return m, 0.0
            if (s0 - s) / s < 10e-6:
                return m, 0.991 * s
            s0 = s
            xlow, xhigh = m - 4 * s, m + 4 * s
            while i < j and d[i] < xlow:
                i += 1
            while j > i and d[j - 1] > xhigh:
                j -= 1

    loc_l, scale_l = literal_ikss(data)
    st = S.statistics(data, option=S.STATS_EXTRA)
    assert st.location == pytest.approx(loc_l * 65535.0, rel=1e-12, abs=1e-9)
    assert st.scale == pytest.approx(scale_l * 65535.0, rel=1e-12, abs=1e-9)


def test_fn_noise1_literal():
    """Vectorized FnNoise1 == literal per-row translation."""
    rng = np.random.default_rng(6)
    data = np.clip(rng.normal(1000, 25, size=(24, 40)), 0, 65535).astype(np.uint16)

    def literal(a):
        ny, nx = a.shape
        sig = []
        for r in range(ny):
            row = a[r].astype(np.float64)
            d = row[:-1] - row[1:]
            nvals = d.size
            mean = d.mean()
            std = np.sqrt(max((d * d).mean() - mean * mean, 0))
            if std > 0:
                for _ in range(3):
                    keep = np.abs(d - mean) < 5.0 * std
                    if keep.sum() == nvals:
                        break
                    d = d[keep]
                    nvals = d.size
                    mean = d.mean()
                    std = np.sqrt(max((d * d).mean() - mean * mean, 0))
            sig.append(std)
        sd = np.sort(sig)
        n = len(sd)
        return 0.70710678 * (sd[(n - 1) // 2] + sd[n // 2]) / 2

    got = S.fn_noise1(data)
    assert got == pytest.approx(literal(data), rel=1e-10)


def test_statistics_selection():
    from siriltpu.core.frame import Rect
    rng = np.random.default_rng(7)
    data = rng.integers(0, 5000, size=(50, 60)).astype(np.uint16)
    sel = Rect(x=5, y=10, w=20, h=15)
    st = S.statistics(data, selection=sel, option=S.STATS_BASIC)
    sub = data[50 - 10 - 15 : 50 - 10, 5 : 25]
    assert st.total == sub.size
    assert st.mean == pytest.approx(sub.astype(np.float64).mean())


def test_statistics_starfield_sane():
    data, _ = starfield(256, 256, 5, seed=8, background=800, noise_sigma=15)
    st = S.statistics(data[0], option=S.STATS_EXTRA)
    assert 780 < st.median < 830
    assert st.bgnoise == pytest.approx(15.0, rel=0.3)
    assert 780 < st.location < 830
    assert st.scale == pytest.approx(15.0, rel=0.35)


def test_img_stats_noise_parity():
    """img_stats_noise (vectorized FnNoise5) vs the literal per-pixel
    transcription, incl. nullcheck, constant regions, tiny widths."""
    from siriltpu.ops.stats import img_stats_noise
    from siriltpu.verify.oracle import fn_noise5

    rng = np.random.default_rng(42)
    cases = []
    img = np.clip(rng.normal(1200, 80, (30, 50)), 0, 65535).astype(np.uint16)
    cases.append((img, False))
    # constant runs trigger the skip branches
    img2 = img.copy()
    img2[5:9, 10:40] = 777
    img2[12, ::2] = 777
    cases.append((img2, False))
    # nullcheck with scattered zeros
    img3 = img.copy()
    img3[rng.random(img.shape) < 0.15] = 0
    cases.append((img3, True))
    # one row mostly null (fewer than 9 valid pixels)
    img4 = img.copy()
    img4[3, 8:] = 0
    cases.append((img4, True))
    # tiny width -> flattened single-row, and width < 9 even flattened
    cases.append((img[:2, :4].copy(), False))
    cases.append((np.array([[5, 0, 9]], dtype=np.uint16), True))

    for i, (m, nc) in enumerate(cases):
        got = img_stats_noise(m, nullcheck=nc)
        want = fn_noise5(m, nullcheck=nc)
        assert got[0] == want[0], f"case {i} ngood {got[0]} != {want[0]}"
        assert got[1:3] == want[1:3], f"case {i} min/max"
        for g, w in zip(got[3:], want[3:]):
            assert g == pytest.approx(w, abs=1e-12), f"case {i} noise"
    # sanity: on gaussian noise, noise3 approximates sigma
    g = np.clip(rng.normal(5000, 100, (200, 300)), 0, 65535).astype(np.uint16)
    n = img_stats_noise(g)
    assert 85 < n[4] < 115
