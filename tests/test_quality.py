import numpy as np
import pytest




def test_find_centre_barycentre():
    """find_centre vs a literal per-pixel transcription of
    _FindCentre_Barycentre (quality.c:361-426)."""
    from siriltpu.ops.quality import find_centre

    def literal(a, thr):
        h, w = a.shape
        x1, y1, x2, y2 = 2, 0, w - 3, h - 1
        x1, y1 = max(x1, 1), max(y1, 1)
        x2, y2 = min(x2, w - 2), min(y2, h - 2)
        cnt, xt, yt = 0, 0.0, 0.0
        for y in range(y1, y2 + 1):
            for x in range(x1, x2 + 1):
                if (a[y, x] >= thr and a[y, x-1] >= thr and a[y, x+1] >= thr
                        and a[y-1, x] >= thr and a[y+1, x] >= thr):
                    xt += x; yt += y; cnt += 1
        if cnt < 50:
            return None
        return xt / cnt + 0.5, h - (yt / cnt + 0.5)

    rng = np.random.default_rng(21)
    a = np.clip(rng.normal(3000, 400, (40, 60)), 0, 65535).astype(np.uint16)
    # bright blob offset from center
    yy, xx = np.mgrid[0:40, 0:60]
    a = np.where((yy - 25)**2 + (xx - 18)**2 < 80, 30000, a).astype(np.uint16)
    got = find_centre(a)
    want = literal(a.astype(np.int64), 40 * 256)
    assert got is not None and want is not None
    assert got == pytest.approx(want, abs=1e-12)
    # blob x should be near 18, y (bottom-up flip applied by both)
    assert abs(got[0] - 18) < 1.5

    # too few pixels above threshold -> None
    dim = np.full((30, 30), 100, np.uint16)
    assert find_centre(dim) is None

    # 8-bit data uses the unscaled threshold
    b = np.zeros((30, 30), np.uint16)
    b[10:20, 10:20] = 50
    got8 = find_centre(b, eightbit=True)
    want8 = literal(b.astype(np.int64), 40)
    assert got8 == pytest.approx(want8, abs=1e-12)
    assert find_centre(b, eightbit=False) is None
