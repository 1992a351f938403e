"""Star pipeline: wavelets, PSF fit, star finder, photometry, one-star
registration."""

import numpy as np
import pytest

from siriltpu.core.frame import Frame, Rect
from siriltpu.ops.psf import fit_psf_single, fit_psf_batch
from siriltpu.ops.starfind import StarFinderParams, peaker
from siriltpu.ops.wavelets import (TO_PAVE_BSPLINE, TO_PAVE_LINEAR,
                                   atrous_reconstruct, atrous_transform)
from siriltpu.testing.synth import gaussian_star, starfield


# ---------------------------------------------------------------- wavelets

def literal_atrous(img, nplanes, kind):
    """Direct transcription of pave_2d_tfo + smoothing kernels."""
    def test_ind(i, n):
        # compiled reference: negative indexes pin to 0 (the mirror
        # `Val = -ind` in pave.c:92 is commented out; `Val = -0` ships)
        if i < 0:
            return 0
        return min(i, n - 1)

    def smooth(im, plan, taps):
        step = int(round(2.0 ** plan))
        nl, nc = im.shape
        out = np.zeros_like(im)
        for i in range(nl):
            for j in range(nc):
                acc = 0.0
                for oy, wy in taps:
                    for ox, wx in taps:
                        ii = test_ind(i + oy * step, nl)
                        jj = test_ind(j + ox * step, nc)
                        acc += wy * wx * im[ii, jj]
                out[i, j] = acc
        return out

    taps_lin = [(-1, 0.25), (0, 0.5), (1, 0.25)]
    taps_bs = [(-2, 1 / 16), (-1, 4 / 16), (0, 6 / 16), (1, 4 / 16),
               (2, 1 / 16)]
    taps = taps_bs if kind == TO_PAVE_BSPLINE else taps_lin
    cur = img.astype(np.float64)
    planes = []
    for k in range(nplanes - 1):
        sm = smooth(cur, k, taps)
        planes.append(cur - sm)
        cur = sm
    planes.append(cur)
    return np.stack(planes)


@pytest.mark.parametrize("kind", [TO_PAVE_LINEAR, TO_PAVE_BSPLINE])
def test_atrous_vs_literal(kind):
    rng = np.random.default_rng(50)
    img = rng.integers(0, 10000, size=(20, 24)).astype(np.uint16)
    got = np.asarray(atrous_transform(img, 3, kind))
    want = literal_atrous(img, 3, kind)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=0.05)


def test_atrous_reconstruction_identity():
    """Unweighted reconstruction returns the original image."""
    rng = np.random.default_rng(51)
    img = rng.integers(0, 30000, size=(32, 32)).astype(np.uint16)
    tr = atrous_transform(img, 4, TO_PAVE_BSPLINE)
    rec = np.asarray(atrous_reconstruct(tr, np.ones(4, np.float32)))
    np.testing.assert_allclose(rec, img.astype(np.float64), atol=0.5)


# ----------------------------------------------------------------- PSF fit

def test_psf_fit_recovers_gaussian():
    h = w = 24
    # model: B + A exp(-((x-x0)^2/SX + (y-y0)^2/SY)), 1-based coords
    B, A, x0, y0, SX, SY = 500.0, 20000.0, 12.3, 11.6, 9.0, 5.5
    yy, xx = np.mgrid[1 : h + 1, 1 : w + 1].astype(np.float64)
    z = B + A * np.exp(-(((xx - x0) ** 2) / SX + ((yy - y0) ** 2) / SY))
    z = np.clip(np.rint(z), 0, 65535).astype(np.uint16)
    fit = fit_psf_single(z, B, fit_angle=False)
    assert fit is not None
    assert fit["x0"] == pytest.approx(x0, abs=0.05)
    assert fit["y0"] == pytest.approx(y0, abs=0.05)
    assert fit["A"] * 65535.0 == pytest.approx(A, rel=0.02)
    assert fit["B"] * 65535.0 == pytest.approx(B, rel=0.05)
    # symmetry fix guarantees sx >= sy
    assert fit["sx"] >= fit["sy"]
    assert fit["sx"] == pytest.approx(SX, rel=0.05)
    assert fit["sy"] == pytest.approx(SY, rel=0.05)
    # fwhm formula
    assert fit["fwhmx"] == pytest.approx(
        np.sqrt(fit["sx"] / 2) * 2 * np.sqrt(2 * np.log(2)), rel=1e-6)


def test_psf_fit_with_angle():
    h = w = 28
    B, A, x0, y0, SX, SY, ang = 300.0, 15000.0, 14.2, 13.8, 16.0, 6.0, 0.5
    yy, xx = np.mgrid[1 : h + 1, 1 : w + 1].astype(np.float64)
    tx = np.cos(ang) * (xx - x0) - np.sin(ang) * (yy - y0)
    ty = np.sin(ang) * (xx - x0) + np.cos(ang) * (yy - y0)
    z = B + A * np.exp(-((tx ** 2) / SX + (ty ** 2) / SY))
    z = np.clip(np.rint(z), 0, 65535).astype(np.uint16)
    fit = fit_psf_single(z, B, fit_angle=True)
    assert fit is not None
    assert fit["sx"] == pytest.approx(SX, rel=0.1)
    assert fit["sy"] == pytest.approx(SY, rel=0.1)
    # reported angle = -alpha in degrees (PSF.c:512), folded to [-90, 90]
    assert fit["angle"] == pytest.approx(-np.degrees(ang), abs=3.0)


def test_psf_fit_too_small_box():
    z = np.ones((2, 3), dtype=np.uint16)
    assert fit_psf_single(z, 0.0) is None


def test_psf_batch_shapes():
    import jax.numpy as jnp
    boxes = np.stack([
        np.clip(np.rint(1000 + gaussian_star(20, 20, 10, 10, 20000, 6, 6)),
                0, 65535).astype(np.uint16)
        for _ in range(5)])
    fit = fit_psf_batch(jnp.asarray(boxes), jnp.full((5,), 1000.0, jnp.float32))
    assert fit.x0.shape == (5,)
    assert bool(np.all(np.asarray(fit.ok)))


# -------------------------------------------------------------- star finder

def test_peaker_finds_stars():
    h, w = 256, 256
    data, stars = starfield(h, w, 12, seed=52, background=1000,
                            noise_sigma=8.0, amp_range=(8000, 30000),
                            sigma_range=(3.0, 6.0))
    found = peaker(data[0], params=StarFinderParams(radius=10, sigma=1.0,
                                                    roundness=0.5))
    assert len(found) >= 8
    # each found star matches a true star within 1 px (positions top-down:
    # ypos_td = H - 1 - y_bu... the generator works in bottom-up rows)
    true_xy = np.stack([stars[:, 0], stars[:, 1]], axis=1)
    dists = []
    for s in found[:8]:
        pos_bu = np.array([s.xpos, (h - 1) - s.ypos])
        d = np.hypot(*(true_xy - pos_bu).T)
        dists.append(d.min())
        assert d.min() < 2.0, f"star at {s.xpos},{s.ypos} unmatched ({d.min()})"
    # the bulk of isolated stars localize to well under a pixel
    assert np.median(dists) < 0.5


def test_peaker_single_star_subpixel_exact():
    from siriltpu.testing.synth import gaussian_star
    h = w = 64
    x_true, y_true = 30.3, 25.7  # bottom-up coords
    img = 1000.0 + gaussian_star(h, w, x_true, y_true, 20000.0, 5.0, 5.0)
    img = np.clip(np.rint(img), 0, 65535).astype(np.uint16)
    found = peaker(img, params=StarFinderParams(radius=10))
    assert len(found) == 1
    s = found[0]
    assert s.xpos == pytest.approx(x_true, abs=0.05)
    assert (h - 1) - s.ypos == pytest.approx(y_true, abs=0.05)


def test_peaker_sorted_by_magnitude():
    data, _ = starfield(200, 200, 10, seed=53, background=800,
                        noise_sigma=5.0)
    found = peaker(data[0])
    mags = [s.mag for s in found]
    assert mags == sorted(mags)


def test_peaker_empty_image():
    data = np.full((128, 128), 100, dtype=np.uint16)
    rng = np.random.default_rng(1)
    noisy = np.clip(data + rng.normal(0, 2, data.shape), 0,
                    65535).astype(np.uint16)
    found = peaker(noisy)
    assert len(found) == 0


# -------------------------------------------------------------- photometry

def test_robustmean_gaussian():
    from siriltpu.ops.photometry import robustmean
    rng = np.random.default_rng(54)
    x = rng.normal(100.0, 5.0, 500)
    x[::50] = 10000.0  # outliers
    mean, stdev, ret = robustmean(x)
    assert ret == 0
    assert mean == pytest.approx(100.0, abs=1.0)
    # dt estimates the robust scale (~sigma), insensitive to the outliers
    assert stdev == pytest.approx(5.0, rel=0.3)


def test_photometry_magnitude_scale():
    """Doubling the flux must decrease the magnitude by 2.5*log10(2)."""
    from siriltpu.ops.photometry import PhotConfig, get_photometry
    h = w = 80
    cfg = PhotConfig(inner=15, outer=25)
    mags = []
    for amp in (5000.0, 10000.0):
        yy, xx = np.mgrid[1 : h + 1, 1 : w + 1].astype(np.float64)
        z = 100.0 + amp * np.exp(-(((xx - 40) ** 2) + ((yy - 40) ** 2)) / 8.0)
        z = np.clip(np.rint(z), 0, 65535)
        phot = get_photometry(z, 40.0, 40.0, 8.0, cfg)
        assert phot is not None
        mags.append(phot.mag)
    assert mags[0] - mags[1] == pytest.approx(2.5 * np.log10(2.0), abs=0.02)


def test_photometry_aperture_too_big():
    from siriltpu.ops.photometry import PhotConfig, get_photometry
    z = np.full((50, 50), 100.0)
    # sx huge -> aperture radius >= inner -> None
    assert get_photometry(z, 25.0, 25.0, 500.0, PhotConfig()) is None


# ------------------------------------------------------- one-star register

def test_register_onestar():
    from siriltpu.io.sequence import internal_sequence
    from siriltpu.registration.onestar import register_onestar

    h, w = 128, 128
    shifts = [(0, 0), (3, -2), (-4, 5), (2, 2)]
    frames = []
    star_bu = (60.0, 70.0)  # x, y in bottom-up rows
    for dx, dy in shifts:
        img = 800.0 + gaussian_star(h, w, star_bu[0] + dx, star_bu[1] + dy,
                                    20000.0, 7.0, 7.0)
        rng = np.random.default_rng(abs(dx * 10 + dy))
        img = np.clip(np.rint(img + rng.normal(0, 5, img.shape)), 0,
                      65535).astype(np.uint16)
        frames.append(Frame(img[None]))
    seq = internal_sequence(frames)
    # selection box around the star in TOP-DOWN coords
    sel = Rect(int(star_bu[0]) - 20, (h - 1 - int(star_bu[1])) - 20, 40, 40)
    best, fwhm, res = register_onestar(seq, 0, sel)
    got = seq.reg_shifts(0)
    for i, (dx, dy) in enumerate(shifts):
        # content displaced by (+dx, +dy) in bottom-up coords -> aligning
        # shift is (-dx, -dy)
        assert got[i, 0] == -dx, f"frame {i} shiftx {got[i]}"
        assert got[i, 1] == -dy, f"frame {i} shifty {got[i]}"


def test_peaker_batch_matches_per_frame():
    """peaker_batch (one vmapped device program over frames) finds the
    same stars as per-frame peaker on every frame."""
    from siriltpu.ops.starfind import peaker_batch

    rng = np.random.default_rng(21)
    layers = []
    for i in range(4):
        data, _ = starfield(192, 160, 12, seed=100 + i, background=800,
                            noise_sigma=5.0)
        layers.append(data[0])
    layers = np.stack(layers)
    batch = peaker_batch(layers, nmax=256)
    for i in range(4):
        single = peaker(layers[i])
        assert len(batch[i]) == len(single)
        for a, b in zip(batch[i], single):
            assert a.xpos == pytest.approx(b.xpos, abs=1e-4)
            assert a.ypos == pytest.approx(b.ypos, abs=1e-4)
            assert a.mag == pytest.approx(b.mag, abs=1e-5)


def test_peaker_batch_sharded_over_frames_mesh():
    """The batch shards over a frames mesh (8 virtual devices): results
    identical to the unsharded batch — the reference's OpenMP-over-
    frames registration at chip scale (registration.c:276-279)."""
    from siriltpu.ops.starfind import peaker_batch
    from siriltpu.parallel.mesh import make_mesh

    layers = []
    for i in range(8):
        data, _ = starfield(128, 128, 8, seed=300 + i, background=900,
                            noise_sigma=4.0)
        layers.append(data[0])
    layers = np.stack(layers)
    mesh = make_mesh()
    plain = peaker_batch(layers, nmax=128)
    sharded = peaker_batch(layers, nmax=128, mesh=mesh)
    assert [len(s) for s in sharded] == [len(s) for s in plain]
    for ps, ss in zip(plain, sharded):
        for a, b in zip(ps, ss):
            assert a.xpos == pytest.approx(b.xpos, abs=1e-4)
            assert a.mag == pytest.approx(b.mag, abs=1e-5)
