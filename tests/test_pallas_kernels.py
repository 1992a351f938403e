"""Pallas fused kernels — interpret-mode parity on the CPU test backend.
(On TPU the same kernel was verified bit-identical to the window kernel
and runs the whole sort+clip+mean in VMEM.)"""

import numpy as np
import pytest

from siriltpu.ops.pallas.reject_stack import sigma_stack_pallas
from siriltpu.ops.rejection import reject_and_mean


def test_sigma_stack_pallas_interpret_parity():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    F, P = 25, 512
    vals = rng.integers(900, 1100, size=(F, P)).astype(np.uint16)
    vals[2, ::5] = 50000
    vals[7, 1::9] = 0
    got = np.asarray(sigma_stack_pallas(jnp.asarray(vals), 3.0, 3.0,
                                        tile=256, interpret=True))
    want, _, _ = reject_and_mean(jnp.asarray(vals), "sigma", (3.0, 3.0))
    np.testing.assert_array_equal(got, np.asarray(want))


def test_sigma_stack_pallas_pow2_frames():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    F, P = 64, 256
    vals = rng.integers(0, 65535, size=(F, P)).astype(np.uint16)
    got = np.asarray(sigma_stack_pallas(jnp.asarray(vals), 2.0, 2.0,
                                        tile=256, interpret=True))
    want, _, _ = reject_and_mean(jnp.asarray(vals), "sigma", (2.0, 2.0))
    np.testing.assert_array_equal(got, np.asarray(want))


@pytest.mark.parametrize("F", [7, 12, 50, 100])
def test_sigma_stack_pallas_pruned_network_parity(F):
    """The network is pruned to pairs below n_rows=ceil(F/8)*8 (the
    pad-wire no-op argument); every frame count must still match the
    reference window kernel exactly, including full-range data with
    real 65535 values (ties with the pad sentinel)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(100 + F)
    P = 256
    vals = rng.integers(0, 65536, size=(F, P)).astype(np.uint16)
    vals[:2, ::7] = 65535
    got = np.asarray(sigma_stack_pallas(jnp.asarray(vals), 3.0, 3.0,
                                        tile=256, interpret=True))
    want, _, _ = reject_and_mean(jnp.asarray(vals), "sigma", (3.0, 3.0))
    np.testing.assert_array_equal(got, np.asarray(want))


# ------------------------------------------------ fused rejection family

@pytest.mark.parametrize("rejection", ["winsorized", "percentile",
                                       "sigmedian"])
@pytest.mark.parametrize("F", [12, 25, 64])
def test_reject_stack_pallas_family_parity(rejection, F):
    """The fused winsorized/percentile/sigmedian kernels must match the
    golden-anchored HBM kernels exactly (same integer-sum statistics,
    same iteration structure)."""
    import jax.numpy as jnp

    from siriltpu.ops.pallas.reject_stack import reject_stack_pallas

    rng = np.random.default_rng(40 + F)
    P = 512
    vals = rng.integers(800, 1200, size=(F, P)).astype(np.uint16)
    vals[1, ::4] = 60000          # hot outliers
    vals[3, 2::7] = 0             # cold outliers
    vals[:2, ::11] = 65535        # pad-sentinel ties
    sig = (0.2, 0.2) if rejection == "percentile" else (2.5, 2.5)
    got = np.asarray(reject_stack_pallas(jnp.asarray(vals), rejection,
                                         sig[0], sig[1], tile=256,
                                         interpret=True))
    want, _, _ = reject_and_mean(jnp.asarray(vals).astype(jnp.float32)
                                 if rejection != "sigma" else
                                 jnp.asarray(vals), rejection, sig)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_reject_stack_pallas_degenerate_fallback():
    """Columns engineered to hit the reference's mid-scan break
    (N - r <= 4) must be flagged degenerate and re-run through the
    exact masked kernel — the fused result equals the exact hybrid
    bit-for-bit even on the degenerate path."""
    import jax.numpy as jnp

    from siriltpu.ops.pallas.reject_stack import (_reject_stack_raw,
                                                  reject_stack_pallas)

    rng = np.random.default_rng(9)
    F, P = 25, 256
    vals = rng.integers(1000, 1100, size=(F, P)).astype(np.uint16)
    # degenerate columns: geometric spread keeps clipping pass after
    # pass until the scan hits the N - r <= 4 break (verified to flag
    # under reject_sigma_window); the random columns never do
    for c in range(0, P, 17):
        vals[:, c] = np.geomspace(1, 65535, F).astype(np.uint16)
    _, degen, _, _ = _reject_stack_raw(jnp.asarray(vals), "sigma",
                                       2.5, 2.5, 256, True)
    ndeg = int((np.asarray(degen) != 0).sum())
    assert 0 < ndeg <= 16, ndeg
    got = np.asarray(reject_stack_pallas(jnp.asarray(vals), "sigma",
                                         2.5, 2.5, tile=256,
                                         interpret=True))
    want, _, _ = reject_and_mean(jnp.asarray(vals), "sigma", (2.5, 2.5))
    np.testing.assert_array_equal(got, np.asarray(want))


def test_reject_stack_pallas_winsorized_degenerate():
    import jax.numpy as jnp

    from siriltpu.ops.pallas.reject_stack import reject_stack_pallas

    rng = np.random.default_rng(10)
    F, P = 25, 256
    vals = rng.integers(500, 700, size=(F, P)).astype(np.uint16)
    for c in range(0, P, 13):
        vals[:, c] = np.geomspace(1, 65535, F).astype(np.uint16)
    got = np.asarray(reject_stack_pallas(jnp.asarray(vals), "winsorized",
                                         2.0, 2.0, tile=256,
                                         interpret=True))
    want, _, _ = reject_and_mean(
        jnp.asarray(vals).astype(jnp.float32), "winsorized", (2.0, 2.0))
    np.testing.assert_array_equal(got, np.asarray(want))


def test_reject_stack_pallas_winsorized_f1000():
    """The config-3 frame count (1000, stacking.c:1710-1748) through the
    FLAT phase-machine winsorized loop: bit-exact vs the HBM hybrid,
    counters included. The flat loop replaced the nested while that
    crashed Mosaic's lowering at F>=896 (the _F_MAX=768 ceiling);
    interpret mode pins its semantics at full config-3 scale."""
    import jax.numpy as jnp

    from siriltpu.ops.pallas.reject_stack import reject_stack_pallas

    rng = np.random.default_rng(55)
    F, P = 1000, 256
    vals = rng.integers(800, 1200, size=(F, P)).astype(np.uint16)
    vals[1, ::4] = 60000
    vals[3, 2::7] = 0
    vals[:2, ::11] = 65535
    mean, rejl, rejh = reject_stack_pallas(
        jnp.asarray(vals), "winsorized", 3.0, 3.0, tile=128,
        interpret=True, with_counters=True)
    want, wl, wh = reject_and_mean(
        jnp.asarray(vals).astype(jnp.float32), "winsorized", (3.0, 3.0))
    np.testing.assert_array_equal(np.asarray(mean), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(rejl), np.asarray(wl))
    np.testing.assert_array_equal(np.asarray(rejh), np.asarray(wh))


@pytest.mark.parametrize("rejection", ["sigma", "winsorized",
                                       "percentile", "sigmedian"])
def test_reject_stack_pallas_counters_parity(rejection):
    """with_counters returns the same rejlow/rejhigh as the HBM kernels
    (window movements for sigma/winsorized incl. the degenerate exact
    fallback; flag counts for percentile; per-pass accumulation for
    sigmedian)."""
    import jax.numpy as jnp

    from siriltpu.ops.pallas.reject_stack import reject_stack_pallas

    rng = np.random.default_rng(77)
    F, P = 25, 512
    vals = rng.integers(800, 1200, size=(F, P)).astype(np.uint16)
    vals[1, ::4] = 60000
    vals[3, 2::7] = 0
    for c in range(0, P, 31):            # a few degenerate columns
        vals[:, c] = np.geomspace(1, 65535, F).astype(np.uint16)
    sig = (0.2, 0.2) if rejection == "percentile" else (2.5, 2.5)
    mean, rejl, rejh = reject_stack_pallas(
        jnp.asarray(vals), rejection, sig[0], sig[1], tile=256,
        interpret=True, with_counters=True)
    want, wl, wh = reject_and_mean(
        jnp.asarray(vals) if rejection == "sigma"
        else jnp.asarray(vals).astype(jnp.float32), rejection, sig)
    np.testing.assert_array_equal(np.asarray(mean), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(rejl), np.asarray(wl))
    np.testing.assert_array_equal(np.asarray(rejh), np.asarray(wh))


def test_median_stack_pallas_matches_hbm():
    """The fused median branch returns the HBM path's GSL sorted median
    (mean of the two middle order statistics, C-truncated to WORD) —
    bit-for-bit, odd and even frame counts, incl. extreme columns."""
    import jax.numpy as jnp

    from siriltpu.ops.pallas.reject_stack import reject_stack_pallas
    from siriltpu.ops.rejection import _gsl_median, sort_axis0

    rng = np.random.default_rng(5)
    for F in (24, 25):
        P = 512
        vals = rng.integers(0, 65536, size=(F, P)).astype(np.uint16)
        vals[:, 0] = 0
        vals[:, 1] = 65535
        vals[:, 2::61] = np.geomspace(1, 65535, F).astype(np.uint16)[:, None]
        got = reject_stack_pallas(jnp.asarray(vals), "median", 0.0, 0.0,
                                  tile=256, interpret=True)
        sv = sort_axis0(jnp.asarray(vals).astype(jnp.float32))
        valid = jnp.ones((F, P), dtype=bool)
        n = jnp.full((P,), F, jnp.int32)
        want = _gsl_median(sv, valid, n).astype(jnp.uint16)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_reject_and_mean_tpu_route_padding(monkeypatch):
    """The TPU routing inside reject_and_mean lane-pads the pixel axis
    to a tile multiple and slices it back; simulate the route on CPU
    (interpret mode) and pin it against the plain HBM path, odd P."""
    import functools

    import jax.numpy as jnp

    import siriltpu.ops.pallas.reject_stack as rs

    monkeypatch.setattr(rs, "_on_tpu", lambda: True)
    real = rs.reject_stack_pallas
    monkeypatch.setattr(
        rs, "reject_stack_pallas",
        functools.partial(real, interpret=True))

    rng = np.random.default_rng(5)
    F, P = 12, 500                    # pads to 512
    vals = rng.integers(700, 1300, size=(F, P)).astype(np.uint16)
    vals[2, ::9] = 55000
    for rej in ("sigma", "winsorized", "percentile", "sigmedian"):
        sig = (0.2, 0.2) if rej == "percentile" else (2.5, 2.5)
        v = (jnp.asarray(vals) if rej == "sigma"
             else jnp.asarray(vals).astype(jnp.float32))
        got = reject_and_mean(v, rej, sig)
        monkeypatch.setattr(rs, "_on_tpu", lambda: False)
        want = reject_and_mean(v, rej, sig)
        monkeypatch.setattr(rs, "_on_tpu", lambda: True)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


# ------------------------------------------------ reject_stack_auto routing

def _auto_env(monkeypatch, rs):
    """Pretend the backend is a TPU and isolate the process memos."""
    monkeypatch.setattr(rs, "_on_tpu", lambda: True)
    monkeypatch.setattr(rs, "_OK_SHAPES", set())
    monkeypatch.setattr(rs, "_OOM_SHAPES", set())
    monkeypatch.setattr(rs, "_RUNTIME_DISABLED", set())


def test_auto_deferred_oom_walks_tiles(monkeypatch):
    """A scoped-VMEM OOM that only surfaces at CONSUMPTION (axon defers
    Pallas compiles past dispatch) must be caught by the first-call
    validation sync and retried at the next smaller tile."""
    import jax.numpy as jnp
    import siriltpu.ops.pallas.reject_stack as rs

    _auto_env(monkeypatch, rs)
    vals = jnp.zeros((16, 512), jnp.uint16)
    calls = []

    class _Deferred:
        """Array whose first element access raises like a deferred
        Mosaic compile (np.asarray-time scoped-VMEM OOM)."""
        def __getitem__(self, i):
            raise RuntimeError(
                "Scoped allocation ... exceeded scoped vmem limit ... "
                "out of memory in memory space vmem")

    def fake_pallas(v, rejection, lo, hi, tile, with_counters=False):
        calls.append(tile)
        if tile > 128:
            return _Deferred()
        return jnp.full((512,), 7, jnp.uint16)

    monkeypatch.setattr(rs, "reject_stack_pallas", fake_pallas)
    out = rs.reject_stack_auto(vals, "sigma", 3.0, 3.0)
    assert out is not None and int(out[0]) == 7
    assert calls == sorted(calls, reverse=True) and calls[-1] == 128
    assert ("sigma", 16, 128, 512) in rs._OK_SHAPES
    assert not rs._RUNTIME_DISABLED


def test_auto_oom_at_smallest_tile_memoizes_shape(monkeypatch):
    import jax.numpy as jnp
    import siriltpu.ops.pallas.reject_stack as rs

    _auto_env(monkeypatch, rs)
    vals = jnp.zeros((16, 512), jnp.uint16)

    def always_oom(v, rejection, lo, hi, tile, with_counters=False):
        raise RuntimeError("exceeded scoped vmem limit: out of memory "
                           "in memory space vmem")

    monkeypatch.setattr(rs, "reject_stack_pallas", always_oom)
    assert rs.reject_stack_auto(vals, "sigma", 3.0, 3.0) is None
    assert ("sigma", 16) in rs._OOM_SHAPES
    assert not rs._RUNTIME_DISABLED  # other frame counts stay fused
    # memoized: the second call must not attempt any compile
    monkeypatch.setattr(rs, "reject_stack_pallas",
                        lambda *a, **k: pytest.fail("compile retried"))
    assert rs.reject_stack_auto(vals, "sigma", 3.0, 3.0) is None


def test_auto_transient_error_does_not_disable(monkeypatch):
    import jax.numpy as jnp
    import siriltpu.ops.pallas.reject_stack as rs

    _auto_env(monkeypatch, rs)
    vals = jnp.zeros((16, 512), jnp.uint16)

    def transient(v, rejection, lo, hi, tile, with_counters=False):
        raise RuntimeError("RESOURCE_EXHAUSTED: HBM full of other arrays")

    monkeypatch.setattr(rs, "reject_stack_pallas", transient)
    assert rs.reject_stack_auto(vals, "sigma", 3.0, 3.0) is None
    assert not rs._RUNTIME_DISABLED and not rs._OOM_SHAPES


def test_auto_compiler_crash_condemns_shape_not_rejection(monkeypatch):
    """A remote-compile hard failure (HTTP 500 / tpu_compile_helper
    crash — seen both as a per-shape Mosaic crash and as a wedged
    tunnel) must fall back for THIS frame count only: the shape is
    memoized like an OOM, and the fused kernel stays enabled for other
    frame counts."""
    import jax.numpy as jnp
    import siriltpu.ops.pallas.reject_stack as rs

    _auto_env(monkeypatch, rs)
    vals = jnp.zeros((16, 512), jnp.uint16)

    def crash(v, rejection, lo, hi, tile, with_counters=False):
        raise RuntimeError(
            "INTERNAL: http://127.0.0.1:8083/remote_compile: HTTP 500: "
            "tpu_compile_helper subprocess exit code 1")

    monkeypatch.setattr(rs, "reject_stack_pallas", crash)
    assert rs.reject_stack_auto(vals, "winsorized", 3.0, 3.0) is None
    assert ("winsorized", 16) in rs._OOM_SHAPES
    assert not rs._RUNTIME_DISABLED
    # other frame counts still attempt the fused kernel
    ok = jnp.full((512,), 3, jnp.uint16)
    monkeypatch.setattr(rs, "reject_stack_pallas",
                        lambda *a, **k: ok)
    out = rs.reject_stack_auto(jnp.zeros((24, 512), jnp.uint16),
                               "winsorized", 3.0, 3.0)
    assert out is not None and int(out[0]) == 3


def test_auto_force_skips_tracers(monkeypatch):
    """Under an outer jit trace the result is abstract: _force must
    decline (no ConcretizationTypeError, no disable_fused) and the
    shape must NOT be marked validated."""
    import jax
    import jax.numpy as jnp
    import siriltpu.ops.pallas.reject_stack as rs
    from siriltpu.ops.rejection import reject_and_mean

    rng = np.random.default_rng(5)
    vals = jnp.asarray(rng.integers(900, 1100, (16, 512)).astype(np.uint16))
    # reference BEFORE patching _on_tpu — afterwards reject_and_mean
    # itself would route through the fused path and validate the shape
    want, _, _ = reject_and_mean(vals, "sigma", (3.0, 3.0))

    _auto_env(monkeypatch, rs)
    # interpret=True so the real kernel runs on the CPU test backend
    real = rs.reject_stack_pallas
    monkeypatch.setattr(
        rs, "reject_stack_pallas",
        lambda v, rej, lo, hi, tile, with_counters=False: real(
            v, rej, lo, hi, tile=tile, interpret=True,
            with_counters=with_counters))

    @jax.jit
    def run(v):
        return rs.reject_stack_auto(v, "sigma", 3.0, 3.0)

    out = run(vals)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
    assert not rs._RUNTIME_DISABLED
    assert not rs._OK_SHAPES  # traced first call cannot validate


def test_pick_tile_caps_and_budget():
    """pick_tile respects the measured per-rejection tile caps (sigma
    1024 — 4% faster than 2048 at the north-star shape), the VMEM
    budget (tiles shrink as F grows), and the F ceilings (winsorized
    F>1024 -> None, HBM path; the strip-reduction body lifted the
    full-height stack ceiling of 896, which itself lifted the
    nested-lowering crash ceiling of 768)."""
    from siriltpu.ops.pallas.reject_stack import pick_tile

    P = 4096 * 4096
    assert pick_tile(100, "sigma", P) == 1024          # capped, fits
    assert pick_tile(100, "percentile", P) == 2048     # uncapped
    assert pick_tile(100, "median", P) == 2048
    t_small = pick_tile(600, "sigma", P)
    assert t_small is not None and t_small < 1024      # budget shrinks
    # config-3's F=1000 now picks the strip-body tile (was None/HBM)
    assert pick_tile(1000, "winsorized", 480 * 640) == 128
    assert pick_tile(1025, "winsorized", 480 * 640) is None  # F ceiling
    assert pick_tile(896, "winsorized", 480 * 640) is not None


@pytest.mark.parametrize("rejection", ["percentile", "sigmedian",
                                       "median"])
@pytest.mark.parametrize("F", [2, 3, 4, 5])
def test_reject_stack_pallas_tiny_frame_counts(rejection, F):
    """F <= 4 makes the power-of-two sort network SHORTER than the
    8-row sublane buffer; the stage masks must pad, not crash (a crash
    here used to disable the fused path for the whole process when a
    short stack hit it first). Parity vs the HBM kernels holds down to
    F=2 for the non-windowed rejections; sigma/winsorized at F <= 4 are
    ENTIRELY degenerate (every pixel hits the reference's mid-scan
    break), so pick_tile refuses them — see
    test_pick_tile_refuses_tiny_windowed."""
    import jax.numpy as jnp

    from siriltpu.ops.pallas.reject_stack import reject_stack_pallas
    from siriltpu.ops.rejection import _gsl_median, sort_axis0

    rng = np.random.default_rng(200 + F)
    P = 256
    vals = rng.integers(100, 60000, size=(F, P)).astype(np.uint16)
    sig = (0.2, 0.2) if rejection == "percentile" else (2.5, 2.5)
    got = np.asarray(reject_stack_pallas(jnp.asarray(vals), rejection,
                                         sig[0], sig[1], tile=256,
                                         interpret=True))
    if rejection == "median":
        sv = sort_axis0(jnp.asarray(vals).astype(jnp.float32))
        want = np.asarray(_gsl_median(
            sv, jnp.ones((F, P), bool),
            jnp.full((P,), F, jnp.int32)).astype(jnp.uint16))
    else:
        want, _, _ = reject_and_mean(
            jnp.asarray(vals) if rejection == "sigma"
            else jnp.asarray(vals).astype(jnp.float32), rejection, sig)
        want = np.asarray(want)
    np.testing.assert_array_equal(got, want)


def test_pick_tile_refuses_tiny_windowed():
    """sigma/winsorized at F <= 4 are entirely degenerate (the C break
    fires on every pixel), beyond the DEGEN_K fixup — pick_tile must
    route them to the HBM path; the non-windowed rejections stay."""
    from siriltpu.ops.pallas.reject_stack import pick_tile

    for rej in ("sigma", "winsorized"):
        assert pick_tile(4, rej, 2048) is None
        assert pick_tile(5, rej, 2048) is not None
    for rej in ("percentile", "sigmedian", "median"):
        assert pick_tile(4, rej, 2048) is not None
