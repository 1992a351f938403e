"""Pixel-rejection kernels: the 5 rejection algorithms of mean-with-
rejection stacking, vectorized over pixels as masked fixed-point loops.

Reference: src/stacking/stacking.c:1128-1186 (clip predicates) and
:1656-1788 (per-pixel loops). Semantics frozen:

- the per-pixel cross-frame vector is sorted, then iteratively clipped
  around the GSL sorted-median using the GSL SAMPLE standard deviation
  (N-1 denominator, gsl_stats_ushort_sd);
- loops run while any pixel was rejected and more than 3 survive
  (``while (n > 0 && N > 3)``);
- flagging stops early within a pass once ``N - r <= 4`` where ``r``
  accumulates across passes (stacking.c:1684-1688, 1737, 1748). In the
  reference, elements after the break keep *stale* flags from the
  previous pixel's buffer (uninitialized memory); we deterministically
  treat them as not-rejected.
- SIGMEDIAN replaces rejected values by round_to_WORD(median) instead of
  removing (:1696-1708);
- WINSORIZED iterates (clamp to median±1.5σ, re-measure median and
  1.134·sd) until |σ−σ₀|/σ₀ ≤ 5·10⁻⁴, then sigma-clips the *original*
  values with the converged σ and the winsorized median (:1710-1748);
- LINEARFIT fits value-vs-rank by least squares, σ = mean |residual|
  (:1750-1783);
- PERCENTILE is a single pass on relative distance from the median
  (:1130-1143), removing only if N > 1 (:1667-1673).
- final pixel = round_to_WORD(mean of survivors) (:1790-1794).

TPU-first structure: sort ONCE along the frame axis (removal preserves
sorted order), keep a validity mask; every order statistic is a
cumsum-gather; iteration is a ``lax.while_loop`` whose condition is a
global any-reduce, with converged pixels frozen. Only SIGMEDIAN mutates
values and needs a per-iteration re-sort.

Shapes: ``vals`` is (F, P) float32 — F frames, P pixels (any flattened
block). uint16 values are exactly representable in f32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from siriltpu.ops.sortnet import sort_axis0
from siriltpu.utils.rounding import round_to_word, round_to_word_f

Array = jnp.ndarray

_INVALID = jnp.float32(1e9)
MAX_ITERS = 50  # safety bound; reference loops are data-terminating


# ------------------------------------------------------------- mask helpers

def _sort_with_mask(vals: Array, valid: Array) -> Tuple[Array, Array]:
    """Sort values ascending with invalid entries pushed to the end."""
    keys = jnp.where(valid, vals, _INVALID)
    s = sort_axis0(keys)
    return s, s < _INVALID / 2


def _kth_valid(vals: Array, cum: Array, k: Array) -> Array:
    """Value of the k-th (0-based) valid element per pixel.

    ``cum`` is the inclusive cumsum of the validity mask along axis 0.
    For sorted-invalid-last layouts cum == index+1 for valid elements, so
    this is just a gather, but the cumsum form also works for interspersed
    masks (needed after removals without re-sorting).
    """
    hit = cum == (k[None, :] + 1)
    # cum increments only at valid positions => exactly one hit per pixel
    return jnp.sum(jnp.where(hit, vals, 0.0), axis=0)


def _gsl_median(vals: Array, valid: Array, n: Array) -> Array:
    """GSL sorted-median over the valid elements (mean of the two middle
    order statistics for even n)."""
    cum = jnp.cumsum(valid.astype(jnp.int32), axis=0)
    k1 = (n - 1) // 2
    k2 = n // 2
    v1 = _kth_valid(vals, cum, k1)
    v2 = _kth_valid(vals, cum, k2)
    return jnp.where(n > 0, 0.5 * (v1 + v2), 0.0)


def _gsl_sd(vals: Array, valid: Array, n: Array) -> Array:
    """gsl_stats_ushort_sd: sample standard deviation (N-1)."""
    nf = n.astype(jnp.float32)
    vm = jnp.where(valid, vals, 0.0)
    mean = jnp.sum(vm, axis=0) / jnp.maximum(nf, 1.0)
    d = jnp.where(valid, vals - mean[None, :], 0.0)
    var = jnp.sum(d * d, axis=0) / jnp.maximum(nf - 1.0, 1.0)
    return jnp.where(n > 1, jnp.sqrt(var), 0.0)


def _mean_of_survivors(vals: Array, valid: Array) -> Array:
    n = jnp.sum(valid, axis=0).astype(jnp.float32)
    s = jnp.sum(jnp.where(valid, vals, 0.0), axis=0)
    return round_to_word(s / jnp.maximum(n, 1.0))


def _apply_early_break(flags: Array, valid: Array, n: Array, r_prev: Array):
    """Emulate the in-pass break: flags are honored in sorted order until
    ``N - (r_prev + cumulative flags) <= 4``; later elements are unflagged.
    Returns (effective flags, updated r)."""
    c = jnp.cumsum(flags.astype(jnp.int32), axis=0)
    # element i survives the break check of every element j < i:
    # for all j <= i: after counting j, N - (r_prev + c_j) > 4 must have
    # held to continue; element i is applied if no break strictly before i.
    # break at j iff N - (r_prev + c_j) <= 4 ; element i kept iff no j < i broke.
    # Only VALID positions can host a break: the C scan walks the
    # compacted survivor stack, so already-removed slots are not steps.
    broke = ((n[None, :] - (r_prev[None, :] + c)) <= 4) & valid
    # prefix: did any earlier element break?
    broke_before = jnp.concatenate(
        [jnp.zeros_like(broke[:1]), jnp.cumsum(broke.astype(jnp.int32), axis=0)[:-1] > 0],
        axis=0)
    eff = flags & ~broke_before & valid
    r_new = r_prev + jnp.sum(eff.astype(jnp.int32), axis=0)
    return eff, r_new


def _sigma_flags(vals: Array, valid: Array, median: Array, sigma: Array,
                 siglow: float, sighigh: float):
    """sigma_clipping (stacking.c:1148-1160): returns (low, high) flags."""
    low = (median[None, :] - vals > siglow * sigma[None, :]) & valid
    high = (vals - median[None, :] > sighigh * sigma[None, :]) & valid
    return low, high


# ------------------------------------------------------------- algorithms

@functools.partial(jax.jit, static_argnames=("siglow", "sighigh"))
def reject_sigma(vals: Array, siglow: float, sighigh: float):
    """SIGMA rejection (stacking.c:1674-1694). Returns (valid mask over the
    SORTED values, sorted values, rejl, rejh counts per pixel)."""
    f, p = vals.shape
    sv = sort_axis0(vals)
    valid0 = jnp.ones((f, p), dtype=bool)

    def cond(state):
        _, _, done, _, _, it = state
        return (~jnp.all(done)) & (it < MAX_ITERS)

    def body(state):
        valid, r, done, rejl, rejh, it = state
        n = jnp.sum(valid, axis=0).astype(jnp.int32)
        sigma = _gsl_sd(sv, valid, n)
        median = _gsl_median(sv, valid, n)
        low, high = _sigma_flags(sv, valid, median, sigma, siglow, sighigh)
        flags = low | high
        eff, r_new = _apply_early_break(flags, valid, n, r)
        effl = eff & low
        effh = eff & high
        removed = jnp.sum(eff, axis=0).astype(jnp.int32)
        new_valid = valid & ~eff
        n_new = n - removed
        # freeze pixels that are done
        upd = ~done
        valid = jnp.where(upd[None, :], new_valid, valid)
        rejl = rejl + jnp.where(upd, jnp.sum(effl, axis=0), 0)
        rejh = rejh + jnp.where(upd, jnp.sum(effh, axis=0), 0)
        r = jnp.where(upd, r_new, r)
        done = done | (removed == 0) | (n_new <= 3)
        return valid, r, done, rejl, rejh, it + 1

    state = (valid0, jnp.zeros(p, jnp.int32), jnp.zeros(p, bool),
             jnp.zeros(p, jnp.int32), jnp.zeros(p, jnp.int32), jnp.int32(0))
    valid, r, done, rejl, rejh, _ = jax.lax.while_loop(cond, body, state)
    return valid, sv, rejl, rejh


@functools.partial(jax.jit, static_argnames=("siglow", "sighigh"))
def reject_sigmedian(vals: Array, siglow: float, sighigh: float):
    """SIGMEDIAN (stacking.c:1696-1708): rejected values replaced by
    round_to_WORD(median); nothing removed. Returns (valid, values, rejl, rejh)."""
    f, p = vals.shape
    sv = sort_axis0(vals)
    valid = jnp.ones((f, p), dtype=bool)
    n = jnp.full((p,), f, jnp.int32)

    def cond(state):
        _, done, _, _, it = state
        return (~jnp.all(done)) & (it < MAX_ITERS)

    def body(state):
        v, done, rejl, rejh, it = state
        sigma = _gsl_sd(v, valid, n)
        median = _gsl_median(v, valid, n)
        low, high = _sigma_flags(v, valid, median, sigma, siglow, sighigh)
        flags = low | high
        nrep = jnp.sum(flags, axis=0).astype(jnp.int32)
        medw = round_to_word_f(median)
        v_new = jnp.where(flags & ~done[None, :], medw[None, :], v)
        v_new = sort_axis0(v_new)
        rejl = rejl + jnp.where(~done, jnp.sum(low, axis=0), 0)
        rejh = rejh + jnp.where(~done, jnp.sum(high, axis=0), 0)
        done = done | (nrep == 0) | (n <= 3)
        return v_new, done, rejl, rejh, it + 1

    state = (sv, jnp.zeros(p, bool), jnp.zeros(p, jnp.int32),
             jnp.zeros(p, jnp.int32), jnp.int32(0))
    v, done, rejl, rejh, _ = jax.lax.while_loop(cond, body, state)
    return valid, v, rejl, rejh


@functools.partial(jax.jit, static_argnames=("siglow", "sighigh"))
def reject_winsorized(vals: Array, siglow: float, sighigh: float):
    """WINSORIZED sigma clipping (stacking.c:1710-1748).

    float32 precision guard: the 1.134-sigma fixed-point iteration with
    its 5e-4 convergence test amplifies f32 rounding at large pixel
    values (ulp(65535) ~ 0.004 vs sigma ~ units), so all math runs
    per-pixel CENTERED on an integer anchor c (the middle order
    statistic): every step is shift-equivariant, and the word-grid clamp
    uses the exact identity floor(x + c + 0.5) = c + floor(x + 0.5) for
    integer c. For raw uint16 data this makes the kernel exact; for
    normalized (non-integer) data it stops error growth with magnitude.
    """
    f, p = vals.shape
    sv_orig = sort_axis0(vals)
    anchor = jnp.floor(sv_orig[f // 2])  # (p,) integer-valued
    sv = sv_orig - anchor[None, :]
    lo_clip = -anchor          # word-grid 0 in the shifted domain
    hi_clip = 65535.0 - anchor  # word-grid 65535 in the shifted domain

    def round_shift(x):
        r = jnp.floor(x + 0.5)
        r = jnp.where(x <= lo_clip, lo_clip, r)
        return jnp.where(x > hi_clip, hi_clip, r)

    valid0 = jnp.ones((f, p), dtype=bool)

    def winsor_converge(valid, n):
        """Inner loop: winsorize until sigma converges. Returns (median, sigma)."""
        sigma = _gsl_sd(sv, valid, n)
        median = _gsl_median(sv, valid, n)
        w0 = jnp.where(valid, sv, _INVALID)

        def wcond(ws):
            _, _, _, conv, it = ws
            return (~jnp.all(conv)) & (it < MAX_ITERS)

        def wbody(ws):
            w, med, sig, conv, it = ws
            m0 = med - 1.5 * sig
            m1 = med + 1.5 * sig
            wv = jnp.where(w < _INVALID / 2,
                           jnp.where(w < m0[None, :], round_shift(m0)[None, :],
                                     jnp.where(w > m1[None, :],
                                               round_shift(m1)[None, :], w)),
                           w)
            # no re-sort needed: clamping tails to [m0, m1] is monotone
            # non-decreasing, so a sorted vector stays sorted (and the
            # _INVALID sentinels stay at the top)
            wvalid = wv < _INVALID / 2
            med_new = _gsl_median(wv, wvalid, n)
            sig_new = 1.134 * _gsl_sd(wv, wvalid, n)
            newconv = jnp.where(sig > 0,
                                jnp.abs(sig_new - sig) / jnp.maximum(sig, 1e-30) <= 0.0005,
                                True)
            # freeze converged pixels
            w = jnp.where(conv[None, :], w, wv)
            med = jnp.where(conv, med, med_new)
            sig = jnp.where(conv, sig, sig_new)
            conv = conv | newconv
            return w, med, sig, conv, it + 1

        ws = (w0, median, sigma, jnp.zeros(p, bool), jnp.int32(0))
        _, med, sig, _, _ = jax.lax.while_loop(wcond, wbody, ws)
        return med, sig

    def cond(state):
        _, _, done, _, _, it = state
        return (~jnp.all(done)) & (it < MAX_ITERS)

    def body(state):
        valid, r, done, rejl, rejh, it = state
        n = jnp.sum(valid, axis=0).astype(jnp.int32)
        median, sigma = winsor_converge(valid, n)
        low, high = _sigma_flags(sv, valid, median, sigma, siglow, sighigh)
        flags = low | high
        eff, r_new = _apply_early_break(flags, valid, n, r)
        removed = jnp.sum(eff, axis=0).astype(jnp.int32)
        new_valid = valid & ~eff
        n_new = n - removed
        upd = ~done
        valid = jnp.where(upd[None, :], new_valid, valid)
        rejl = rejl + jnp.where(upd, jnp.sum(eff & low, axis=0), 0)
        rejh = rejh + jnp.where(upd, jnp.sum(eff & high, axis=0), 0)
        r = jnp.where(upd, r_new, r)
        done = done | (removed == 0) | (n_new <= 3)
        return valid, r, done, rejl, rejh, it + 1

    state = (valid0, jnp.zeros(p, jnp.int32), jnp.zeros(p, bool),
             jnp.zeros(p, jnp.int32), jnp.zeros(p, jnp.int32), jnp.int32(0))
    valid, r, done, rejl, rejh, _ = jax.lax.while_loop(cond, body, state)
    return valid, sv_orig, rejl, rejh


@functools.partial(jax.jit, static_argnames=("siglow", "sighigh"))
def reject_linearfit(vals: Array, siglow: float, sighigh: float):
    """LINEARFIT rejection (stacking.c:1750-1783): least-squares line over
    (rank, sorted value), sigma = mean |residual|, clip by residual."""
    f, p = vals.shape
    sv_orig = sort_axis0(vals)
    # f32 guard (as in reject_winsorized): the fit and its residual test
    # are shift-equivariant, so center on an integer anchor to keep
    # intercept/residual math away from ulp(65535) ~ 0.004 granularity.
    anchor = jnp.floor(sv_orig[f // 2])
    sv = sv_orig - anchor[None, :]
    valid0 = jnp.ones((f, p), dtype=bool)

    def cond(state):
        _, _, done, _, _, it = state
        return (~jnp.all(done)) & (it < MAX_ITERS)

    def body(state):
        valid, r, done, rejl, rejh, it = state
        n = jnp.sum(valid, axis=0).astype(jnp.int32)
        nf = n.astype(jnp.float32)
        cum = jnp.cumsum(valid.astype(jnp.int32), axis=0)
        rank = jnp.where(valid, (cum - 1).astype(jnp.float32), 0.0)
        y = jnp.where(valid, sv, 0.0)
        sx = jnp.sum(rank, axis=0)
        sy = jnp.sum(y, axis=0)
        xm = sx / jnp.maximum(nf, 1.0)
        ym = sy / jnp.maximum(nf, 1.0)
        dx = jnp.where(valid, rank - xm[None, :], 0.0)
        dy = jnp.where(valid, sv - ym[None, :], 0.0)
        ssxx = jnp.sum(dx * dx, axis=0)
        a = jnp.where(ssxx > 0, jnp.sum(dx * dy, axis=0) / jnp.maximum(ssxx, 1e-30), 0.0)
        b = ym - a * xm
        fitv = a[None, :] * rank + b[None, :]
        resid = jnp.where(valid, jnp.abs(sv - fitv), 0.0)
        sigma = jnp.sum(resid, axis=0) / jnp.maximum(nf, 1.0)
        safe_sig = jnp.maximum(sigma, 1e-30)
        low = ((fitv - sv) / safe_sig[None, :] > siglow) & valid
        high = ((sv - fitv) / safe_sig[None, :] > sighigh) & valid
        flags = (low | high) & (sigma > 0)[None, :]
        eff, r_new = _apply_early_break(flags, valid, n, r)
        removed = jnp.sum(eff, axis=0).astype(jnp.int32)
        new_valid = valid & ~eff
        n_new = n - removed
        upd = ~done
        valid = jnp.where(upd[None, :], new_valid, valid)
        rejl = rejl + jnp.where(upd, jnp.sum(eff & low, axis=0), 0)
        rejh = rejh + jnp.where(upd, jnp.sum(eff & high, axis=0), 0)
        r = jnp.where(upd, r_new, r)
        done = done | (removed == 0) | (n_new <= 3)
        return valid, r, done, rejl, rejh, it + 1

    state = (valid0, jnp.zeros(p, jnp.int32), jnp.zeros(p, bool),
             jnp.zeros(p, jnp.int32), jnp.zeros(p, jnp.int32), jnp.int32(0))
    valid, r, done, rejl, rejh, _ = jax.lax.while_loop(cond, body, state)
    return valid, sv_orig, rejl, rejh


@functools.partial(jax.jit, static_argnames=("plow", "phigh"))
def reject_percentile(vals: Array, plow: float, phigh: float):
    """PERCENTILE clipping (stacking.c:1130-1143, loop :1656-1673):
    single pass on relative deviation from the median; remove only if N>1."""
    f, p = vals.shape
    sv = sort_axis0(vals)
    valid = jnp.ones((f, p), dtype=bool)
    n = jnp.full((p,), f, jnp.int32)
    median = _gsl_median(sv, valid, n)
    medsafe = jnp.where(median == 0, 1e-30, median)
    low = ((median[None, :] - sv) / medsafe[None, :] > plow)
    high = ((sv - median[None, :]) / medsafe[None, :] > phigh)
    flags = low | high
    if f > 1:
        # removal scans ascending and stops at N == 1: if every element is
        # flagged, the last (largest) one survives (stacking.c:1667-1673)
        all_flagged = jnp.all(flags, axis=0)
        is_last = jax.lax.broadcasted_iota(jnp.int32, (f, p), 0) == (f - 1)
        valid = jnp.where(all_flagged[None, :], is_last, ~flags)
    rejl = jnp.sum(low, axis=0).astype(jnp.int32)
    rejh = jnp.sum(high, axis=0).astype(jnp.int32)
    return valid, sv, rejl, rejh


@jax.jit
def reject_none(vals: Array):
    f, p = vals.shape
    z = jnp.zeros(p, jnp.int32)
    return jnp.ones((f, p), dtype=bool), vals, z, z


# ------------------------------------------------- fast window formulation

@functools.partial(jax.jit, static_argnames=("siglow", "sighigh"))
def reject_sigma_window(vals: Array, siglow: float, sighigh: float):
    """SIGMA rejection, window formulation — the benchmark hot path.

    On the sorted pixel vector, sigma clipping always removes a PREFIX
    (low rejects) and a SUFFIX (high rejects), so the survivor set is a
    contiguous window [lo, hi). Tracking two (P,) counters replaces the
    per-iteration cumsum chains of the masked formulation with two
    take_along_axis gathers and ~3 fused elementwise passes.

    The reference's mid-scan break (N - r <= 4, stacking.c:1684-1688) is
    mapped to a flag budget ``N - 4 - r_prev`` applied lows-first. In the
    (stale-memory) quirk case the reference can drop the LEAST extreme
    highs and keep more extreme ones; this version always drops from the
    window edges — a deviation only on that degenerate path.

    Returns (mean uint16 (P,), rejl, rejh).
    """
    f, p = vals.shape
    sv = sort_axis0(vals)
    iota = jax.lax.broadcasted_iota(jnp.int32, (f, p), 0)

    def win_stats(lo, hi):
        n = hi - lo
        nf = n.astype(jnp.float32)
        mask = (iota >= lo[None, :]) & (iota < hi[None, :])
        svf = sv.astype(jnp.float32)
        s1 = jnp.sum(jnp.where(mask, svf, 0.0), axis=0)
        mean = s1 / jnp.maximum(nf, 1.0)
        d = jnp.where(mask, svf - mean[None, :], 0.0)
        var = jnp.sum(d * d, axis=0) / jnp.maximum(nf - 1.0, 1.0)
        sigma = jnp.where(n > 1, jnp.sqrt(var), 0.0)
        k1 = lo + (n - 1) // 2
        k2 = lo + n // 2
        v1 = jnp.take_along_axis(sv, k1[None, :], axis=0)[0].astype(jnp.float32)
        v2 = jnp.take_along_axis(sv, k2[None, :], axis=0)[0].astype(jnp.float32)
        median = 0.5 * (v1 + v2)
        return n, mask, median, sigma

    def cond(state):
        _, _, _, done, _, _, it = state
        return (~jnp.all(done)) & (it < MAX_ITERS)

    def body(state):
        lo, hi, r, done, rejl, rejh, it = state
        n, mask, median, sigma = win_stats(lo, hi)
        svf = sv.astype(jnp.float32)
        low = mask & (median[None, :] - svf > siglow * sigma[None, :])
        high = mask & (svf - median[None, :] > sighigh * sigma[None, :])
        nlow = jnp.sum(low, axis=0).astype(jnp.int32)
        nhigh = jnp.sum(high, axis=0).astype(jnp.int32)
        # flag budget from the mid-scan break quirk
        over = (n - r) <= 4
        budget = jnp.where(over, jnp.where(nlow > 0, 1, 0), n - 4 - r)
        a_low = jnp.minimum(nlow, jnp.maximum(budget, 0))
        a_high = jnp.minimum(nhigh, jnp.maximum(budget - a_low, 0))
        removed = a_low + a_high
        upd = ~done
        lo = jnp.where(upd, lo + a_low, lo)
        hi = jnp.where(upd, hi - a_high, hi)
        rejl = rejl + jnp.where(upd, a_low, 0)
        rejh = rejh + jnp.where(upd, a_high, 0)
        r = jnp.where(upd, r + removed, r)
        done = done | (removed == 0) | ((hi - lo) <= 3)
        return lo, hi, r, done, rejl, rejh, it + 1

    z = jnp.zeros(p, jnp.int32)
    state = (z, jnp.full((p,), f, jnp.int32), z, jnp.zeros(p, bool), z, z,
             jnp.int32(0))
    lo, hi, r, done, rejl, rejh, _ = jax.lax.while_loop(cond, body, state)
    # mean of the surviving window
    mask = (iota >= lo[None, :]) & (iota < hi[None, :])
    nf = (hi - lo).astype(jnp.float32)
    s = jnp.sum(jnp.where(mask, sv.astype(jnp.float32), 0.0), axis=0)
    mean = round_to_word(s / jnp.maximum(nf, 1.0))
    return mean, rejl, rejh


_ALGOS = {
    "sigma": reject_sigma,
    "sigmedian": reject_sigmedian,
    "winsorized": reject_winsorized,
    "linearfit": reject_linearfit,
    "percentile": reject_percentile,
}


def reject_and_mean(vals: Array, rejection: str, sig=(3.0, 3.0)):
    """Full rejection + mean for a (F, P) block of normalized pixel values.

    Returns (uint16 mean (P,), rejlow (P,), rejhigh (P,)).
    ``sigma`` uses the fast window formulation; ``sigma_masked`` forces
    the reference-exact masked loop (quirk-path included).
    """
    if rejection == "sigma":
        # window kernel sorts in the input dtype (uint16 halves bandwidth)
        return reject_sigma_window(vals, float(sig[0]), float(sig[1]))
    if not jnp.issubdtype(vals.dtype, jnp.floating):
        vals = vals.astype(jnp.float32)
    if rejection in ("none", None):
        valid, v, rejl, rejh = reject_none(vals)
    elif rejection == "sigma_masked":
        valid, v, rejl, rejh = reject_sigma(vals, float(sig[0]), float(sig[1]))
    else:
        valid, v, rejl, rejh = _ALGOS[rejection](vals, float(sig[0]), float(sig[1]))
    return _mean_of_survivors(v, valid), rejl, rejh


def masked_median(vals: Array) -> Array:
    """Median stack pixel op (stacking.c:765-767): GSL sorted median,
    C-truncated to WORD on assignment."""
    f, p = vals.shape
    sv = sort_axis0(vals)
    valid = jnp.ones((f, p), dtype=bool)
    n = jnp.full((p,), f, jnp.int32)
    med = _gsl_median(sv, valid, n)
    return med.astype(jnp.uint16)  # C truncation


__all__ = ["reject_and_mean", "masked_median", "reject_sigma",
           "reject_sigmedian", "reject_winsorized", "reject_linearfit",
           "reject_percentile", "MAX_ITERS"]
