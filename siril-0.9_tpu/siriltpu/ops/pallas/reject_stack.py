"""Fused Pallas kernels: per-pixel sort + rejection + mean in VMEM.

The hottest op of the whole framework (SURVEY §7.4.3): stacking
100×4096² frames needs a sort of every cross-frame pixel vector. On HBM
the 28-stage sorting network is bandwidth-bound (~1 s per GB-scale
block); these kernels load an (F, TILE) slab into VMEM ONCE, run the
whole Batcher network, the rejection loop, and the survivor mean in
VMEM, and write back just the (TILE,) result — HBM traffic collapses to
one read of the data plus a 0.1% write.

Each Batcher stage has a uniform partner offset k, so it lowers to two
``pltpu.roll`` shifts along the sublane axis plus masked min/max — pure
VPU work.

Rejections (reference: src/stacking/stacking.c:1656-1788):

- ``sigma``      — windowed sigma clip; semantics of
  :func:`siriltpu.ops.rejection.reject_sigma_window` including the
  DEGENERATE flag: pixels whose scan would hit the reference's
  mid-scan break (N - r <= 4, stacking.c:1684-1688) are frozen and
  flagged; the wrapper re-runs exactly those through the exact masked
  kernel, so the fused path is bit-exact like ``reject_and_mean``.
- ``winsorized`` — the inner winsorization fixed point (clamp working
  copy to median±1.5σ, σ ← 1.134·sd, until |σ−σ₀|/σ₀ ≤ 5e-4,
  stacking.c:1710-1748) runs in VMEM with the same anchor-centered
  arithmetic as :func:`siriltpu.ops.rejection.reject_winsorized`;
  the outer clip is windowed with the same degenerate fallback.
- ``percentile`` — single pass on relative distance from the median
  (stacking.c:1130-1143); prefix/suffix removal is exactly
  window-shaped (the all-flagged case keeps the last element), so no
  degenerate path exists.
- ``sigmedian``  — rejected values replaced by round_to_WORD(median)
  (stacking.c:1696-1708); nothing is removed, the working vector is
  re-sorted IN VMEM each pass (re-running the Batcher plan).

Statistics use the reference-exact integer-sum construction of
``_gsl_sd`` (deviations centered on the middle order statistic, hi/lo
8-bit square split) and the survivor mean is exact integer
round-half-up, so the fused path matches the HBM hybrid bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from siriltpu.ops.sortnet import slice_segments, stage_offsets

MAX_ITERS = 50
_SUBLANE = 8  # sublane-tile granularity for i32; unaligned sublane
              # slices would be slower than the roll form

#: max degenerate pixels fixed exactly per call; beyond this the window
#: result stands (degeneracy needs clipping ~all of a 100-frame vector —
#: see tests for a constructed case; real stacks hit 0)
DEGEN_K = 128

PALLAS_REJECTIONS = ("sigma", "winsorized", "percentile", "sigmedian",
                     "median")


def _plan_stages(f_real: int):
    """Sort-stage plan for f_real values: Batcher's network for the
    next power of two, PRUNED to pairs with both wires < n_rows, run
    on n_rows = ceil(f_real/8)*8 rows.

    The pruning is exact, not heuristic: pad wires hold 65535 (the
    u16 maximum), so for any comparator (i, j) with j a pad wire,
    min(x_i, 65535) = x_i and max = 65535 — a no-op that also keeps
    the pad-wire invariant, inductively through the whole network.
    Dropping comparators whose high wire lies beyond n_rows lets every
    full-width op (rolls, selects, the clip loop's frame-axis
    reductions) run over n_rows = ceil(f/8)*8 instead of the power of
    two (104 vs 128 for f=100). Comparators into the surviving pad
    rows [f_real, n_rows) are kept — equally no-ops, but keeping them
    preserves the 8-alignment of the slice-form runs (k is a multiple
    of 8 there, so truncating at n_rows - k stays aligned, while
    truncating at f_real would not).

    Returns (n_rows, plan); plan entries are ('slice', segments) when
    the stage decomposes into sublane-aligned contiguous runs (no
    roll, no select — sliced min/max + concat), else
    ('roll', k, lo, hi) for the two-roll masked form."""
    n_net = 1 << (f_real - 1).bit_length()
    n_rows = -(-f_real // _SUBLANE) * _SUBLANE
    plan = []
    for k, lo, hi in stage_offsets(n_net):
        lo = lo.copy()
        hi = hi.copy()
        dead = np.where(hi)[0] >= n_rows   # prune pairs past the buffer
        lo[np.where(lo)[0][dead]] = False
        hi[np.where(hi)[0][dead]] = False
        if not lo.any():
            continue
        if len(lo) < n_rows:
            # f_real <= 4: the power-of-two network (n_net = 1, 2 or 4)
            # is SHORTER than the 8-row sublane buffer — pad the stage
            # masks with False so the pad rows are never exchanged
            lo = np.pad(lo, (0, n_rows - len(lo)))
            hi = np.pad(hi, (0, n_rows - len(hi)))
        else:
            lo = lo[:n_rows]
            hi = hi[:n_rows]
        segs = (slice_segments(k, lo, hi, n_rows, _SUBLANE)
                if k >= _SUBLANE else None)
        if segs is not None:
            plan.append(("slice", segs))
        else:
            plan.append(("roll", k, lo, hi))
    return n_rows, plan


def _make_kernel(f_real: int, tile: int, siglow: float, sighigh: float,
                 rejection: str):
    n_rows, plan = _plan_stages(f_real)

    def run_network(x, masks_ref, stage_ref=None):
        """One full Batcher pass over the (n_rows, tile) i32 buffer.

        With ``stage_ref`` (a (n_rows, tile) i32 VMEM scratch ref) each
        stage's result is written to the ref and re-read, so Mosaic's
        stack allocator frees the previous stage's temporaries instead
        of keeping the whole ~50-stage value chain live — at F=1000 the
        chained network dominates the kernel's scoped-VMEM frame."""
        ri = 0  # row index into the roll-stage mask table
        for stage in plan:
            if stage[0] == "slice":
                parts = []
                for kind, a, b, ln in stage[1]:
                    if kind == "pass":
                        parts.append(x[a: a + ln])
                    elif kind == "min":
                        parts.append(jnp.minimum(x[a: a + ln],
                                                 x[b: b + ln]))
                    else:
                        parts.append(jnp.maximum(x[a: a + ln],
                                                 x[b: b + ln]))
                x = jnp.concatenate(parts, axis=0)
            else:
                _, k, _, _ = stage
                lom = masks_ref[2 * ri, :][:, None] != 0
                him = masks_ref[2 * ri + 1, :][:, None] != 0
                xd = pltpu.roll(x, (n_rows - k) % n_rows, 0)  # from i+k
                xu = pltpu.roll(x, k, 0)                    # from i-k
                x = jnp.where(lom, jnp.minimum(x, xd),
                              jnp.where(him, jnp.maximum(x, xu), x))
                ri += 1
            if stage_ref is not None:
                stage_ref[:] = x
                x = stage_ref[:]
        return x

    iota_shape = (n_rows, tile)

    def kernel(masks_ref, x_ref, out_ref, degen_ref, rejl_ref,
               rejh_ref, work_ref=None, svi_ref=None):
        # (f_real, tile) block; pad rows (constant 65535) are appended
        # IN VMEM so the (n_rows, P) padded copy never exists in HBM —
        # that concatenate cost a ~4 GB HBM round trip per 100x4K^2
        # batch. Pad rows equal the max value, so after the sort the
        # prefix of length f_real is multiset-equal to the real data
        # (ties between real and pad values can only swap equal values).
        x = x_ref[:].astype(jnp.int32)
        if n_rows != f_real:
            x = jnp.concatenate(
                [x, jnp.full((n_rows - f_real, tile), 65535, jnp.int32)],
                axis=0)
        # the strip path stages the network through work_ref (free
        # until the loop seeds it) so the ~50-stage value chain never
        # sits whole on Mosaic's scoped stack
        strip_path = rejection == "winsorized" and f_real > _FULL_F_MAX
        x = run_network(x, masks_ref,
                        stage_ref=work_ref if strip_path else None)
        iota = jax.lax.broadcasted_iota(jnp.int32, iota_shape, 0)

        def onehot_sum(vals_f, k):
            """Value at per-pixel row index k via a one-hot masked sum
            (no gather on TPU VMEM). k is (1, tile) i32."""
            return jnp.sum(jnp.where(iota == k, vals_f, 0.0), axis=0,
                           keepdims=True)

        def exact_sd(vals_i32, mask, n, anchor_i32):
            """gsl_stats sample sd over the masked subset, deviations
            centered on ``anchor`` — EXACT integer sums (hi/lo 8-bit
            square split keeps every accumulator in i32), one final f32
            combine; replicates _gsl_sd/reject_sigma_window so clip
            decisions match the HBM hybrid bit-for-bit."""
            nf = n.astype(jnp.float32)
            d = jnp.where(mask, vals_i32 - anchor_i32, 0)
            s1 = jnp.sum(d, axis=0, keepdims=True)
            ad = jnp.abs(d)
            hi8 = ad >> 8
            lo8 = ad & 255
            s2 = (jnp.sum(hi8 * hi8, axis=0, keepdims=True
                          ).astype(jnp.float32) * 65536.0
                  + jnp.sum(hi8 * lo8, axis=0, keepdims=True
                            ).astype(jnp.float32) * 512.0
                  + jnp.sum(lo8 * lo8, axis=0, keepdims=True
                            ).astype(jnp.float32))
            s1f = s1.astype(jnp.float32)
            var = (s2 - s1f * s1f / jnp.maximum(nf, 1.0)) \
                / jnp.maximum(nf - 1.0, 1.0)
            return jnp.where(n > 1, jnp.sqrt(jnp.maximum(var, 0.0)), 0.0)

        def exact_mean_u16(vals_i32, mask, n, offset=None):
            """round_to_WORD(mean of masked values): exact integer
            round-half-up m = (2s + n) // (2n), computed with an f32
            quotient + integer fixup (Mosaic has no vector i32 divide).
            The f32 quotient errs by ~q * 2^-24 <= 65536 * 2^-24 < 0.01
            for ANY frame count (the relative error of num and the
            division is bounded, and q <= 65535.5), so the +-1 integer
            fixup always lands on the exact floor.

            ``offset`` (a (1, tile) i32) shifts values back to the
            original domain without materializing them: the mean of
            (vals + offset) adds n*offset to the sum — exact in i32 for
            |offset| <= 65535 and n <= ~16k."""
            s = jnp.sum(jnp.where(mask, vals_i32, 0), axis=0,
                        keepdims=True)
            return exact_mean_from_sum(s, n, offset)

        def exact_mean_from_sum(s, n, offset=None):
            """exact_mean_u16 on a pre-accumulated (1, tile) sum (the
            strip path accumulates s without a full-height buffer)."""
            if offset is not None:
                s = s + n * offset
            num = 2 * s + n
            den = jnp.maximum(2 * n, 1)
            q = jnp.floor(num.astype(jnp.float32)
                          / den.astype(jnp.float32)).astype(jnp.int32)
            # integer fixup: correct any f32 division misrounding
            q = jnp.where(q * den > num, q - 1, q)
            q = jnp.where((q + 1) * den <= num, q + 1, q)
            q = jnp.where(n > 0, q, 0)
            return jnp.clip(q, 0, 65535)

        def win_median(vals_i32, lo, n):
            """GSL sorted-median of the window [lo, lo+n) (mean of the
            two middle order statistics)."""
            vf = vals_i32.astype(jnp.float32)
            k1 = lo + (n - 1) // 2
            k2 = lo + n // 2
            wmed = ((iota == k1).astype(jnp.float32) +
                    (iota == k2).astype(jnp.float32))
            return 0.5 * jnp.sum(wmed * vf, axis=0, keepdims=True)

        z = jnp.zeros((1, tile), jnp.int32)
        full_n = jnp.full((1, tile), f_real, jnp.int32)

        if rejection == "median":
            # median stack pixel op (stacking.c:765-767): GSL sorted
            # median of the full window, C-truncated to WORD on
            # assignment (astype from f32 truncates toward zero). The
            # pad rows sort to the end and the [0, f_real) window never
            # sees them.
            med = win_median(x, z, full_n)
            # f32 -> i32 -> u16: Mosaic has no f32->u16 cast, and the
            # i32 truncation toward zero IS the C truncation (med >= 0)
            out_ref[:] = jnp.clip(med, 0.0, 65535.0).astype(
                jnp.int32).astype(jnp.uint16)
            degen_ref[:] = z
            rejl_ref[:] = z
            rejh_ref[:] = z
            return

        if rejection == "percentile":
            # single pass (stacking.c:1130-1143, 1656-1673)
            median = win_median(x, z, full_n)
            medsafe = jnp.where(median == 0.0, 1e-30, median)
            xf = x.astype(jnp.float32)
            real = iota < f_real
            low = real & ((median - xf) / medsafe > siglow)
            high = real & ((xf - median) / medsafe > sighigh)
            nlow = jnp.sum(low, axis=0, keepdims=True).astype(jnp.int32)
            nhigh = jnp.sum(high, axis=0, keepdims=True).astype(jnp.int32)
            if f_real > 1:
                allf = (nlow + nhigh) >= f_real
                lo_w = jnp.where(allf, f_real - 1, nlow)
                hi_w = jnp.where(allf, full_n, full_n - nhigh)
            else:
                lo_w, hi_w = z, full_n
            mask = (iota >= lo_w) & (iota < hi_w)
            out_ref[:] = exact_mean_u16(
                x, mask, hi_w - lo_w).astype(jnp.uint16)
            degen_ref[:] = jnp.zeros((1, tile), jnp.int32)
            # reject_percentile counts ALL flags, even when the
            # all-flagged carve-out keeps the last element
            rejl_ref[:] = nlow
            rejh_ref[:] = nhigh
            return

        if rejection == "sigmedian":
            # replace-and-resort loop (stacking.c:1696-1708); n never
            # shrinks, no window, no degenerate path. The working
            # vector lives in a VMEM scratch ref, NOT in the while_loop
            # carry: a big carried value makes Mosaic double-buffer the
            # loop state (two (n_rows, tile) buffers plus spills), while
            # a ref is one buffer mutated in place.
            real = iota < f_real
            work_ref[:] = x

            def s_cond(state):
                done, _, _, it = state
                return jnp.logical_and(jnp.min(done) == 0, it < MAX_ITERS)

            def s_body(state):
                done, rl, rh, it = state
                v = work_ref[:]
                anchor = jnp.sum(jnp.where(iota == f_real // 2, v, 0),
                                 axis=0, keepdims=True)
                sigma = exact_sd(v, real, full_n, anchor)
                median = win_median(v, z, full_n)
                vf = v.astype(jnp.float32)
                low = real & (median - vf > siglow * sigma)
                high = real & (vf - median > sighigh * sigma)
                flags = low | high
                nrep = jnp.sum(flags, axis=0, keepdims=True
                               ).astype(jnp.int32)
                medw = jnp.clip(jnp.floor(median + 0.5), 0.0, 65535.0
                                ).astype(jnp.int32)
                upd = done == 0
                v_new = jnp.where(flags & upd, medw, v)
                # done pixels are untouched: resorting their already-
                # sorted column is the identity, so one unconditional
                # network pass is correct for every pixel
                work_ref[:] = run_network(v_new, masks_ref)
                rl = rl + jnp.where(upd, jnp.sum(
                    low, axis=0, keepdims=True).astype(jnp.int32), 0)
                rh = rh + jnp.where(upd, jnp.sum(
                    high, axis=0, keepdims=True).astype(jnp.int32), 0)
                done = jnp.maximum(
                    done, ((nrep == 0) | (full_n <= 3)).astype(jnp.int32))
                return done, rl, rh, it + 1

            # first pass always executes (matches reject_sigmedian: done
            # is evaluated AFTER the replacement)
            _, rl, rh, _ = jax.lax.while_loop(
                s_cond, s_body,
                (jnp.zeros((1, tile), jnp.int32),
                 jnp.zeros((1, tile), jnp.int32),
                 jnp.zeros((1, tile), jnp.int32), jnp.int32(0)))
            v = work_ref[:]
            real_mask = iota < f_real
            out_ref[:] = exact_mean_u16(
                v, real_mask, full_n).astype(jnp.uint16)
            degen_ref[:] = jnp.zeros((1, tile), jnp.int32)
            rejl_ref[:] = rl
            rejh_ref[:] = rh
            return

        # ---- windowed iterative clips: sigma / winsorized ----

        if rejection == "winsorized" and f_real > _FULL_F_MAX:
            # ---- strip-reduction winsorized: F beyond the full-height
            # stack budget ----
            # The flat phase-machine's full-height body temporaries
            # ((n_rows, tile) i32/f32 each) overflow Mosaic's 16 MB
            # scoped-VMEM stack at F=1000 (21.2M measured; EACH phase
            # ablated alone measures the same — the win_median +
            # exact_sd cluster is the driver, not the phase pairing,
            # and the integer clamp/compare rewrites did not move it).
            # So beyond _FULL_F_MAX every window statistic is computed
            # STRIP-WISE: a fori_loop over (SH, tile) row strips of the
            # VMEM scratch refs carrying only (1, tile) accumulators.
            # Integer sums are exact under any grouping, and the f32
            # median/one-hot sums add only zeros outside the two
            # selected rows (f32 zero-adds are exact), so every
            # statistic is BIT-IDENTICAL to the full-height kernel's.
            # Body stack drops from ~21 MB to ~15 (SH, tile) strips;
            # a nested fori-in-while at F=1000 compiles cleanly on this
            # Mosaic (probed 2026-08-19) — it was the NESTED data-
            # dependent while pair that hard-crashed it (ROUND4.md).
            SH = max(d for d in range(8, 129, 8) if n_rows % d == 0)
            NS = n_rows // SH
            zi = jnp.zeros((1, tile), jnp.int32)
            zf = jnp.zeros((1, tile), jnp.float32)

            anchor = jnp.sum(jnp.where(iota == f_real // 2, x, 0),
                             axis=0, keepdims=True)
            svi = x - anchor
            svi_ref[:] = svi
            work_ref[:] = svi
            del svi
            lo_clip = -anchor.astype(jnp.float32)
            hi_clip = 65535.0 - anchor.astype(jnp.float32)

            def round_shift(t):
                r = jnp.floor(t + 0.5)
                r = jnp.where(t <= lo_clip, lo_clip, r)
                return jnp.where(t > hi_clip, hi_clip, r)

            def strip_iota(i):
                return (jax.lax.broadcasted_iota(
                    jnp.int32, (SH, tile), 0) + i * SH)

            def sd_combine(s1, shh, shl, sll, n):
                # EXACT copy of exact_sd's combine on the strip-
                # accumulated integer sums (see exact_sd above)
                nf = n.astype(jnp.float32)
                s2 = (shh.astype(jnp.float32) * 65536.0
                      + shl.astype(jnp.float32) * 512.0
                      + sll.astype(jnp.float32))
                s1f = s1.astype(jnp.float32)
                var = (s2 - s1f * s1f / jnp.maximum(nf, 1.0)) \
                    / jnp.maximum(nf - 1.0, 1.0)
                return jnp.where(n > 1,
                                 jnp.sqrt(jnp.maximum(var, 0.0)), 0.0)

            def sd_strips(ref, lo, hi, anch):
                """exact_sd over ref's window [lo, hi), strip-wise."""
                def p(i, acc):
                    s1, shh, shl, sll = acc
                    v = ref[pl.ds(i * SH, SH), :]
                    io = strip_iota(i)
                    m = (io >= lo) & (io < hi)
                    d = jnp.where(m, v - anch, 0)
                    ad = jnp.abs(d)
                    h8 = ad >> 8
                    l8 = ad & 255
                    return (s1 + jnp.sum(d, axis=0, keepdims=True),
                            shh + jnp.sum(h8 * h8, axis=0,
                                          keepdims=True),
                            shl + jnp.sum(h8 * l8, axis=0,
                                          keepdims=True),
                            sll + jnp.sum(l8 * l8, axis=0,
                                          keepdims=True))
                s1, shh, shl, sll = jax.lax.fori_loop(
                    0, NS, p, (zi, zi, zi, zi))
                return sd_combine(s1, shh, shl, sll, hi - lo)

            def medanch_strips(ref, lo, hi):
                """(win_median, value at row lo + n//2) of ref's
                window, strip-wise (one-hot masked sums)."""
                n = hi - lo
                k1 = lo + (n - 1) // 2
                k2 = lo + n // 2

                def p(i, acc):
                    msum, asum = acc
                    v = ref[pl.ds(i * SH, SH), :]
                    io = strip_iota(i)
                    vf = v.astype(jnp.float32)
                    wmed = ((io == k1).astype(jnp.float32) +
                            (io == k2).astype(jnp.float32))
                    return (msum + jnp.sum(wmed * vf, axis=0,
                                           keepdims=True),
                            asum + jnp.sum(jnp.where(io == k2, v, 0),
                                           axis=0, keepdims=True))

                msum, asum = jax.lax.fori_loop(0, NS, p, (zf, zi))
                return 0.5 * msum, asum

            def win_init(lo, hi):
                """Starting (median, sigma) of the fixed point for the
                window [lo, lo+n): statistics of svi before any
                winsorization step (stacking.c:1713-1716)."""
                med0, anch0 = medanch_strips(svi_ref, lo, hi)
                return med0, sd_strips(svi_ref, lo, hi, anch0)

            def w_inner(state):
                (lo, hi, r, done, degen, med_c, sig_c, conv, oit, iit,
                 _) = state
                n = hi - lo
                # integer clamp == the f32 where-chain for integer w
                # (see the full-height branch's proof)
                r0 = round_shift(med_c - 1.5 * sig_c).astype(jnp.int32)
                r1 = round_shift(med_c + 1.5 * sig_c).astype(jnp.int32)
                convb = conv != 0
                k1 = lo + (n - 1) // 2
                k2 = lo + n // 2

                def p1(i, acc):
                    # clamp + write-back + median/anchor sums of the
                    # CLAMPED vector in one pass; converged columns
                    # keep w (their med/sig updates are masked out)
                    msum, asum = acc
                    w = work_ref[pl.ds(i * SH, SH), :]
                    io = strip_iota(i)
                    m = (io >= lo) & (io < hi)
                    wv = jnp.where(m, jnp.minimum(jnp.maximum(w, r0),
                                                  r1), w)
                    work_ref[pl.ds(i * SH, SH), :] = jnp.where(
                        convb, w, wv)
                    vf = wv.astype(jnp.float32)
                    wmed = ((io == k1).astype(jnp.float32) +
                            (io == k2).astype(jnp.float32))
                    return (msum + jnp.sum(wmed * vf, axis=0,
                                           keepdims=True),
                            asum + jnp.sum(jnp.where(io == k2, wv, 0),
                                           axis=0, keepdims=True))

                msum, anch = jax.lax.fori_loop(0, NS, p1, (zf, zi))
                med_new = 0.5 * msum
                # clamping tails is monotone: sorted window stays
                # sorted; work_ref now holds wv for active columns
                sig_new = 1.134 * sd_strips(work_ref, lo, hi, anch)
                newconv = jnp.logical_or(
                    sig_c <= 0,
                    jnp.abs(sig_new - sig_c)
                    / jnp.maximum(sig_c, 1e-30) <= 0.0005)
                med_c = jnp.where(convb, med_c, med_new)
                sig_c = jnp.where(convb, sig_c, sig_new)
                conv = jnp.maximum(conv, newconv.astype(jnp.int32))
                iit = iit + 1
                phase = jnp.where(
                    jnp.logical_or(jnp.min(conv) != 0,
                                   iit >= MAX_ITERS),
                    jnp.int32(1), jnp.int32(0))
                return (lo, hi, r, done, degen, med_c, sig_c, conv,
                        oit, iit, phase)

            def w_outer(state):
                (lo, hi, r, done, degen, med_c, sig_c, conv, oit, iit,
                 _) = state
                n = hi - lo
                # EXACT integer-diff form of the HBM predicate (see
                # the full-height branch's proof)
                m2 = (2.0 * med_c).astype(jnp.int32)
                tl = 2.0 * (siglow * sig_c)
                th = 2.0 * (sighigh * sig_c)

                def pA(i, acc):
                    nl, nh = acc
                    v = svi_ref[pl.ds(i * SH, SH), :]
                    io = strip_iota(i)
                    m = (io >= lo) & (io < hi)
                    low = m & ((m2 - 2 * v).astype(jnp.float32) > tl)
                    high = m & ((2 * v - m2).astype(jnp.float32) > th)
                    return (nl + jnp.sum(low, axis=0, keepdims=True
                                         ).astype(jnp.int32),
                            nh + jnp.sum(high, axis=0, keepdims=True
                                         ).astype(jnp.int32))

                nlow, nhigh = jax.lax.fori_loop(0, NS, pA, (zi, zi))
                hits_break = ((n - r - (nlow + nhigh)) <= 4
                              ).astype(jnp.int32)
                removed = nlow + nhigh
                upd = (done == 0) & (hits_break == 0)
                lo = jnp.where(upd, lo + nlow, lo)
                hi = jnp.where(upd, hi - nhigh, hi)
                r = jnp.where(upd, r + removed, r)
                degen = jnp.maximum(
                    degen, jnp.where(done == 0, hits_break, 0))
                newdone = hits_break | ((removed == 0)
                                        | ((hi - lo) <= 3)
                                        ).astype(jnp.int32)
                done = jnp.maximum(done, newdone)
                # re-seed the fixed point for pixels that continue;
                # finished pixels keep conv=1 so the inner step skips
                # them (their med/sig are dead once done)
                cont = done == 0
                med0, sig0 = win_init(lo, hi)
                med_c = jnp.where(cont, med0, med_c)
                sig_c = jnp.where(cont, sig0, sig_c)
                conv = jnp.where(cont, 0, 1)

                def pC(i, c):
                    sv = svi_ref[pl.ds(i * SH, SH), :]
                    w = work_ref[pl.ds(i * SH, SH), :]
                    work_ref[pl.ds(i * SH, SH), :] = jnp.where(
                        cont, sv, w)
                    return c

                jax.lax.fori_loop(0, NS, pC, jnp.int32(0))
                return (lo, hi, r, done, degen, med_c, sig_c, conv,
                        oit + 1, jnp.int32(0), jnp.int32(0))

            def f_cond(fs):
                done, oit = fs[3], fs[8]
                return jnp.logical_and(jnp.min(done) == 0,
                                       oit < MAX_ITERS)

            def f_body(fs):
                # inner first; if it just converged (phase -> 1) the
                # outer step runs IN THE SAME ITERATION
                fs = jax.lax.cond(fs[10] == 0, w_inner, lambda s: s, fs)
                fs = jax.lax.cond(fs[10] == 1, w_outer, lambda s: s, fs)
                return fs

            med_i0, sig_i0 = win_init(z, full_n)
            fs0 = (z, full_n, z, jnp.zeros((1, tile), jnp.int32),
                   jnp.zeros((1, tile), jnp.int32), med_i0, sig_i0,
                   jnp.zeros((1, tile), jnp.int32), jnp.int32(0),
                   jnp.int32(0), jnp.int32(0))
            lo, hi, r, done, degen = jax.lax.while_loop(
                f_cond, f_body, fs0)[:5]

            # mean of x over the window == mean of svi shifted back by
            # the anchor; the sum is strip-accumulated so the epilogue
            # holds no full-height buffer either
            def pM(i, s):
                v = svi_ref[pl.ds(i * SH, SH), :]
                io = strip_iota(i)
                m = (io >= lo) & (io < hi)
                return s + jnp.sum(jnp.where(m, v, 0), axis=0,
                                   keepdims=True)

            s = jax.lax.fori_loop(0, NS, pM, zi)
            out_ref[:] = exact_mean_from_sum(
                s, hi - lo, offset=anchor).astype(jnp.uint16)
            degen_ref[:] = degen
            rejl_ref[:] = lo
            rejh_ref[:] = full_n - hi
            return

        if rejection == "winsorized":
            # anchor-centered shifted domain (see reject_winsorized's
            # f32 precision guard): anchor = middle order statistic of
            # the full sorted vector (integer)
            anchor = jnp.sum(jnp.where(iota == f_real // 2, x, 0),
                             axis=0, keepdims=True)
            svi = x - anchor
            lo_clip = -anchor.astype(jnp.float32)
            hi_clip = 65535.0 - anchor.astype(jnp.float32)
            # x and its f32 comparison copy are DEAD from here: the
            # clip loop works on svi, comparisons cast svi on the fly,
            # and the final mean is reconstructed from svi + anchor —
            # freeing two full (n_rows, tile) VMEM buffers (at f=1000
            # the kernel otherwise overflows the ~16 MB scoped limit)

            def round_shift(t):
                r = jnp.floor(t + 0.5)
                r = jnp.where(t <= lo_clip, lo_clip, r)
                return jnp.where(t > hi_clip, hi_clip, r)

            def win_init(lo, hi):
                """Starting (median, sigma) of the fixed point for the
                window [lo, lo+n): statistics of svi before any
                winsorization step (reject_winsorized's sigma/median
                head, stacking.c:1713-1716)."""
                n = hi - lo
                mask = (iota >= lo) & (iota < hi)
                med0 = win_median(svi, lo, n)
                anch0 = jnp.sum(jnp.where(iota == lo + n // 2, svi, 0),
                                axis=0, keepdims=True)
                sig0 = exact_sd(svi, mask, n, anch0)
                return med0, sig0

            # FLAT loop: the winsorization fixed point (stacking.c:
            # 1718-1736) nested inside the outer clip loop crashed
            # Mosaic's nested-while lowering for F >= 896 (hard
            # tpu_compile_helper exit, ROUND4.md) — the per-shape
            # _F_MAX ceiling that forced config 3's 1000-frame stack
            # onto the HBM path. The nesting is unnecessary: the inner
            # loop already synchronises the whole tile (it runs until
            # EVERY pixel's sigma converges; converged pixels are
            # frozen) before each outer window step, so the two loops
            # interleave exactly as a single while_loop with a scalar
            # phase flag — phase 0 runs one winsorization step for all
            # unconverged pixels, phase 1 runs one outer clip step and
            # re-seeds the fixed point for pixels that continue.
            # TWO SEQUENTIAL one-armed lax.conds execute only the live
            # step per iteration — and, unlike one two-armed cond,
            # their big temporaries are never simultaneously live, so
            # the scoped-VMEM stack is max(inner, outer), not the sum
            # (one two-armed cond measured 21.4M at F=1000, over the
            # 16M limit; the phase rides in the state tuple).
            med_i0, sig_i0 = win_init(z, full_n)
            work_ref[:] = svi

            def w_inner(state):
                (lo, hi, r, done, degen, med_c, sig_c, conv, oit, iit,
                 _) = state
                n = hi - lo
                mask = (iota >= lo) & (iota < hi)
                w = work_ref[:]
                m0 = med_c - 1.5 * sig_c
                m1 = med_c + 1.5 * sig_c
                # INTEGER clamp to the rounded bounds instead of the f32
                # where-chain `where(wf<m0, round_shift(m0), where(wf>m1,
                # round_shift(m1), wf))`: big broadcast f32 select chains
                # blow Mosaic's scoped-VMEM stack at F=1000 (measured
                # 21.2M > 16M; the integer min/max form compiles). For
                # INTEGER w the two are identical: w kept by the chain
                # satisfies ceil(m0) <= w <= floor(m1), and
                # floor(m0+0.5) <= ceil(m0), floor(m1) <= floor(m1+0.5),
                # so the min/max bounds never move a kept value; clamped
                # values hit exactly round_shift(m0)/round_shift(m1).
                r0 = round_shift(m0).astype(jnp.int32)
                r1 = round_shift(m1).astype(jnp.int32)
                wv_c = jnp.minimum(jnp.maximum(w, r0), r1)
                wv = jnp.where(mask, wv_c, w)
                # clamping tails is monotone: sorted window stays sorted
                med_new = win_median(wv, lo, n)
                anch = jnp.sum(jnp.where(iota == lo + n // 2, wv, 0),
                               axis=0, keepdims=True)
                sig_new = 1.134 * exact_sd(wv, mask, n, anch)
                # logical_or of comparisons, NOT jnp.where(cond, bool,
                # True): a select with a scalar bool broadcast lowers to
                # an i8->i1 trunci that this libtpu's Mosaic rejects
                # ("Unsupported target bitwidth for truncation")
                newconv = jnp.logical_or(
                    sig_c <= 0,
                    jnp.abs(sig_new - sig_c)
                    / jnp.maximum(sig_c, 1e-30) <= 0.0005)
                convb = conv != 0
                # branches write work_ref IN PLACE and return only the
                # small (1, tile) state: returning the big buffer
                # through lax.cond materialized an extra (n_rows, tile)
                # cond output (measured +5.4 MB scoped VMEM at F=1000)
                work_ref[:] = jnp.where(convb, w, wv)
                med_c = jnp.where(convb, med_c, med_new)
                sig_c = jnp.where(convb, sig_c, sig_new)
                conv = jnp.maximum(conv, newconv.astype(jnp.int32))
                iit = iit + 1
                # all active pixels converged (or the fixed-point
                # iteration cap hit) -> next iteration runs the outer
                # clip step
                phase = jnp.where(
                    jnp.logical_or(jnp.min(conv) != 0, iit >= MAX_ITERS),
                    jnp.int32(1), jnp.int32(0))
                return (lo, hi, r, done, degen, med_c, sig_c, conv,
                        oit, iit, phase)

            def w_outer(state):
                (lo, hi, r, done, degen, med_c, sig_c, conv, oit, iit,
                 _) = state
                n = hi - lo
                mask = (iota >= lo) & (iota < hi)
                # EXACT integer-diff form of the HBM predicate
                # `med - v > siglow*sig` (reject_winsorized): med is a
                # half-integer (mean of two order statistics) and v an
                # integer, so med - v is exact in f32 and the predicate
                # equals the real-arithmetic (2*med - 2v) > 2*(siglow*
                # sig); 2*med is an exact i32, the diff stays < 2^19 so
                # its f32 cast is exact, and doubling an f32 is exact —
                # bit-identical decisions without the big broadcast f32
                # subtraction that blows Mosaic's scoped-VMEM stack at
                # F=1000 (measured 20.7M > 16M; this form compiles).
                m2 = (2.0 * med_c).astype(jnp.int32)
                low = mask & ((m2 - 2 * svi).astype(jnp.float32)
                              > 2.0 * (siglow * sig_c))
                high = mask & ((2 * svi - m2).astype(jnp.float32)
                               > 2.0 * (sighigh * sig_c))
                nlow = jnp.sum(low, axis=0, keepdims=True
                               ).astype(jnp.int32)
                nhigh = jnp.sum(high, axis=0, keepdims=True
                                ).astype(jnp.int32)
                hits_break = ((n - r - (nlow + nhigh)) <= 4
                              ).astype(jnp.int32)
                removed = nlow + nhigh
                upd = (done == 0) & (hits_break == 0)
                lo = jnp.where(upd, lo + nlow, lo)
                hi = jnp.where(upd, hi - nhigh, hi)
                r = jnp.where(upd, r + removed, r)
                degen = jnp.maximum(
                    degen, jnp.where(done == 0, hits_break, 0))
                newdone = hits_break | ((removed == 0)
                                        | ((hi - lo) <= 3)).astype(jnp.int32)
                done = jnp.maximum(done, newdone)
                # re-seed the fixed point for pixels that continue;
                # finished pixels keep conv=1 so the inner step skips
                # them (their med/sig are dead once done)
                cont = done == 0
                med0, sig0 = win_init(lo, hi)
                med_c = jnp.where(cont, med0, med_c)
                sig_c = jnp.where(cont, sig0, sig_c)
                conv = jnp.where(cont, 0, 1)
                work_ref[:] = jnp.where(cont, svi, work_ref[:])
                return (lo, hi, r, done, degen, med_c, sig_c, conv,
                        oit + 1, jnp.int32(0), jnp.int32(0))

            def f_cond(fs):
                done, oit = fs[3], fs[8]
                return jnp.logical_and(jnp.min(done) == 0,
                                       oit < MAX_ITERS)

            def f_body(fs):
                # inner first; if it just converged (phase -> 1) the
                # outer step runs IN THE SAME ITERATION — identical
                # semantics to alternating iterations, fewer of them
                fs = jax.lax.cond(fs[10] == 0, w_inner, lambda s: s, fs)
                fs = jax.lax.cond(fs[10] == 1, w_outer, lambda s: s, fs)
                return fs

            fs0 = (z, full_n, z, jnp.zeros((1, tile), jnp.int32),
                   jnp.zeros((1, tile), jnp.int32), med_i0, sig_i0,
                   jnp.zeros((1, tile), jnp.int32), jnp.int32(0),
                   jnp.int32(0), jnp.int32(0))
            lo, hi, r, done, degen = jax.lax.while_loop(
                f_cond, f_body, fs0)[:5]
            mask = (iota >= lo) & (iota < hi)
            # mean of x over the window == mean of svi, shifted back by
            # the anchor inside the exact integer sum (x is dead above)
            out_ref[:] = exact_mean_u16(
                svi, mask, hi - lo, offset=anchor).astype(jnp.uint16)
            degen_ref[:] = degen
            rejl_ref[:] = lo
            rejh_ref[:] = full_n - hi
            return

        # ---- sigma: windowed iterative clip ----

        def estimate(lo, hi):
            """(median, sigma) of the window."""
            n = hi - lo
            mask = (iota >= lo) & (iota < hi)
            med = win_median(x, lo, n)
            anchor_w = jnp.sum(
                jnp.where(iota == lo + (n - 1) // 2, x, 0),
                axis=0, keepdims=True)
            sig = exact_sd(x, mask, n, anchor_w)
            return med, sig

        # comparison values are cast per outer iteration (a (n_rows,
        # tile) VPU cast, ~free vs estimate()) instead of held live in
        # f32 across the whole loop
        cmp_src = x

        def cond(state):
            lo, hi, r, done, degen, it = state
            # done carried as int32 (Mosaic cannot carry i1 vectors)
            return jnp.logical_and(jnp.min(done) == 0, it < MAX_ITERS)

        def body(state):
            lo, hi, r, done, degen, it = state
            n = hi - lo
            mask = (iota >= lo) & (iota < hi)
            median, sigma = estimate(lo, hi)
            cmp_vals = cmp_src.astype(jnp.float32)
            low = mask & (median - cmp_vals > siglow * sigma)
            high = mask & (cmp_vals - median > sighigh * sigma)
            nlow = jnp.sum(low, axis=0, keepdims=True).astype(jnp.int32)
            nhigh = jnp.sum(high, axis=0, keepdims=True).astype(jnp.int32)
            # the C scan breaks iff n - (r + c) <= 4 for some prefix
            # count c (max c = nlow + nhigh), incl. c == 0 when
            # n - r <= 4 already; such pixels freeze as DEGENERATE and
            # the wrapper re-runs them through the exact masked kernel
            hits_break = ((n - r - (nlow + nhigh)) <= 4).astype(jnp.int32)
            removed = nlow + nhigh
            upd = (done == 0) & (hits_break == 0)
            lo = jnp.where(upd, lo + nlow, lo)
            hi = jnp.where(upd, hi - nhigh, hi)
            r = jnp.where(upd, r + removed, r)
            degen = jnp.maximum(degen, jnp.where(done == 0, hits_break, 0))
            newdone = hits_break | ((removed == 0) | ((hi - lo) <= 3)
                                    ).astype(jnp.int32)
            done = jnp.maximum(done, newdone)
            return lo, hi, r, done, degen, it + 1

        state = (z, full_n, z, jnp.zeros((1, tile), jnp.int32),
                 jnp.zeros((1, tile), jnp.int32), jnp.int32(0))
        lo, hi, r, done, degen, _ = jax.lax.while_loop(cond, body, state)
        mask = (iota >= lo) & (iota < hi)
        out_ref[:] = exact_mean_u16(x, mask, hi - lo).astype(jnp.uint16)
        degen_ref[:] = degen
        # window movements ARE the counters: every counted low reject
        # advanced lo, every high reject lowered hi (degenerate pixels
        # are overridden by the exact fallback)
        rejl_ref[:] = lo
        rejh_ref[:] = full_n - hi

    return kernel


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


#: rough count of live (n_rows, tile) arrays per rejection (sorted data,
#: comparison copy, winsorized working set, Mosaic temporaries).
#: MEASURED calibration points (v5e, 2026-08): winsorized f=1000
#: tile=256 → 16.78 MB scoped = 16.4 buffers; sigma f=256 tile=1024 →
#: 16.65 MB scoped = 15.9 buffers (OOM; tile=512 compiles and runs
#: 0.043 s steady at 640x480) while f=100 tile=2048 runs the north-star
#: batches — 12 keeps the f=100/tile-2048 pick AND lands f=256 on
#: tile 512 first try. The factor is a planning estimate only —
#: reject_stack_auto retries smaller tiles when a shape still
#: overflows the scoped-VMEM limit.
_VMEM_FACTOR = {"sigma": 12, "percentile": 5, "sigmedian": 12,
                "winsorized": 17, "median": 5}
_VMEM_BUDGET = 12 << 20   # of the chip's ~16 MB VMEM

#: full-height-body ceiling for the fused winsorized kernel (v5e,
#: 2026-08). History: the NESTED winsorized loop (fixed point inside
#: the clip loop) hard-crashed Mosaic's nested-while lowering at
#: F>=896 (_F_MAX was 768). The FLAT phase-machine loop (r5) lowers
#: cleanly — F=896 compiles and runs — but F=1000 overflows the 16 MB
#: scoped-VMEM stack (21.42M measured at tile 128, invariant across
#: cond restructurings AND the integer clamp/compare rewrites; EACH
#: phase ablated alone measures 21.18M — the driver is the full-height
#: win_median+exact_sd temporaries). Beyond this the kernel switches
#: to the STRIP-REDUCTION body (fori_loop over row strips, (1, tile)
#: accumulators), which compiles and runs at F=1000 (probed live).
_FULL_F_MAX = 896

#: measured frame-count ceilings for the fused kernels on this Mosaic.
#: The strip body removes the stack blow-up; the remaining ceiling is
#: the full-height sort-network preamble + VMEM data capacity (probed
#: OK at F=1000/tile=128; 1024 is the next pow2 — failures beyond it
#: degrade gracefully via the scoped-OOM retry in reject_stack_auto).
_F_MAX = {"winsorized": 1024}

#: lane-aligned tile candidates, largest first
_TILES = (2048, 1024, 512, 256, 128)

#: rejections whose kernel failed to compile on this backend at runtime
#: (callers then use the HBM path); per-process memo so a Mosaic
#: limitation degrades to the slow-but-correct path instead of crashing
_RUNTIME_DISABLED: set = set()


def fused_usable(rejection: str) -> bool:
    return (rejection in PALLAS_REJECTIONS
            and rejection not in _RUNTIME_DISABLED)


def disable_fused(rejection: str, exc: BaseException) -> None:
    import warnings
    _RUNTIME_DISABLED.add(rejection)
    warnings.warn(f"fused {rejection} kernel unavailable on this "
                  f"backend ({type(exc).__name__}); using the HBM path",
                  stacklevel=3)


#: measured per-rejection tile caps: for sigma at the north-star shape
#: (F=100, 4096^2) tile 1024 runs 4% faster than 2048 (0.368 vs 0.383 s
#: per batch, 3-rep same-window A/B, 2026-08) — the shorter grid step
#: pipelines the HBM->VMEM DMA better than the larger block amortizes
_TILE_CAP = {"sigma": 1024}


def pick_tile(f: int, rejection: str, p: int):
    """Largest lane-aligned tile that keeps the kernel's working set
    within VMEM (None when even the smallest tile cannot fit — the
    caller must use the HBM block path). Frame counts in the hundreds
    shrink the tile instead of failing."""
    if f > _F_MAX.get(rejection, 1 << 30):
        return None
    if rejection in ("sigma", "winsorized") and f <= 4:
        # N <= 4 hits the reference's mid-scan break on EVERY pixel
        # (stacking.c:1684), so the whole plane would be degenerate —
        # far beyond the DEGEN_K exact-fixup budget. Tiny stacks run
        # the bit-exact HBM path (they're cheap there anyway).
        return None
    n_rows = -(-f // _SUBLANE) * _SUBLANE
    factor = _VMEM_FACTOR[rejection]
    cap = _TILE_CAP.get(rejection, _TILES[0])
    for tile in (t for t in _TILES if t <= cap):
        # strict <: a pick exactly AT budget (sigma f=256/tile=1024,
        # 12.58M) was measured borderline — 16.65M scoped on one
        # compile, under 16M on another — so land one tile lower
        if p % tile == 0 and factor * n_rows * tile * 4 < _VMEM_BUDGET:
            return tile
    return None


def _is_vmem_oom(exc: BaseException) -> bool:
    s = str(exc).lower()
    return "vmem" in s and ("out of memory" in s or "exceeded" in s)


def _is_transient(exc: BaseException) -> bool:
    """Errors that say nothing about the KERNEL: HBM exhaustion from
    other live arrays, a dropped tunnel. Fall back for this call
    without disabling the fused path for the process."""
    s = str(exc)
    return ("RESOURCE_EXHAUSTED" in s or "ResourceExhausted" in s
            or "UNAVAILABLE" in s or "DEADLINE_EXCEEDED" in s)


def _is_compiler_crash(exc: BaseException) -> bool:
    """A remote-compile hard failure (HTTP 500 / compile-helper exit).
    Observed both as a per-shape Mosaic crash (winsorized F>=896) and
    as a wedged-tunnel transient — either way it condemns at most the
    SHAPE, never the rejection: fall back to the HBM path for this
    frame count and keep the fused kernel for others."""
    s = str(exc)
    return "remote_compile" in s or "compile_helper" in s \
        or "tpu_compile_helper" in s


#: (rejection, f) shapes that overflowed scoped VMEM even at the
#: smallest tile — those shapes use the HBM path, WITHOUT disabling the
#: fused kernel for other frame counts (OOM is a property of the shape,
#: not the backend)
_OOM_SHAPES: set = set()

#: (rejection, f, tile, p) shapes whose kernel has been compiled AND
#: executed on this backend — steady-state calls skip the validation
#: sync below and stay fully async
_OK_SHAPES: set = set()


def _force(result) -> bool:
    """Materialize one scalar so a DEFERRED compile/launch error
    surfaces here, inside reject_stack_auto's handler. On the axon
    backend Pallas compilation happens at consumption, not dispatch —
    ``jax.block_until_ready`` does not block there, so fetch an
    element (one u16 transfer). Under an outer jit trace the value is
    abstract and cannot be forced — returns False so the caller does
    not mark the shape validated (the deferred error, if any, will
    surface at the outer jit's consumption)."""
    arr = result[0] if isinstance(result, tuple) else result
    if isinstance(arr, jax.core.Tracer):
        return False
    float(arr[0])
    return True


def reject_stack_auto(vals: jnp.ndarray, rejection: str, siglow: float,
                      sighigh: float, with_counters: bool = False):
    """Fused VMEM stack with automatic tile sizing and OOM retry.

    Walks lane-aligned tiles downward from :func:`pick_tile`'s
    estimate; a scoped-VMEM OOM (the static factor table
    underestimating a shape's live set) retries the next smaller tile
    instead of abandoning the fused path, while any other Mosaic
    failure disables the rejection for the process
    (:func:`disable_fused`). Returns ``None`` when the fused path is
    unavailable — the caller falls back to the HBM block kernels.
    ``vals.shape[1]`` must be divisible by some tile candidate (pad to
    a multiple of 128 at the call site)."""
    if not (fused_usable(rejection) and _on_tpu()):
        return None
    f, p = vals.shape
    if (rejection, f) in _OOM_SHAPES:
        return None
    first = pick_tile(f, rejection, p)
    if first is None:
        return None
    traced = isinstance(vals, jax.core.Tracer)
    for tile in [t for t in _TILES if t <= first and p % t == 0]:
        try:
            key = (rejection, f, tile, p)
            if traced and key not in _OK_SHAPES:
                # called under an OUTER jit (e.g. the file-backed block
                # engine's kernel): a deferred compile failure would
                # surface at the outer jit's execute, past this handler
                # — so AOT-compile the EXACT shape eagerly first (shape
                # structs only, legal under trace). A scoped-VMEM OOM
                # or compiler crash is re-raised into the outer handler
                # (tile walk / shape memo); any OTHER failure (e.g. a
                # backend that cannot AOT-lower this kernel, like the
                # CPU test env) keeps the optimistic deferred behavior.
                try:
                    _reject_stack_raw.lower(
                        jax.ShapeDtypeStruct((f, p), jnp.uint16),
                        rejection=rejection, siglow=float(siglow),
                        sighigh=float(sighigh), tile=tile,
                        interpret=False).compile()
                    _OK_SHAPES.add(key)
                except Exception as e:
                    if _is_vmem_oom(e) or _is_compiler_crash(e):
                        raise
            out = reject_stack_pallas(vals, rejection, float(siglow),
                                      float(sighigh), tile=tile,
                                      with_counters=with_counters)
            # first run of a new shape: force the (deferred) compile to
            # finish so a scoped-VMEM OOM is caught HERE and the tile
            # walk proceeds; validated shapes stay fully async
            if key not in _OK_SHAPES and _force(out):
                _OK_SHAPES.add(key)
            return out
        except Exception as e:
            if _is_vmem_oom(e):
                if tile > _TILES[-1]:
                    continue
                _OOM_SHAPES.add((rejection, f))
                return None
            if _is_compiler_crash(e):
                _OOM_SHAPES.add((rejection, f))
                return None
            if _is_transient(e):
                return None
            disable_fused(rejection, e)
            return None
    return None


@functools.partial(jax.jit, static_argnames=("rejection", "siglow",
                                             "sighigh", "tile", "interpret"))
def _reject_stack_raw(vals: jnp.ndarray, rejection: str, siglow: float,
                      sighigh: float, tile: int, interpret: bool):
    f, p = vals.shape
    assert p % tile == 0, f"P={p} not a multiple of tile={tile}"
    kernel = _make_kernel(f, tile, float(siglow), float(sighigh), rejection)
    n_rows, plan = _plan_stages(f)
    roll_stages = [s for s in plan if s[0] == "roll"]
    nmask = max(2 * len(roll_stages), 2)
    masks = np.zeros((nmask, n_rows), dtype=np.int32)
    for ri, (_, _, lo, hi) in enumerate(roll_stages):
        masks[2 * ri] = lo
        masks[2 * ri + 1] = hi
    row = pl.BlockSpec((1, tile), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    # winsorized/sigmedian mutate a working copy across loop iterations;
    # it lives in a VMEM scratch ref (one buffer, in-place) instead of
    # the while_loop carry (which Mosaic double-buffers + spills).
    # The strip-reduction winsorized path (f > _FULL_F_MAX) additionally
    # keeps the sorted shifted vector in a scratch ref so the outer
    # clip's comparisons can be strip-read instead of held live.
    scratch = ([pltpu.VMEM((n_rows, tile), jnp.int32)]
               if rejection in ("winsorized", "sigmedian") else [])
    if rejection == "winsorized" and f > _FULL_F_MAX:
        scratch.append(pltpu.VMEM((n_rows, tile), jnp.int32))
    out, degen, rejl, rejh = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((1, p), jnp.uint16),
                   jax.ShapeDtypeStruct((1, p), jnp.int32),
                   jax.ShapeDtypeStruct((1, p), jnp.int32),
                   jax.ShapeDtypeStruct((1, p), jnp.int32)],
        grid=(p // tile,),
        in_specs=[
            pl.BlockSpec((nmask, n_rows), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[row, row, row, row],
        scratch_shapes=scratch,
        interpret=interpret,
    )(jnp.asarray(masks), vals)
    return out[0], degen[0], rejl[0], rejh[0]


@functools.partial(jax.jit, static_argnames=("rejection", "siglow",
                                             "sighigh", "tile",
                                             "interpret", "with_counters"))
def reject_stack_pallas(vals: jnp.ndarray, rejection: str, siglow: float,
                        sighigh: float, tile: int = 2048,
                        interpret: bool = False,
                        with_counters: bool = False):
    """Rejection stack of (F, P) uint16 values -> (P,) uint16 (or
    (mean, rejlow, rejhigh) with ``with_counters``), fused in VMEM,
    bit-exact vs ``reject_and_mean`` including the counters.

    P must be a multiple of ``tile`` (pad at the call site; use
    :func:`pick_tile` to fit the VMEM budget for large F). For sigma
    and winsorized, up to DEGEN_K pixels that hit the reference's
    degenerate mid-scan-break path are re-run on-device through the
    exact masked kernel (a (F, DEGEN_K) gather — static shapes, no
    host sync); beyond DEGEN_K the window result stands.
    """
    f, p = vals.shape
    mean, degen, rejl, rejh = _reject_stack_raw(
        vals, rejection, float(siglow), float(sighigh), tile, interpret)
    if rejection in ("sigma", "winsorized"):
        from siriltpu.ops.rejection import (_mean_of_survivors,
                                            reject_sigma,
                                            reject_winsorized)
        degen_b = degen != 0
        idx = jnp.nonzero(degen_b, size=DEGEN_K, fill_value=p)[0]
        safe = jnp.minimum(idx, p - 1)
        cols = jnp.take(vals, safe, axis=1).astype(jnp.float32)
        sel = jnp.take(degen_b, safe)
        if rejection == "sigma":
            valid, v, srl, srh = reject_sigma(
                cols, float(siglow), float(sighigh), active=sel)
        else:
            valid, v, srl, srh = reject_winsorized(
                cols, float(siglow), float(sighigh))
        fix = _mean_of_survivors(v, valid)
        mean = mean.at[safe].set(
            jnp.where(sel, fix, jnp.take(mean, safe)))
        rejl = rejl.at[safe].set(
            jnp.where(sel, srl, jnp.take(rejl, safe)))
        rejh = rejh.at[safe].set(
            jnp.where(sel, srh, jnp.take(rejh, safe)))
    if with_counters:
        return mean, rejl, rejh
    return mean


@functools.partial(jax.jit, static_argnames=("siglow", "sighigh", "tile",
                                             "interpret"))
def sigma_stack_pallas(vals: jnp.ndarray, siglow: float, sighigh: float,
                       tile: int = 2048, interpret: bool = False) -> jnp.ndarray:
    """Sigma-clip rejection stack of (F, P) uint16 values -> (P,) uint16
    (compat wrapper over :func:`reject_stack_pallas`)."""
    return reject_stack_pallas(vals, "sigma", siglow, sighigh, tile=tile,
                               interpret=interpret)


__all__ = ["sigma_stack_pallas", "reject_stack_pallas",
           "reject_stack_auto", "pick_tile", "PALLAS_REJECTIONS",
           "DEGEN_K"]
