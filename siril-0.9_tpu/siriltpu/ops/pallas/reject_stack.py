"""Fused Pallas kernel: per-pixel sort + sigma-clip rejection + mean.

The hottest op of the whole framework (SURVEY §7.4.3): stacking
100×4096² frames needs a sort of every cross-frame pixel vector. On HBM
the 28-stage sorting network is bandwidth-bound (~1 s per GB-scale
block); this kernel loads an (F, TILE) slab into VMEM ONCE, runs the
whole Batcher network, the windowed sigma-clip fixed-point loop, and the
survivor mean in VMEM, and writes back just the (TILE,) result —
HBM traffic collapses to one read of the data plus a 0.1% write.

Each Batcher stage has a uniform partner offset k, so it lowers to two
``pltpu.roll`` shifts along the sublane axis plus masked min/max — pure
VPU work. Semantics match :func:`siriltpu.ops.rejection.reject_sigma_window`.
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
        lo = lo[:n_rows]
        hi = hi[:n_rows]
        segs = (slice_segments(k, lo, hi, n_rows, _SUBLANE)
                if k >= _SUBLANE else None)
        if segs is not None:
            plan.append(("slice", segs))
        else:
            plan.append(("roll", k, lo, hi))
    return n_rows, plan


def _make_kernel(f_real: int, tile: int, siglow: float, sighigh: float):
    n_rows, plan = _plan_stages(f_real)

    def kernel(masks_ref, x_ref, out_ref):
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
        xf = x.astype(jnp.float32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (n_rows, tile), 0)

        def win_stats(lo, hi):
            n = hi - lo
            nf = n.astype(jnp.float32)
            mask = (iota >= lo) & (iota < hi)
            s1 = jnp.sum(jnp.where(mask, xf, 0.0), axis=0, keepdims=True)
            mean = s1 / jnp.maximum(nf, 1.0)
            d = jnp.where(mask, xf - mean, 0.0)
            var = jnp.sum(d * d, axis=0, keepdims=True) / jnp.maximum(nf - 1.0, 1.0)
            sigma = jnp.where(n > 1, jnp.sqrt(var), 0.0)
            # sorted-window median via ONE one-hot sum (no gather on
            # TPU VMEM): weight rank k1 and k2 each once — when they
            # coincide (odd n) the weight is 2, so 0.5*sum is exact
            k1 = lo + (n - 1) // 2
            k2 = lo + n // 2
            wmed = ((iota == k1).astype(jnp.float32) +
                    (iota == k2).astype(jnp.float32))
            median = 0.5 * jnp.sum(wmed * xf, axis=0, keepdims=True)
            return n, mask, median, sigma

        def cond(state):
            lo, hi, r, done, it = state
            # done carried as int32 (Mosaic cannot carry i1 vectors)
            return jnp.logical_and(jnp.min(done) == 0, it < MAX_ITERS)

        def body(state):
            lo, hi, r, done, it = state
            n, mask, median, sigma = win_stats(lo, hi)
            low = mask & (median - xf > siglow * sigma)
            high = mask & (xf - median > sighigh * sigma)
            nlow = jnp.sum(low, axis=0, keepdims=True).astype(jnp.int32)
            nhigh = jnp.sum(high, axis=0, keepdims=True).astype(jnp.int32)
            over = (n - r) <= 4
            budget = jnp.where(over, jnp.where(nlow > 0, 1, 0), n - 4 - r)
            a_low = jnp.minimum(nlow, jnp.maximum(budget, 0))
            a_high = jnp.minimum(nhigh, jnp.maximum(budget - a_low, 0))
            removed = a_low + a_high
            upd = done == 0
            lo = jnp.where(upd, lo + a_low, lo)
            hi = jnp.where(upd, hi - a_high, hi)
            r = jnp.where(upd, r + removed, r)
            newdone = (removed == 0) | ((hi - lo) <= 3)
            done = jnp.maximum(done, newdone.astype(jnp.int32))
            return lo, hi, r, done, it + 1

        z = jnp.zeros((1, tile), jnp.int32)
        state = (z, jnp.full((1, tile), f_real, jnp.int32), z,
                 jnp.zeros((1, tile), jnp.int32), jnp.int32(0))
        lo, hi, r, done, _ = jax.lax.while_loop(cond, body, state)
        mask = (iota >= lo) & (iota < hi)
        nf = (hi - lo).astype(jnp.float32)
        s = jnp.sum(jnp.where(mask, xf, 0.0), axis=0, keepdims=True)
        mean = s / jnp.maximum(nf, 1.0)
        # round_to_WORD (f32 -> u16 needs an i32 hop on Mosaic)
        mean = jnp.floor(mean + 0.5)
        mean = jnp.clip(mean, 0.0, 65535.0)
        out_ref[:] = mean.astype(jnp.int32).astype(jnp.uint16)

    return kernel


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("siglow", "sighigh", "tile",
                                             "interpret"))
def sigma_stack_pallas(vals: jnp.ndarray, siglow: float, sighigh: float,
                       tile: int = 2048, interpret: bool = False) -> jnp.ndarray:
    """Sigma-clip rejection stack of (F, P) uint16 values -> (P,) uint16.

    P must be a multiple of ``tile`` (pad at the call site).
    """
    f, p = vals.shape
    assert p % tile == 0, f"P={p} not a multiple of tile={tile}"

    kernel = _make_kernel(f, tile, float(siglow), float(sighigh))
    n_rows, plan = _plan_stages(f)
    roll_stages = [s for s in plan if s[0] == "roll"]
    nmask = max(2 * len(roll_stages), 2)
    masks = np.zeros((nmask, n_rows), dtype=np.int32)
    for ri, (_, _, lo, hi) in enumerate(roll_stages):
        masks[2 * ri] = lo
        masks[2 * ri + 1] = hi
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, p), jnp.uint16),
        grid=(p // tile,),
        in_specs=[
            pl.BlockSpec((nmask, n_rows), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(masks), vals)
    return out[0]


__all__ = ["sigma_stack_pallas"]
