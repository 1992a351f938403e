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


def _plan_stages(n_pad: int):
    """Per sort stage, choose the cheapest Mosaic realization:
    ('slice', segments) when the stage decomposes into sublane-aligned
    contiguous runs (no roll, no select — sliced min/max + concat),
    else ('roll', k, lo, hi) for the two-roll masked form."""
    plan = []
    for k, lo, hi in stage_offsets(n_pad):
        segs = (slice_segments(k, lo, hi, n_pad, _SUBLANE)
                if k >= _SUBLANE else None)
        if segs is not None:
            plan.append(("slice", segs))
        else:
            plan.append(("roll", k, lo, hi))
    return plan


def _make_kernel(f_real: int, n_pad: int, tile: int, siglow: float,
                 sighigh: float):
    plan = _plan_stages(n_pad)

    def kernel(masks_ref, x_ref, out_ref):
        # (f_real, tile) block; pad rows (constant 65535) are appended
        # IN VMEM so the (n_pad, P) padded copy never exists in HBM —
        # that concatenate cost a ~4 GB HBM round trip per 100x4K^2
        # batch. Pad rows equal the max value, so after the sort the
        # prefix of length f_real is multiset-equal to the real data
        # (ties between real and pad values can only swap equal values).
        x = x_ref[:].astype(jnp.int32)
        if n_pad != f_real:
            x = jnp.concatenate(
                [x, jnp.full((n_pad - f_real, tile), 65535, jnp.int32)],
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
                xd = pltpu.roll(x, (n_pad - k) % n_pad, 0)  # from i+k
                xu = pltpu.roll(x, k, 0)                    # from i-k
                x = jnp.where(lom, jnp.minimum(x, xd),
                              jnp.where(him, jnp.maximum(x, xu), x))
                ri += 1
        xf = x.astype(jnp.float32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (n_pad, tile), 0)

        def win_stats(lo, hi):
            n = hi - lo
            nf = n.astype(jnp.float32)
            mask = (iota >= lo) & (iota < hi)
            s1 = jnp.sum(jnp.where(mask, xf, 0.0), axis=0, keepdims=True)
            mean = s1 / jnp.maximum(nf, 1.0)
            d = jnp.where(mask, xf - mean, 0.0)
            var = jnp.sum(d * d, axis=0, keepdims=True) / jnp.maximum(nf - 1.0, 1.0)
            sigma = jnp.where(n > 1, jnp.sqrt(var), 0.0)
            # sorted-window median via one-hot sums (no gather on TPU VMEM)
            k1 = lo + (n - 1) // 2
            k2 = lo + n // 2
            v1 = jnp.sum(jnp.where(iota == k1, xf, 0.0), axis=0, keepdims=True)
            v2 = jnp.sum(jnp.where(iota == k2, xf, 0.0), axis=0, keepdims=True)
            median = 0.5 * (v1 + v2)
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
    n_pad = 1 << (f - 1).bit_length()

    kernel = _make_kernel(f, n_pad, tile, float(siglow), float(sighigh))
    roll_stages = [s for s in _plan_stages(n_pad) if s[0] == "roll"]
    nrows = max(2 * len(roll_stages), 2)
    masks = np.zeros((nrows, n_pad), dtype=np.int32)
    for ri, (_, _, lo, hi) in enumerate(roll_stages):
        masks[2 * ri] = lo
        masks[2 * ri + 1] = hi
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, p), jnp.uint16),
        grid=(p // tile,),
        in_specs=[
            pl.BlockSpec((nrows, n_pad), lambda i: (0, 0),
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
