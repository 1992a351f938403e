"""Sorting network for the frame axis of stacking blocks.

XLA's generic sort on TPU is slow for (F, P) arrays along the small F
axis (measured: seconds per 100x1M block). Stacking only ever sorts the
cross-frame pixel vector — F is small (tens to ~1000) and static — so a
Batcher odd-even mergesort NETWORK lowers to ~log2(F)^2 elementwise
min/max stages over (P,)-wide lanes: pure VPU work, ~15 ms per 400 MB
block instead of seconds.

The network is generated at trace time for the padded power-of-two size;
padding uses a +max sentinel and is sliced off (multiset-safe).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _batcher_pairs(n: int) -> Tuple[Tuple[int, int], ...]:
    """Compare-exchange pairs of Batcher's odd-even mergesort for size n
    (n must be a power of two). Standard iterative formulation."""
    pairs: List[Tuple[int, int]] = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(0, min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return tuple(pairs)


@functools.lru_cache(maxsize=None)
def _stages(n: int) -> Tuple[Tuple[Tuple[int, int], ...], ...]:
    """Group the pairs into parallel stages (no index appears twice in a
    stage) so each stage is one vectorized min/max shuffle."""
    stages: List[List[Tuple[int, int]]] = []
    busy: List[set] = []
    for a, b in _batcher_pairs(n):
        placed = False
        # pairs are emitted roughly in dependency order; only append to
        # the LAST stage or start a new one to preserve ordering
        if stages and a not in busy[-1] and b not in busy[-1]:
            stages[-1].append((a, b))
            busy[-1].update((a, b))
            placed = True
        if not placed:
            stages.append([(a, b)])
            busy.append({a, b})
    return tuple(tuple(s) for s in stages)


@functools.lru_cache(maxsize=None)
def stage_offsets(n: int):
    """Per stage: (k, lo_mask (n,), hi_mask (n,)) where every pair in
    the stage is (i, i+k). Stages are the canonical (p, k) rounds
    (``_runs``), whose masks keep Batcher's contiguous-block structure.
    This form lets a Pallas kernel realize a stage as two axis-0 rolls
    + masked min/max, or — when ``slice_segments`` applies — as static
    sublane slices with no roll at all."""
    out = []
    for k, pairs in _runs(n):
        lo = np.zeros(n, dtype=bool)
        hi = np.zeros(n, dtype=bool)
        for a, b in pairs:
            lo[a] = True
            hi[b] = True
        out.append((k, lo, hi))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _runs(n: int):
    """Batcher's network grouped into its canonical (p, k) rounds.
    Each round's comparators are index-disjoint (asserted), share one
    offset k, and the round order preserves the pair emission order —
    unlike the greedy packer below, a round never absorbs strays from
    a neighboring round, so its masks keep their contiguous-block
    structure (which the Pallas slice-exchange form needs)."""
    rounds = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            pairs = []
            for j in range(k % p, n - k, 2 * k):
                for i in range(0, min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            if pairs:
                seen = set()
                for a, b in pairs:
                    assert a not in seen and b not in seen
                    seen.update((a, b))
                rounds.append((k, tuple(pairs)))
            k //= 2
        p *= 2
    return tuple(rounds)


def slice_segments(k: int, lo: np.ndarray, hi: np.ndarray, n: int,
                   align: int):
    """Ordered output segments realizing a compare-exchange stage with
    static sublane slices, or None if the masks don't decompose into
    aligned runs. Segments are (kind, a, b, L): output takes
    min/max of x[a:a+L] and x[b:b+L] ('pass' copies x[a:a+L])."""
    lo_pos = np.where(lo)[0]
    hi_pos = np.where(hi)[0]
    if not np.array_equal(hi_pos, lo_pos + k):
        return None
    lo_set = set(lo_pos.tolist())
    hi_set = set(hi_pos.tolist())
    segs = []
    i = 0
    while i < n:
        if i in lo_set:
            L = 1
            while i + L in lo_set:
                L += 1
            if L > k:
                return None  # would overlap its own partner block
            segs.append(("min", i, i + k, L))
            i += L
        elif i in hi_set:
            L = 1
            while i + L in hi_set and i + L not in lo_set:
                L += 1
            if L > k:
                return None
            segs.append(("max", i - k, i, L))
            i += L
        else:
            s = i
            while i < n and i not in lo_set and i not in hi_set:
                i += 1
            segs.append(("pass", s, s, i - s))
    for _, a, b, L in segs:
        if a % align or b % align or L % align:
            return None
    return segs


@functools.lru_cache(maxsize=None)
def _stage_tables(n: int):
    """Per stage: (partner permutation, role) arrays of length n.
    role +1 = take min with partner, -1 = take max, 0 = passthrough.
    Each stage then costs ONE static gather + elementwise select."""
    tables = []
    for stage in _stages(n):
        perm = np.arange(n)
        role = np.zeros(n, dtype=np.int8)
        for a, b in stage:
            perm[a], perm[b] = b, a
            role[a] = 1
            role[b] = -1
        tables.append((perm, role))
    return tuple(tables)


def sort_axis0(x: jnp.ndarray) -> jnp.ndarray:
    """Ascending sort along axis 0 via the odd-even merge network."""
    f = x.shape[0]
    n = 1 << (f - 1).bit_length()
    if n != f:
        if jnp.issubdtype(x.dtype, jnp.floating):
            sentinel = jnp.asarray(jnp.inf, x.dtype)
        else:
            sentinel = jnp.asarray(jnp.iinfo(x.dtype).max, x.dtype)
        pad = jnp.full((n - f,) + x.shape[1:], sentinel, x.dtype)
        x = jnp.concatenate([x, pad], axis=0)

    shape1 = (n,) + (1,) * (x.ndim - 1)
    for perm, role in _stage_tables(n):
        xp = jnp.take(x, jnp.asarray(perm), axis=0)
        r = jnp.asarray(role).reshape(shape1)
        x = jnp.where(r == 1, jnp.minimum(x, xp),
                      jnp.where(r == -1, jnp.maximum(x, xp), x))
    return x[:f]


__all__ = ["sort_axis0"]
