"""Host allocator tuning for large-array workloads.

This environment's VM has pathologically slow first-touch page faulting
(10-20 ms/MB, fluctuating): glibc munmaps every freed large buffer, so
each fresh 50-200 MB NumPy temporary re-faults its pages and a single
statistics pass can cost seconds instead of ~0.1 s.

``retain_heap()`` turns off glibc's mmap path for large allocations
(M_MMAP_MAX=0) and heap trimming (M_TRIM_THRESHOLD=-1), so big blocks
come from the sbrk heap and their pages stay resident across
free/alloc cycles — first-touch is paid once per process. Measured on
the global-star-alignment pipeline: statistics' FnNoise1 drops from
~2.7 s/frame back to ~0.1 s/frame after the first call.

No effect (and harmless) on non-glibc platforms.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_M_TRIM_THRESHOLD = -1
_M_MMAP_MAX = -4

_done = False


def retain_heap() -> bool:
    """Keep freed large blocks on the heap instead of munmapping them.
    Returns True if mallopt was reachable and accepted both knobs."""
    global _done
    if _done:
        return True
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        ok1 = libc.mallopt(_M_MMAP_MAX, 0)
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, -1)
        _done = bool(ok1) and bool(ok2)
    except (OSError, AttributeError):
        _done = False
    return _done


__all__ = ["retain_heap"]
