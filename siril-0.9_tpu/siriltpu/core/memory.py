"""Memory probing and stacking block budgeting.

Reference: ``get_available_memory_in_MB`` (src/core/utils.c:354),
``update_used_memory`` (:311), and the stacking memory model
(stacking.c:1903-1915): rows per block =
memory_percent · available_MB / (rx · nb_frames · 2 bytes · nthreads).
"""

from __future__ import annotations



def get_available_memory_mb() -> int:
    """Available system memory in MB (MemAvailable from /proc/meminfo)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) // 1024
    except OSError:
        pass
    return 2048


def get_used_memory_mb() -> int:
    """Resident set size of this process in MB (update_used_memory)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) // 1024
    except OSError:
        pass
    return 0


def stacking_block_rows(rx: int, nb_frames: int, *,
                        memory_percent: float = 0.9,
                        nthreads: int = 1,
                        bytes_per_px: int = 2) -> int:
    """The reference's row budget (stacking.c:1906-1915), with the
    >=4-blocks-per-channel floor handled by the caller."""
    mem_bytes = get_available_memory_mb() * (1 << 20) * memory_percent
    rows = int(mem_bytes / (rx * nb_frames * bytes_per_px * max(nthreads, 1)))
    return max(rows, 1)


__all__ = ["get_available_memory_mb", "get_used_memory_mb",
           "stacking_block_rows"]
