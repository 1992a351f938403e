"""Persistent XLA compilation cache.

Every siriltpu entry point (CLI, benchmarks, the graft driver) pays a
~20-40 s first-compile penalty per kernel per process without this.
Enabling ``jax_compilation_cache_dir`` persists compiled executables on
disk so a cold *process* is no longer a cold *cache* — the star finder
drops from ~29 s to <2 s on the second process.

This replaces nothing in the reference (C is ahead-of-time compiled);
it is TPU/XLA hygiene.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Point JAX at a persistent on-disk compilation cache.

    Idempotent. Honors ``SIRILTPU_COMPILE_CACHE`` (set to ``0``/``off``
    to disable, or to a directory path to relocate). Default location:
    ``~/.cache/siriltpu/jax``.

    Must run before the first ``jax.jit`` trace to help that trace;
    safe (but less useful) afterwards.

    Also applies the host allocator tuning (utils/hostmem.retain_heap):
    every siriltpu entry point wants both, and this is the one call they
    all share.
    """
    from siriltpu.utils.hostmem import retain_heap
    retain_heap()
    global _ENABLED
    env = os.environ.get("SIRILTPU_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "false", "none"):
        return ""
    if cache_dir is None:
        cache_dir = env if env and env.lower() not in ("1", "on", "true") \
            else os.path.join(os.path.expanduser("~"), ".cache",
                              "siriltpu", "jax")
    if _ENABLED:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: siriltpu kernels are small but numerous, and the
    # default thresholds (>1 s compile, >4 KB executable) skip most of
    # them while the per-kernel win is the whole point here.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _ENABLED = True
    return cache_dir
