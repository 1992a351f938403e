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

import hashlib
import os
import platform
import sys

_ENABLED = False


def _host_key(isa_token: str = "") -> str:
    """Short hash identifying this host's CPU feature set.

    XLA:CPU AOT-compiles with the *compiling* machine's CPU features
    baked in; loading such an artifact on a host with different
    features (e.g. ``+prefer-no-scatter`` vs not) silently changes
    numerics or errors in ``cpu_aot_loader``. Keying the cache
    directory on (machine, flags-from-/proc/cpuinfo, effective max-ISA
    cap) guarantees a cross-machine cache — or one compiled under a
    different ISA cap — is simply a different directory, never a
    poisoned one. TPU artifacts are keyed the same way for free —
    harmless, since one host maps to one key.
    """
    parts = [platform.machine(), platform.system(), isa_token]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
                if line.startswith("model name"):
                    parts.append(line.split(":", 1)[1].strip())
    except OSError:
        parts.append(platform.processor())
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]


def _backend_initialized() -> bool:
    """True when a jax backend is already live (XLA_FLAGS consumed)."""
    if "jax" not in sys.modules:
        return False
    try:
        from jax._src import xla_bridge
        return bool(getattr(xla_bridge, "_backends", None))
    except Exception:
        return True  # cannot tell: be conservative


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

    # XLA:CPU with AVX-512 available compiles with +prefer-no-scatter /
    # +prefer-no-gather tuning flags baked into the serialized AOT
    # executable; the loader's host-feature check does not know those
    # pseudo-features, so EVERY warm-cache load logs a cpu_aot_loader
    # feature-mismatch error — even on the machine that compiled it.
    # Capping CPU codegen at AVX2 produces feature sets the loader
    # accepts cleanly (verified: 0 errors warm at AVX2, 8 at AVX512).
    # TPU executables don't go through this path; the flag only affects
    # the CPU backend used by tests and virtual-mesh dryruns.
    #
    # The append only takes effect if XLA has not consumed XLA_FLAGS
    # yet (that happens at BACKEND INIT, not jax import); when a
    # backend is already live the effective ISA is unknowable, so the
    # cache key gets a distinct token (artifacts compiled with and
    # without the cap must never share a directory) and we warn the
    # caller to enable the cache earlier.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_max_isa" not in flags:
        if _backend_initialized():
            import warnings
            warnings.warn(
                "enable_compilation_cache() called after the jax backend "
                "initialized: the xla_cpu_max_isa=AVX2 cap cannot apply "
                "to this process; using a separate cache key",
                stacklevel=2)
            isa_token = "isa-preinit-unknown"
        else:
            os.environ["XLA_FLAGS"] = \
                (flags + " --xla_cpu_max_isa=AVX2").strip()
            isa_token = "isa-AVX2"
    else:
        import re
        m = re.search(r"xla_cpu_max_isa=(\S+)", flags)
        isa_token = f"isa-{m.group(1) if m else 'preset'}"
    cache_dir = os.path.join(cache_dir, _host_key(isa_token))
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
