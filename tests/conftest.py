"""Test harness configuration.

Tests run on the JAX CPU backend with 8 virtual devices so multi-chip
sharding paths (mesh over frames × rows) execute without TPU hardware —
SURVEY §4(d). Must set env BEFORE jax import.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# this environment's TPU plugin ignores JAX_PLATFORMS env; force via config
# (must happen before any backend initialization)
jax.config.update("jax_platforms", "cpu")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PKG = os.path.join(_REPO, "siril-0.9_tpu")
if _PKG not in sys.path:
    sys.path.insert(0, _PKG)

# persistent compilation cache: repeat test runs skip XLA recompiles
from siriltpu.utils.compcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import pytest  # noqa: E402

from siriltpu.utils.hostmem import relieve_map_pressure  # noqa: E402


@pytest.fixture(autouse=True)
def _map_pressure_guard():
    """The full suite jits ~19k distinct programs; every loaded XLA:CPU
    executable pins ~3 anonymous code mappings, so one pytest process
    crosses the kernel's vm.max_map_count (65530) around test ~380 and
    SEGFAULTS in whatever mmaps next (observed inside the jax
    compilation cache's serialize/deserialize). Purge jax's executable
    caches whenever the mapping table nears the limit — recompiles are
    persistent-cache disk hits, so the purge costs seconds, not
    minutes."""
    yield
    relieve_map_pressure()
