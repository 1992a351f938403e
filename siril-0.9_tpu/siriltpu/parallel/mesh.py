"""Device mesh construction and sharding policies.

The reference is single-node shared-memory OpenMP (SURVEY §2.9); its
three parallel patterns map onto TPU meshes as:

- P2 OpenMP-over-frames  → data parallelism on a ``frames`` mesh axis
  (registration, per-frame quality/stats);
- P3 OpenMP-over-row-blocks → spatial sharding on a ``rows`` axis
  (rejection stacking: every chip owns a row slab over ALL frames);
- P6 streaming accumulation → ``lax.scan`` over frame chunks per chip +
  one ``psum``/``pmax``/``pmin`` tree reduction across chips (the one
  true collective of this workload, riding ICI).

Multi-host lives in ``parallel/multihost.py``: ``init_distributed``
(jax.distributed), per-host frame feeding via ``local_frame_indices`` +
``make_array_from_process_local_data``, and the fused register+stack
over the global mesh — proven by a real 2-process CPU cluster in
tests/test_multihost.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Tuple[str, ...] = ("frames",),
              shape: Optional[Tuple[int, ...]] = None,
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default: 1-D mesh over all devices on the ``frames`` axis. Pass
    shape=(a, b) with axes=("frames", "rows") for 2-D layouts.
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    n = devs.size
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return Mesh(devs.reshape(shape), axes)


def frames_sharding(mesh: Mesh) -> NamedSharding:
    """(F, H, W) arrays sharded along the frame axis."""
    return NamedSharding(mesh, P("frames", None, None))


def rows_sharding(mesh: Mesh, axis: str = "frames") -> NamedSharding:
    """(F, H, W) arrays sharded along rows (reusing the mesh axis)."""
    return NamedSharding(mesh, P(None, axis, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_frames_to_mesh(nframes: int, mesh: Mesh,
                       axis: str = "frames") -> int:
    """Padded frame count divisible by the mesh axis size."""
    n = mesh.shape[axis]
    return ((nframes + n - 1) // n) * n


__all__ = ["make_mesh", "frames_sharding", "rows_sharding", "replicated",
           "pad_frames_to_mesh", "Mesh", "NamedSharding", "P"]
