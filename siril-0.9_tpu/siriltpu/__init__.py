"""siriltpu — a TPU-native (JAX/XLA/Pallas) astronomical image-processing framework.

Re-implements the capabilities of Siril 0.9 (reference: pXlor/Siril-0.9):
conversion, calibration (preprocessing), registration (alignment), stacking,
and enhancement of astronomical image sequences — redesigned TPU-first:

- pure-functional core: frames are ``uint16[C, H, W]`` arrays (channel-planar,
  bottom-to-top row order, matching Siril's FITS convention,
  reference src/core/siril.h:439-442);
- per-frame math batched with ``vmap``, streaming accumulation with
  ``lax.scan``, multi-chip scale-out with ``shard_map`` over a
  ``jax.sharding.Mesh`` (frames × rows axes);
- host layer (Python/NumPy) for FITS/SER/.seq I/O, CLI, orchestration.

The reference mutates global state (``gfit``, ``com.seq``) under one worker
thread; siriltpu is arrays-in/arrays-out with the same observable semantics.
"""

__version__ = "0.1.0"

from siriltpu.core.frame import Frame, ImStats, Rect  # noqa: F401
