"""Rounding / quantization helpers frozen for bit-parity with Siril.

Reference: src/core/utils.c:60-91.

- ``round_to_word(x)``: 0 if x <= 0, 65535 if x > 65535.0, else
  ``(uint16)(x + 0.5)`` (C cast truncates toward zero; x+0.5 >= 0 so floor).
- ``round_to_byte``: same with 255.
- ``round_to_int``: round half away from zero.

Both NumPy (float64, exact C parity) and JAX (float32 device path) versions
are provided. The float32 path can differ by 1 LSB for values within ~4e-3
of a .5 boundary; the driver's acceptance bound is <= 1 LSB.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

USHRT_MAX = 65535.0
UCHAR_MAX = 255.0


# ---------------------------------------------------------------- NumPy (f64)

def np_round_to_word(x) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    # floor(x+0.5) clipped to [0, 65535] is exactly the reference rule
    # (x <= 0 -> 0 agrees with the clip since floor(x+0.5) < 0 iff
    # x < -0.5); fused in-place to avoid 200MB-scale temporaries.
    out = np.array(x, dtype=np.float64)  # fresh buffer, stays ndarray
    out += 0.5
    np.floor(out, out=out)
    np.clip(out, 0.0, float(USHRT_MAX), out=out)
    return out.astype(np.uint16)


def np_round_to_byte(x) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    out = np.floor(x + 0.5)
    out = np.where(x <= 0.0, 0.0, out)
    out = np.where(x > UCHAR_MAX, UCHAR_MAX, out)
    return out.astype(np.uint8)


def np_round_to_int(x) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    return np.where(x >= 0.0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)


# ------------------------------------------------------------------ JAX (f32)

def round_to_word(x: jnp.ndarray) -> jnp.ndarray:
    """JAX round_to_WORD. Returns uint16. Works on any float dtype."""
    out = jnp.floor(x + 0.5)
    out = jnp.where(x <= 0.0, 0.0, out)
    out = jnp.where(x > USHRT_MAX, USHRT_MAX, out)
    return out.astype(jnp.uint16)


def round_to_word_f(x: jnp.ndarray) -> jnp.ndarray:
    """round_to_WORD but keeping the float dtype (for further arithmetic)."""
    out = jnp.floor(x + 0.5)
    out = jnp.where(x <= 0.0, 0.0, out)
    return jnp.where(x > USHRT_MAX, USHRT_MAX, out)


def round_to_byte(x: jnp.ndarray) -> jnp.ndarray:
    out = jnp.floor(x + 0.5)
    out = jnp.where(x <= 0.0, 0.0, out)
    out = jnp.where(x > UCHAR_MAX, UCHAR_MAX, out)
    return out.astype(jnp.uint8)


def round_to_int(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0.0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5)).astype(jnp.int32)


__all__ = [
    "np_round_to_word",
    "np_round_to_byte",
    "np_round_to_int",
    "round_to_word",
    "round_to_word_f",
    "round_to_byte",
    "round_to_int",
    "USHRT_MAX",
    "UCHAR_MAX",
]
