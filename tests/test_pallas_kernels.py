"""Pallas fused kernels — interpret-mode parity on the CPU test backend.
(On TPU the same kernel was verified bit-identical to the window kernel
and runs the whole sort+clip+mean in VMEM.)"""

import numpy as np
import pytest

from siriltpu.ops.pallas.reject_stack import sigma_stack_pallas
from siriltpu.ops.rejection import reject_and_mean


def test_sigma_stack_pallas_interpret_parity():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    F, P = 25, 512
    vals = rng.integers(900, 1100, size=(F, P)).astype(np.uint16)
    vals[2, ::5] = 50000
    vals[7, 1::9] = 0
    got = np.asarray(sigma_stack_pallas(jnp.asarray(vals), 3.0, 3.0,
                                        tile=256, interpret=True))
    want, _, _ = reject_and_mean(jnp.asarray(vals), "sigma", (3.0, 3.0))
    np.testing.assert_array_equal(got, np.asarray(want))


def test_sigma_stack_pallas_pow2_frames():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    F, P = 64, 256
    vals = rng.integers(0, 65535, size=(F, P)).astype(np.uint16)
    got = np.asarray(sigma_stack_pallas(jnp.asarray(vals), 2.0, 2.0,
                                        tile=256, interpret=True))
    want, _, _ = reject_and_mean(jnp.asarray(vals), "sigma", (2.0, 2.0))
    np.testing.assert_array_equal(got, np.asarray(want))


@pytest.mark.parametrize("F", [7, 12, 50, 100])
def test_sigma_stack_pallas_pruned_network_parity(F):
    """The network is pruned to pairs below n_rows=ceil(F/8)*8 (the
    pad-wire no-op argument); every frame count must still match the
    reference window kernel exactly, including full-range data with
    real 65535 values (ties with the pad sentinel)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(100 + F)
    P = 256
    vals = rng.integers(0, 65536, size=(F, P)).astype(np.uint16)
    vals[:2, ::7] = 65535
    got = np.asarray(sigma_stack_pallas(jnp.asarray(vals), 3.0, 3.0,
                                        tile=256, interpret=True))
    want, _, _ = reject_and_mean(jnp.asarray(vals), "sigma", (3.0, 3.0))
    np.testing.assert_array_equal(got, np.asarray(want))
