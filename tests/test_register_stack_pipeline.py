"""Fused register+stack pipeline correctness on small shapes."""

import jax.numpy as jnp
import numpy as np

from siriltpu.pipelines.register_stack import register_and_stack
from siriltpu.stacking.api import stack_frames
from siriltpu.testing.synth import make_sequence_frames


def test_pipeline_matches_separate_stages():
    n, h, w = 6, 96, 96
    rng = np.random.default_rng(40)
    gen = rng.integers(-5, 6, size=(n, 2))
    gen[0] = 0
    frames, _, _ = make_sequence_frames(n, h, w, seed=40, shifts=gen,
                                        noise_sigma=4.0)
    mono = frames[:, 0]
    out, shifts, quality = register_and_stack(
        jnp.asarray(mono), sel=(16, 16, 64), rejection="sigma",
        sig=(3.0, 3.0), block_rows=40)
    np.testing.assert_array_equal(shifts[:, 0], -gen[:, 0])
    np.testing.assert_array_equal(shifts[:, 1], -gen[:, 1])
    assert quality.shape == (n,)

    want = stack_frames(frames, method="mean", shifts=shifts,
                        rejection="sigma", sig=(3.0, 3.0))
    np.testing.assert_array_equal(out, want.data[0])


def test_pipeline_small_bench_runs():
    from siriltpu.pipelines.register_stack import RegisterStackBench
    bench = RegisterStackBench(size=128, nframes=8, block_rows=64)
    fps = bench.run()
    assert fps > 0
