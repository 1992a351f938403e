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
    # pipelined consumer mode: batch N's scalar fetched after batch N+1
    # is dispatched; still observes every batch, must also run green
    fps_pipe = bench.run(repeats=2, pipelined=True)
    assert fps_pipe > 0
    # overlapped-drain measurement (fps_incl_drain source) must run and
    # report positive throughput with the overlap marker
    fps2, drain = bench.run(repeats=2, with_drain_stats=True)
    assert fps2 > 0 and drain["fps_incl_drain"] > 0
    assert drain["drain_overlapped"] is True


def test_align_slice_matches_gather_align():
    """align_frames_slice (padded dynamic_slice fast path) must produce
    exactly the gather path's zero-fill shift for every in-margin
    shift, including the extremes."""
    from siriltpu.pipelines.register_stack import (
        ALIGN_MARGIN, _align_frames_impl, align_frames_slice)
    rng = np.random.default_rng(5)
    f, h, w = 7, 40, 56
    frames = jnp.asarray(
        rng.integers(0, 65536, (f, h, w)).astype(np.uint16))
    sx = jnp.asarray([0, 3, -5, ALIGN_MARGIN, -ALIGN_MARGIN, 17, -1],
                     jnp.int32)
    sy = jnp.asarray([0, -2, 7, -ALIGN_MARGIN, ALIGN_MARGIN, -30, 4],
                     jnp.int32)
    want = np.asarray(_align_frames_impl(frames, sx, sy))
    got = np.asarray(align_frames_slice(frames, sx, sy, margin=ALIGN_MARGIN))
    np.testing.assert_array_equal(got, want)


def test_align_frames_auto_device_branch():
    """The on-device slice-vs-gather selection (lax.cond, r4: removes
    the per-batch host sync) must match the gather reference on BOTH
    sides of the margin."""
    import jax.numpy as jnp

    from siriltpu.pipelines.register_stack import (ALIGN_MARGIN,
                                                   _align_frames_impl,
                                                   align_frames_auto_keep)

    rng = np.random.default_rng(4)
    frames = jnp.asarray(rng.integers(0, 65535, (5, 96, 128)).astype(
        np.uint16))
    for lo, hi in ((-6, 6), (-(ALIGN_MARGIN + 30), ALIGN_MARGIN + 30)):
        sx = jnp.asarray(rng.integers(lo, hi + 1, 5).astype(np.int32))
        sy = jnp.asarray(rng.integers(lo, hi + 1, 5).astype(np.int32))
        want = np.asarray(_align_frames_impl(frames, sx, sy))
        got = np.asarray(align_frames_auto_keep(frames, sx, sy))
        np.testing.assert_array_equal(got, want)
