"""Round-4 TPU measurement sweep (run manually in a healthy tunnel
window, AFTER bench.py — only one TPU process at a time).

Measures and prints one JSON line per item:
  - fused rejection kernels on real TPU: compile + parity vs the CPU
    interpret result for all four rejections (winsorized is a NESTED
    while_loop — first Mosaic validation);
  - sigma kernel time per 100x4K^2 batch (VERDICT item-4 target:
    <= 250 ms, r3 measured 307 ms);
  - winsorized fused kernel time at the config-3 shape (1000x480x640,
    tile 256);
  - Lanczos4 tiled warp per 6 Mpx frame (r3: 143 ms with per-tap sin
    pairs; r4 uses 3 per-tile transcendentals per axis).

Timing uses SCALAR fetches (block_until_ready is a no-op on this axon
platform). Results are appended by hand to ROUND4.md.
"""

import json
import os
import sys
import time

_PKG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "siril-0.9_tpu")
if _PKG not in sys.path:
    sys.path.insert(0, _PKG)


def main():
    from siriltpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.devices()[0].platform != "cpu", "run on the TPU"
    rng = np.random.default_rng(0)

    def sync(x):
        return float(x[(0,) * x.ndim])

    from siriltpu.ops.pallas.reject_stack import (pick_tile,
                                                  reject_stack_pallas)
    from siriltpu.ops.rejection import reject_and_mean

    # 1. parity of every fused rejection on the REAL chip vs the exact
    #    HBM hybrid (small shape keeps the compile fast)
    F, P = 25, 4096
    vals = rng.integers(800, 1200, (F, P)).astype(np.uint16)
    vals[1, ::4] = 60000
    vals[:, ::17] = np.geomspace(1, 65535, F).astype(np.uint16)[:, None]
    for rej in ("sigma", "winsorized", "percentile", "sigmedian"):
        sig = (0.2, 0.2) if rej == "percentile" else (2.5, 2.5)
        t0 = time.perf_counter()
        got = reject_stack_pallas(jnp.asarray(vals), rej, sig[0], sig[1],
                                  tile=512)
        sync(got)
        compile_s = time.perf_counter() - t0
        want, _, _ = reject_and_mean(
            jnp.asarray(vals) if rej == "sigma"
            else jnp.asarray(vals).astype(jnp.float32), rej, sig)
        ok = bool(np.array_equal(np.asarray(got), np.asarray(want)))
        print(json.dumps({"metric": f"tpu fused {rej} parity 25x4096",
                          "ok": ok, "compile_s": round(compile_s, 1)}))
        assert ok, rej

    # 2. sigma kernel per 100x4K^2
    F2, S2 = 100, 4096
    big = jnp.clip(1200 + 60 * jax.random.normal(
        jax.random.PRNGKey(0), (F2, S2 * S2 // 2048, 2048)), 0,
        65535).astype(jnp.uint16).reshape(F2, S2 * S2)
    sync(big)
    out = reject_stack_pallas(big, "sigma", 3.0, 3.0, tile=2048)
    sync(out)
    t0 = time.perf_counter()
    out = reject_stack_pallas(big, "sigma", 3.0, 3.0, tile=2048)
    sync(out)
    print(json.dumps({"metric": "tpu sigma fused kernel 100x4096^2",
                      "value": round(time.perf_counter() - t0, 3),
                      "unit": "s", "r3_was": 0.307, "target": 0.250}))
    del big, out  # 3.3 GB: later steps need the HBM

    # 3. winsorized fused at the config-3 shape. F=1000 is KNOWN to
    #    overflow this Mosaic's 16 MB scoped-VMEM stack at every tile
    #    (measured: 16.78M@256, 16.06M@128 pre-trim; 16.55M@128 after
    #    freeing two buffers — the stack is ~15 MB tile-independent
    #    nested-loop state), so reject_stack_auto may fall back; report
    #    which path ran.
    from siriltpu.ops.pallas.reject_stack import reject_stack_auto
    F3, H3, W3 = 1000, 480, 640
    pl = jnp.clip(1200 + 60 * jax.random.normal(
        jax.random.PRNGKey(1), (F3, H3 * W3)), 0, 65535).astype(jnp.uint16)
    sync(pl)
    out3 = reject_stack_auto(pl, "winsorized", 3.0, 3.0)
    if out3 is not None:
        sync(out3)
        t0 = time.perf_counter()
        out3 = reject_stack_auto(pl, "winsorized", 3.0, 3.0)
        sync(out3)
        dt = time.perf_counter() - t0
        print(json.dumps({"metric": f"tpu winsorized fused {F3}x{H3}x{W3}",
                          "value": round(dt, 3), "unit": "s",
                          "frames_per_s": round(F3 / dt, 1)}))
    else:
        from siriltpu.ops.rejection import reject_and_mean
        hbm = jax.jit(lambda v: reject_and_mean(
            v.astype(jnp.float32), "winsorized", (3.0, 3.0))[0])
        o = hbm(pl); sync(o)
        t0 = time.perf_counter(); o = hbm(pl); sync(o)
        dt = time.perf_counter() - t0
        print(json.dumps({"metric": f"tpu winsorized HBM-path (fused "
                                    f"OOM at F={F3}) {F3}x{H3}x{W3}",
                          "value": round(dt, 3), "unit": "s",
                          "frames_per_s": round(F3 / dt, 1)}))
        del o
    del pl, out3  # free before the warp + stage-profile steps

    # 4. Lanczos4 tiled warp per 6 Mpx frame
    from siriltpu.ops.warp import (INTER_LANCZOS4, _tiled_plan,
                                   _warp_perspective_tiled)
    H4, W4 = 2048, 3072
    img = jnp.asarray(rng.integers(0, 65535, (H4, W4)).astype(np.uint16)
                      ).astype(jnp.float32)
    Hm = np.array([[1.001, 0.002, 3.0], [-0.002, 0.999, -2.0],
                   [1e-6, -1e-6, 1.0]])
    Hinv = np.linalg.inv(Hm)
    plan = _tiled_plan(Hinv, (H4, W4), (H4, W4), INTER_LANCZOS4)
    hj = jnp.asarray(Hinv, jnp.float32)
    w = _warp_perspective_tiled(img, hj, (H4, W4), INTER_LANCZOS4, *plan)
    sync(w)
    t0 = time.perf_counter()
    w = _warp_perspective_tiled(img, hj, (H4, W4), INTER_LANCZOS4, *plan)
    sync(w)
    print(json.dumps({"metric": "tpu lanczos4 tiled warp 3072x2048",
                      "value": round(time.perf_counter() - t0, 3),
                      "unit": "s", "r3_was": 0.143}))

    # 5. north-star STAGE PROFILE at 100x4096^2: attributes the batch
    #    time across shifts/quality/align/kernel plus the bare
    #    scalar-sync round-trip, so a headline move between captures can
    #    be pinned on the chip vs the tunnel (r3 profile: shifts ~43 ms,
    #    quality ~17 ms, align ~36 ms, kernel ~170-200 ms, sync ~32 ms).
    from siriltpu.pipelines.register_stack import (RegisterStackBench,
                                                   align_frames_auto_keep,
                                                   compute_shifts)
    from siriltpu.ops.quality import quality_estimate_batch
    bench = RegisterStackBench()
    fps = bench.run(repeats=1)  # warms master + all programs
    master = bench._master
    x0, y0, s = bench.sel

    def timed(fn, *a):
        out = fn(*a)
        sync(out if isinstance(out, jnp.ndarray) else out[0])
        t0 = time.perf_counter()
        out = fn(*a)
        sync(out if isinstance(out, jnp.ndarray) else out[0])
        return time.perf_counter() - t0, out

    t_sync = timed(lambda: master)[0]  # bare scalar round-trip
    t_sh, (sx, sy) = timed(compute_shifts, master, 0, bench.sel)
    t_q, _ = timed(
        jax.jit(lambda fr: quality_estimate_batch(
            jax.lax.dynamic_slice(fr, (0, y0, x0), (fr.shape[0], s, s)))),
        master)
    t_al, aligned = timed(align_frames_auto_keep, master, sx, sy)
    t2k = pick_tile(100, "sigma", 4096 * 4096)
    t_k, _ = timed(lambda a: reject_stack_pallas(
        a.reshape(100, 4096 * 4096), "sigma", 3.0, 3.0, tile=t2k), aligned)
    print(json.dumps({
        "metric": "north-star stage profile 100x4096^2",
        "fps_batch": round(fps, 1),
        "scalar_sync_ms": round(t_sync * 1e3, 1),
        "shifts_ms": round(t_sh * 1e3, 1),
        "quality_ms": round(t_q * 1e3, 1),
        "align_ms": round(t_al * 1e3, 1),
        "kernel_ms": round(t_k * 1e3, 1),
        "stage_sum_ms": round((t_sh + t_q + t_al + t_k) * 1e3, 1),
        "batch_ms": round(100.0 / fps * 1e3, 1)}))


if __name__ == "__main__":
    main()
