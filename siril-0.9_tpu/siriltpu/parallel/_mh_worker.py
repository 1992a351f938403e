"""2-process CPU multi-host worker.

Run as ``python -m siriltpu.parallel._mh_worker PORT PID NPROCS
NDEV_PER_PROC OUTDIR`` in NPROCS parallel processes. Each process:

1. forces a virtual CPU backend with NDEV_PER_PROC devices,
2. joins the jax.distributed cluster at localhost:PORT,
3. builds the GLOBAL frames mesh (NPROCS * NDEV_PER_PROC devices),
4. synthesizes the shared deterministic sequence but FEEDS ONLY its own
   shard (local_frame_indices — per-host input feeding),
5. runs the fused multi-host register+stack and writes the replicated
   result to OUTDIR/out_PID.npy.

tests/test_multihost.py and __graft_entry__.dryrun_multichip launch this
and assert every process's output equals the single-process result.
"""

from __future__ import annotations

import os
import sys

import numpy as np

F, H, W = 16, 64, 64
SEL = (16, 16, 32)


def synth_frames(seed: int = 0) -> np.ndarray:
    """The shared deterministic test sequence: a shifted starfield."""
    rng = np.random.default_rng(seed)
    base = np.clip(rng.normal(1000, 50, (H, W)), 0, 65535)
    base[20:24, 30:34] += 20000
    return np.stack([
        np.clip(np.roll(base, (i % 3 - 1, i % 5 - 2), axis=(0, 1)) +
                rng.normal(0, 5, (H, W)), 0, 65535).astype(np.uint16)
        for i in range(F)])


def write_test_ser(path: str) -> None:
    """Persist the shared sequence as a real SER file so workers can
    exercise the DISK-fed per-host input pipeline (SURVEY §5.8: each
    process reads only its own shard from shared storage)."""
    from siriltpu.core.frame import Frame
    from siriltpu.io.ser import SerFile

    sw = SerFile.create(path, width=W, height=H, color_id=0)
    for f in synth_frames():
        sw.write_frame(Frame(f[None]))
    sw.write_and_close()


def singlehost_expected() -> np.ndarray:
    """Single-process result the workers must reproduce exactly."""
    import jax

    from siriltpu.parallel.sharded import register_stack_step

    frames = synth_frames()
    step = register_stack_step(SEL)
    out, _, _ = jax.jit(step)(frames)
    return np.asarray(out)


def main(port: int, pid: int, nprocs: int, ndev: int, outdir: str) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", "").strip() +
        f" --xla_force_host_platform_device_count={ndev}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from siriltpu.parallel.mesh import make_mesh
    from siriltpu.parallel.multihost import (init_distributed,
                                             make_multihost_register_stack)

    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == nprocs * ndev
    assert len(jax.local_devices()) == ndev

    mesh = make_mesh(("frames",))  # spans ALL hosts' devices
    touched = []
    ser_path = os.path.join(outdir, "mh_input.ser")
    if os.path.exists(ser_path):
        # disk-fed mode: every frame this host feeds is a partial read
        # of the shared SER file (the reference's "each thread reads its
        # own block through a locked fd" pattern, at host scale)
        from siriltpu.io.ser import SerFile

        ser = SerFile.open(ser_path)

        def read_frame(i):
            touched.append(i)
            return ser.read_frame(i).data[0]
    else:
        frames = synth_frames()

        def read_frame(i):
            touched.append(i)
            return frames[i]

    run = make_multihost_register_stack(mesh, SEL)
    out = run(read_frame, F, (H, W))

    # per-host feeding really happened: this process read only its shard
    assert len(touched) == F // nprocs, (pid, touched)
    lo, hi = pid * (F // nprocs), (pid + 1) * (F // nprocs)
    assert touched == list(range(lo, hi)), (pid, touched)

    np.save(os.path.join(outdir, f"out_{pid}.npy"), out)
    print(f"mh_worker {pid}/{nprocs}: OK devices={len(jax.devices())} "
          f"local={len(jax.local_devices())} fed frames [{lo},{hi})")


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
         int(sys.argv[4]), sys.argv[5])
