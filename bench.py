"""Benchmark harness: register + sigma-clip stack throughput at 4K×4K mono.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "frames/sec/chip", "vs_baseline": N,
     "fps_compute": N, "fps_incl_drain": N, ...}

Baseline target (BASELINE.json): >= 50 frames/sec/chip for register +
sigma-clip stack of a 100-frame 4096x4096 mono sequence on TPU v5e.
vs_baseline = value / 50.

Metric definitions (both are emitted every round, r04+):
  fps_compute     — compute-sustained throughput, synced per batch by a
                    scalar fetch (the r03+ headline; `value` is this).
  fps_pipelined   — same pipeline, but batch N's scalar is fetched after
                    batch N+1 is dispatched (production consumer
                    pattern: the ~30 ms tunnel round-trip + host
                    dispatch overlap device compute). Extra field only —
                    never the headline.
  fps_incl_drain  — MEASURED steady-state throughput with the full
                    stacked-image drain overlapping the next batch's
                    compute (batch N+1 dispatched before batch N's
                    32 MB fetch; r05+ — earlier rounds reported the
                    max(compute, transfer) model). On this ~35 MB/s
                    tunnel the figure still bounds at the link when
                    transfer > compute; a PCIe host drains at GB/s
                    where it equals fps_compute.

Reliability: the axon tunnel in this environment intermittently WEDGES
(every jax call, including backend init, hangs forever in futex wait).
Round 3's driver capture died on exactly that. This harness therefore
runs ALL jax work in a subprocess under a hard watchdog:

  supervisor (no jax import)                worker (python bench.py --worker)
    probe tunnel (tiny matmul, 120 s) ───►    backend init + matmul
    run worker (hard timeout, SIGKILL  ───►   full benchmark, streams
       the whole process group)               progress JSON to a file
    on success: print result, update
       BENCH_LASTGOOD.json + BENCH_HISTORY.json
    on timeout/crash: retry with backoff within BENCH_BUDGET_S
    on final failure: print BENCH_LASTGOOD.json contents annotated with
       {"error": ..., "stale": true} — the output ALWAYS parses.

Env knobs: BENCH_FRAMES/SIZE/RUNS/REPEATS (workload), BENCH_BUDGET_S
(total supervisor budget, default 1800), BENCH_WORKER_TIMEOUT_S (per
attempt, default 1200), BENCH_PROBE_TIMEOUT_S (default 120).
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
_PKG = os.path.join(ROOT, "siril-0.9_tpu")
if _PKG not in sys.path:
    sys.path.insert(0, _PKG)

TARGET_FPS = 50.0
LASTGOOD = os.path.join(ROOT, "BENCH_LASTGOOD.json")
HISTORY = os.path.join(ROOT, "BENCH_HISTORY.json")
METRIC_DEF = "v2-compute-sustained"  # r03+ headline; r01/r02 used
                                     # transfer-inclusive ("v1")


# --------------------------------------------------------------------------
# worker: all jax work lives here, in a subprocess the supervisor can kill
# --------------------------------------------------------------------------

def worker():
    out_path = os.environ["BENCH_RESULT_FILE"]

    def emit(obj):
        with open(out_path, "a") as fh:
            fh.write(json.dumps(obj) + "\n")
            fh.flush()
            os.fsync(fh.fileno())

    from siriltpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np  # noqa: F401  (imported for side-effect parity)

    nframes = int(os.environ.get("BENCH_FRAMES", "100"))
    size = int(os.environ.get("BENCH_SIZE", "4096"))
    nruns = max(int(os.environ.get("BENCH_RUNS", "3")), 1)
    reps = int(os.environ.get("BENCH_REPEATS", "10"))

    from siriltpu.pipelines.register_stack import RegisterStackBench
    bench = RegisterStackBench(size=size, nframes=nframes)
    emit({"phase": "init"})

    runs = []
    drain = None
    for i in range(nruns):
        if i == 0:
            fps_i, drain = bench.run(repeats=reps, with_drain_stats=True)
        else:
            fps_i = bench.run(repeats=reps)
        runs.append(fps_i)
        # each completed run is durable: a later hang still leaves the
        # supervisor a partial measurement to salvage
        emit({"phase": "run", "i": i, "fps": round(fps_i, 2),
              "drain": drain})

    # extra figure, NOT the headline: batch N's scalar fetched after
    # batch N+1 is dispatched, overlapping the tunnel round-trip and
    # host dispatch with device compute (the production consumer
    # pattern). The headline `value` stays the per-batch-blocking v2
    # definition for round-over-round comparability.
    fps_pipe = bench.run(repeats=reps, pipelined=True) if reps > 1 else None
    if fps_pipe is not None:
        emit({"phase": "pipelined", "fps": round(fps_pipe, 2)})

    srt = sorted(runs)
    fps = srt[len(srt) // 2]
    result = {
        "metric": f"register+sigma-clip-stack {size}x{size} mono",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / TARGET_FPS, 3),
        "fps_compute": round(fps, 2),
        "fps_pipelined": None if fps_pipe is None else round(fps_pipe, 2),
        "fps_incl_drain": (drain or {}).get("fps_incl_drain"),
        "drain_s": (drain or {}).get("drain_s"),
        "drain_mbps": (drain or {}).get("drain_mbps"),
        "metric_def": METRIC_DEF,
        "runs_min": round(srt[0], 2),
        "runs_max": round(srt[-1], 2),
        "n_runs": len(runs),
    }
    emit({"final": result})


PROBE_SRC = """
import os
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.float32)
y = x @ x
print("PROBE_OK", float(y[0, 0]), jax.default_backend())
"""


# --------------------------------------------------------------------------
# supervisor
# --------------------------------------------------------------------------

def _kill_group(proc):
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except (ProcessLookupError, PermissionError):
        pass
    try:
        proc.wait(timeout=10)
    except Exception:
        pass


def _run_sub(argv, timeout, env=None):
    """Run a subprocess in its own session with a hard timeout; SIGKILL the
    whole group on expiry (wedged jax hangs in futex and ignores SIGTERM)."""
    proc = subprocess.Popen(
        argv, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        start_new_session=True, env=env, text=True)
    try:
        out, _ = proc.communicate(timeout=timeout)
        return proc.returncode, out
    except subprocess.TimeoutExpired:
        _kill_group(proc)
        return None, "(timeout)"


def _sub_env(**extra):
    # APPEND to PYTHONPATH: the TPU plugin in this environment registers
    # itself via a sitecustomize on the existing PYTHONPATH
    env = dict(os.environ, **extra)
    prev = os.environ.get("PYTHONPATH", "")
    env["PYTHONPATH"] = (prev + os.pathsep + _PKG) if prev else _PKG
    return env


def _probe(timeout):
    rc, out = _run_sub([sys.executable, "-c", PROBE_SRC], timeout,
                       env=_sub_env())
    return rc == 0 and "PROBE_OK" in out, out


def _attempt(timeout):
    """One worker attempt. Returns (final_result_or_None, partial_runs,
    partial_drain, diagnostics_tail)."""
    fd, tmp = tempfile.mkstemp(prefix="bench_progress_", suffix=".jsonl")
    os.close(fd)
    rc, out = _run_sub([sys.executable, os.path.abspath(__file__),
                        "--worker"], timeout,
                       env=_sub_env(BENCH_RESULT_FILE=tmp))
    final, runs, drain = None, [], None
    try:
        with open(tmp) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    obj = json.loads(line)
                except ValueError:
                    continue
                if "final" in obj:
                    final = obj["final"]
                elif obj.get("phase") == "run":
                    runs.append(obj["fps"])
                    drain = obj.get("drain") or drain
    except OSError:
        pass
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass
    tail = "\n".join((out or "").splitlines()[-8:])
    if rc not in (0,):
        tail = f"rc={rc}\n{tail}"
    return final, runs, drain, tail


def _partial_result(runs, drain):
    size = int(os.environ.get("BENCH_SIZE", "4096"))
    srt = sorted(runs)
    fps = srt[len(srt) // 2]
    return {
        "metric": f"register+sigma-clip-stack {size}x{size} mono",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / TARGET_FPS, 3),
        "fps_compute": round(fps, 2),
        "fps_incl_drain": (drain or {}).get("fps_incl_drain"),
        "drain_s": (drain or {}).get("drain_s"),
        "drain_mbps": (drain or {}).get("drain_mbps"),
        "metric_def": METRIC_DEF,
        "runs_min": round(srt[0], 2),
        "runs_max": round(srt[-1], 2),
        "n_runs": len(runs),
        "partial": True,
    }


def _update_history(result):
    """Append to BENCH_HISTORY.json; flag >15% regressions vs the previous
    same-definition entry (annotates, never fails the capture)."""
    hist = []
    try:
        with open(HISTORY) as fh:
            hist = json.load(fh)
    except (OSError, ValueError):
        hist = []
    prev = next((h for h in reversed(hist)
                 if h.get("metric_def") == result.get("metric_def")
                 and h.get("metric") == result.get("metric")
                 and not h.get("stale") and not h.get("partial")), None)
    entry = {"ts": int(time.time()), "metric": result["metric"],
             "metric_def": result.get("metric_def"),
             "fps_compute": result.get("fps_compute"),
             "fps_pipelined": result.get("fps_pipelined"),
             "fps_incl_drain": result.get("fps_incl_drain"),
             "partial": bool(result.get("partial"))}
    if prev and prev.get("fps_compute"):
        ratio = (result.get("fps_compute") or 0) / prev["fps_compute"]
        if ratio < 0.85:
            entry["regression_flag"] = True
            result["regression_vs_prev_pct"] = round((1 - ratio) * 100, 1)
    hist.append(entry)
    with open(HISTORY, "w") as fh:
        json.dump(hist, fh, indent=1)
        fh.write("\n")
    return result


#: the official workload; runs at other BENCH_FRAMES/SIZE are local
#: experiments and must never overwrite the driver's fallback record
#: or enter the history (a 1024^2 smoke run once clobbered LASTGOOD)
DEFAULT_METRIC = "register+sigma-clip-stack 4096x4096 mono"


def _finish(result):
    official = result.get("metric") == DEFAULT_METRIC
    if official:
        result = _update_history(result)
    if official and not result.get("partial") and not result.get("stale"):
        with open(LASTGOOD, "w") as fh:
            json.dump(dict(result, captured_at=int(time.time())), fh,
                      indent=1)
            fh.write("\n")
    print(json.dumps(result), flush=True)
    return 0


def _fallback(errors):
    try:
        with open(LASTGOOD) as fh:
            last = json.load(fh)
    except (OSError, ValueError):
        last = {"metric": "register+sigma-clip-stack 4096x4096 mono",
                "value": 0.0, "unit": "frames/sec/chip", "vs_baseline": 0.0}
    last = dict(last)
    last["stale"] = True
    last["error"] = ("live capture failed (wedged tunnel / backend "
                     "unavailable); value is the last driver-verifiable "
                     "good run. Attempts: " + " | ".join(errors)[-2000:])
    print(json.dumps(last), flush=True)
    return 0


def main():
    budget = float(os.environ.get("BENCH_BUDGET_S", "1800"))
    worker_to = float(os.environ.get("BENCH_WORKER_TIMEOUT_S", "1200"))
    probe_to = float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "120"))
    deadline = time.monotonic() + budget
    errors = []
    best_partial = None
    backoff = 60.0

    while True:
        remaining = deadline - time.monotonic()
        if remaining < probe_to + 30:
            break
        ok, pout = _probe(min(probe_to, remaining))
        if not ok:
            errors.append("probe: " + pout.splitlines()[-1][:200]
                          if pout.strip() else "probe: timeout")
            time.sleep(min(backoff, max(0.0, deadline - time.monotonic())))
            backoff = min(backoff * 2, 300)
            continue
        remaining = deadline - time.monotonic()
        if remaining < 60:
            break
        final, runs, drain, tail = _attempt(min(worker_to, remaining))
        if final is not None:
            return _finish(final)
        if runs:
            cand = _partial_result(runs, drain)
            if best_partial is None or len(runs) > best_partial["n_runs"]:
                best_partial = cand
        errors.append("worker: " + tail.replace("\n", " | ")[:300])
        time.sleep(min(backoff, max(0.0, deadline - time.monotonic())))
        backoff = min(backoff * 2, 300)

    if best_partial is not None:
        return _finish(best_partial)
    return _fallback(errors or ["no attempt fit in budget"])


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        sys.exit(main())
