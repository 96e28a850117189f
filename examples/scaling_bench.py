#!/usr/bin/env python
"""Scale-out efficiency benchmark: time-sharded streaming FIR chain, weak
scaling over N "hosts" (BASELINE north star: >=80 % samples/s scaling
efficiency 1 chip -> 1 host -> N hosts).

Honest measurement strategy for this environment (one real TPU chip, a
4-core host): *virtual* in-process devices share one thread pool and
cannot speed anything up, so scaling is measured over REAL OS processes
joined with jax.distributed.initialize (gloo) — one CPU device per
process, the ("chan","time") mesh spanning processes.  Each process owns
one time shard (constant per-process work = weak scaling); the 256-tap
FIR's halo rides the inter-process collective exactly as it would ride
ICI/DCN on a pod.  Efficiency(n) = t(1)/t(n) — ideal weak scaling keeps
wall-clock flat.

On a real pod slice, set LIBTSD_SCALING_TPU=1 and run one process per
host: the same worker body measures true multi-chip scaling.

    python examples/scaling_bench.py             # 1,2,4-process sweep
"""
import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

C = 4                 # channels
# samples per time shard (per process) — weak scaling; env override lets
# the slow-tier gate (tests/test_scaling.py) run a shorter sweep
N_PER = int(os.environ.get("LIBTSD_SCALING_NPER", 1 << 23))
ITERS = 3
TAPS = 256


def worker(coordinator, nproc, pid):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=1").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from libtsd_tpu.parallel import launch
    if nproc > 1:
        launch.initialize(coordinator_address=coordinator,
                          num_processes=nproc, process_id=pid)

    import jax.numpy as jnp
    import numpy as np
    from libtsd_tpu.ops import fir_design as FD
    from libtsd_tpu.ops import filter_rt as FR
    from libtsd_tpu.parallel import make_mesh, P, sharded_chain
    from libtsd_tpu.parallel.launch import ingest_local

    mesh = make_mesh(chan=1, time=nproc)
    h = FD.fir_lowpass(TAPS, 0.2)
    fir = FR.Fir.create(h)

    local = np.random.default_rng(pid).standard_normal(
        (C, N_PER)).astype(np.float32)
    x = ingest_local(mesh, P(None, "time"), local)

    @jax.jit
    def step(x):
        y = sharded_chain(mesh, [(fir, TAPS - 1)], x)
        return jnp.sum(y * y)

    float(step(x))                       # compile + warm (syncs all procs)
    dt = float("inf")                    # best-of-3 rounds (shared host)
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            s = step(x)
        float(s)
        dt = min(dt, (time.perf_counter() - t0) / ITERS)
    if pid == 0:
        msps = C * N_PER * nproc / dt / 1e6
        print(f"RESULT {json.dumps({'nproc': nproc, 'msps': msps, 'dt': dt})}",
              flush=True)


def run_sweep(counts, json_path=None):
    rows = []
    for n in counts:
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        # pin each "host" to its own core — one chip's compute = one core,
        # so weak scaling measures parallelism + collectives, not thread
        # oversubscription of the shared physical CPU
        ncores = os.cpu_count() or 4
        procs = [subprocess.Popen(
            ["taskset", "-c", str(p % ncores),
             sys.executable, os.path.abspath(__file__), "--worker",
             "--coordinator", f"127.0.0.1:{port}",
             "--nproc", str(n), "--pid", str(p)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env={**os.environ, "PYTHONPATH": REPO + ":" +
                 os.environ.get("PYTHONPATH", "")})
            for p in range(n)]
        res = None
        for p, pr in enumerate(procs):
            out, _ = pr.communicate(timeout=600)
            assert pr.returncode == 0, f"worker {p}/{n} failed:\n{out}"
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    res = json.loads(line[7:])
        assert res is not None
        rows.append(res)
    base_dt = rows[0]["dt"]
    print(f"{'hosts':>6}{'Msamp/s':>12}{'weak-eff':>10}")
    effs = {}
    for r in rows:
        eff = base_dt / r["dt"]          # ideal weak scaling: flat wall-clock
        effs[r["nproc"]] = eff
        r["weak_efficiency"] = eff
        print(f"{r['nproc']:>6}{r['msps']:>12.0f}{eff:>9.0%}")
    if json_path:
        with open(json_path, "w") as f:
            json.dump({
                "metric": "weak-scaling efficiency, time-sharded 256-tap "
                          "FIR chain over N processes (gloo collectives)",
                "channels": C, "samples_per_shard": N_PER,
                "rows": rows,
            }, f, indent=1)
        print(f"wrote {json_path}")
    return effs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--nproc", type=int, default=1)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--json", default=None,
                    help="write the sweep result as a JSON artifact")
    a = ap.parse_args()
    if a.worker:
        worker(a.coordinator, a.nproc, a.pid)
        return
    ncores = os.cpu_count() or 4
    counts = [c for c in (1, 2, 4, 8) if c <= ncores]
    run_sweep(counts, json_path=a.json)


if __name__ == "__main__":
    main()
