"""A/B bench on real TPU: IirFrame (frame-parallel block state-space)
vs Iir (per-sample transposed-DF-II lax.scan) — the measurement behind
the IirFrame design choice (TODO.md round-3 worklist).

Run: python benchmarks/tpu_iir_bench.py   (needs the axon TPU tunnel)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from libtsd_tpu.ops.filter_rt import Iir, IirFrame
from libtsd_tpu.ops.iir_design import design_iir


def bench(step, state, x, reps: int = 5, K: int = 8) -> float:
    """Streaming (pipelined) throughput: chain K state-dependent steps,
    one sync — a single synchronous call through the axon tunnel
    measures ~25 ms round-trip latency, not device time."""
    f = jax.jit(step)
    s, y = f(state, x)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(reps):
        s = state
        t0 = time.perf_counter()
        for _ in range(K):
            s, y = f(s, x)
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / K)
    return x.size / best / 1e6  # Msamples/s


def main():
    print("devices:", jax.devices())
    zpk = design_iir(2, "lp", "butterworth", 0.1)
    b, a = zpk.to_ba()
    C, N = 64, 1 << 18
    x = jax.random.normal(jax.random.PRNGKey(0), (C, N), jnp.float32)

    scan = Iir.create(b, a)
    frame = IirFrame.create(b, a)
    r_scan = bench(scan.step, scan.init_for(x), x)
    r_frame = bench(frame.step, frame.init_for(x), x)
    print(f"order-2 Butterworth, C={C}, N={N}:")
    print(f"  Iir (per-sample scan):  {r_scan:10.1f} Msamp/s")
    print(f"  IirFrame (block SS):    {r_frame:10.1f} Msamp/s"
          f"   ({r_frame / r_scan:.1f}x)")

    # accuracy cross-check
    s1, y1 = jax.jit(scan.step)(scan.init_for(x), x)
    s2, y2 = jax.jit(frame.step)(frame.init_for(x), x)
    err = float(jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y1)))
    print(f"  max rel diff scan vs frame: {err:.2e}")


if __name__ == "__main__":
    main()
