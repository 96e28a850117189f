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
    from libtsd_tpu.ops.pallas.iir import IirCascadePallas
    print("devices:", jax.devices())
    zpk = design_iir(2, "lp", "butterworth", 0.1)
    b, a = zpk.to_ba()
    C, N = 64, 1 << 18
    x = jax.random.normal(jax.random.PRNGKey(0), (C, N), jnp.float32)

    scan = Iir.create(b, a)
    frame = IirFrame.create(b, a)
    r_scan = bench(scan.step, scan.init_for(x), x)
    r_frame = bench(frame.step, frame.init_for(x), x)
    casc = IirCascadePallas([(np.asarray(b), np.asarray(a))])
    for tb in (32, 64, 128):
        r_pl = bench(lambda s, xx, tb=tb: casc(xx, s, tb=tb)[::-1],
                     casc.init(C), x)
        print(f"  Pallas fused (tb={tb:3d}): {r_pl:10.1f} Msamp/s")
    # 4th-order cascade (2 sections) through ONE kernel
    from libtsd_tpu.ops.iir_design import zpk_to_sos
    zpk4 = design_iir(4, "lp", "butterworth", 0.1)
    sos, kk = zpk_to_sos(zpk4)
    secs = [((sos[s, :3] * (kk if s == 0 else 1.0)), sos[s, 3:])
            for s in range(sos.shape[0])]
    casc4 = IirCascadePallas(secs)
    r_c4 = bench(lambda s, xx: casc4(xx, s, tb=64)[::-1],
                 casc4.init(C), x)
    print(f"order-2 Butterworth, C={C}, N={N}:")
    print(f"  Iir (per-sample scan):  {r_scan:10.1f} Msamp/s")
    print(f"  IirFrame (block SS):    {r_frame:10.1f} Msamp/s"
          f"   ({r_frame / r_scan:.1f}x)")
    print(f"  Pallas 2-section (order 4) cascade: {r_c4:10.1f} Msamp/s")

    # accuracy cross-check (incl. the Pallas kernel)
    s1, y1 = jax.jit(scan.step)(scan.init_for(x), x)
    s2, y2 = jax.jit(frame.step)(frame.init_for(x), x)
    y3, _ = casc(x, None, tb=64)
    err = float(jnp.max(jnp.abs(y1 - y2)) / jnp.max(jnp.abs(y1)))
    err3 = float(jnp.max(jnp.abs(y1 - y3)) / jnp.max(jnp.abs(y1)))
    print(f"  max rel diff scan vs frame: {err:.2e}, vs pallas: {err3:.2e}")


if __name__ == "__main__":
    main()
