"""Fused FM chain (ops/pallas/fm.py) vs composed XLA FmReceiver on TPU.

Streaming (pipelined, dependency-chained) throughput at serving block
sizes.  Measured (v5e, C=256, 262144 samp/chan blocks): fused 76 Gsamp/s
input rate (~83% of the 9-byte/sample HBM roofline: 8 B complex input
read + 1 B effective audio write), composed XLA 62 Gsamp/s; on-device
agreement 8e-6.  NOTE: very large per-call buffers (C=256 x 2M+ samples
~ 4 GB) make the dependency-chained timing thrash HBM allocation and
can crash the remote compile helper on the composed path — bench at
serving block sizes.

Run: python benchmarks/tpu_fm_bench.py   (needs the axon TPU tunnel)
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from libtsd_tpu.models.receivers import FmReceiver, FmReceiverConfig
from libtsd_tpu.ops.pallas.fm import FmChainPallas

C, N = 256, 4 * 64 * 128 * 2


def bench(fn, xr, xi, reps: int = 3, K: int = 8) -> float:
    y = fn(xr)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(reps):
        z = xr
        t0 = time.perf_counter()
        for _ in range(K):
            y = fn(z)
            z = z + y[:, :1].sum() * 0       # dependency chain
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / K)
    return C * N / best / 1e9


def main():
    print("devices:", jax.devices())
    cfg = FmReceiverConfig()
    rx = FmReceiver.create(cfg)
    fm = FmChainPallas(cfg.channel_freq, cfg.decim, cfg.chan_taps,
                       cfg.deviation, cfg.deemph_fc)
    xr = jax.jit(lambda k: jax.random.normal(k, (C, N), jnp.float32))(
        jax.random.PRNGKey(0))
    xi = jax.jit(lambda k: jax.random.normal(k, (C, N), jnp.float32))(
        jax.random.PRNGKey(1))

    @jax.jit
    def comp(r, a, b):
        x = (a + 1j * b).astype(jnp.complex64)
        return r.step(r.init_for(x), x)[1]

    # on-device agreement
    ya = comp(rx, xr[:2], xi[:2])
    yb = fm(xr[:2], xi[:2], tb=64)
    err = float(jax.jit(lambda a, b: jnp.max(jnp.abs(a[:, 4:]
                                                     - b[:, 4:])))(ya, yb))
    print(f"fused vs composed on device: {err:.2e}")
    r = bench(lambda z: comp(rx, z, xi), xr, xi)
    print(f"composed XLA FmReceiver: {r:7.2f} Gsamp/s (input rate)")
    for tb in (32, 64, 128):
        r = bench(lambda z, tb=tb: fm(z, xi, tb=tb), xr, xi)
        print(f"fused Pallas (tb={tb:3d}) : {r:7.2f} Gsamp/s (input rate)")


if __name__ == "__main__":
    main()
