"""Polyphase-FFT channelizer throughput on real TPU.

The M-channel analysis bank (models/channelizer.py): polyphase partition
as a reshape + batched FIR + ONE batched FFT across branches — no
per-channel loops.  Measures input-rate samples/s over M and block size,
plus the round-trip (channelize -> dechannelize) reconstruction error.

Run: python benchmarks/tpu_channelizer_bench.py   (needs the axon tunnel)
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from libtsd_tpu.models.channelizer import Channelizer, dechannelize


def bench(M: int, n: int, reps: int = 3, K: int = 8):
    cz = Channelizer.create(M)

    @jax.jit
    def gen(key):
        return (jax.random.normal(key, (n,))
                + 1j * jax.random.normal(key, (n,))).astype(jnp.complex64)

    x = gen(jax.random.PRNGKey(0))
    step = jax.jit(cz.step)
    st = jax.jit(cz.init)()
    st1, y = step(st, x)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(reps):
        s = st
        t0 = time.perf_counter()
        for _ in range(K):
            s, y = step(s, x)
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / K)
    return n / best / 1e6, best


def roundtrip_err(M: int, n: int = 1 << 16):
    @jax.jit
    def rt(key):
        x = (jax.random.normal(key, (n,))
             + 1j * jax.random.normal(key, (n,))).astype(jnp.complex64)
        cz = Channelizer.create(M)
        _, ch = cz.step(cz.init(), x)
        xr = dechannelize(ch.T, M)
        # group delay of analysis+synthesis prototype pair
        d = int(2 * (cz.P.shape[1] * M // 2)) - M
        a = x[: n - d]
        b = xr[d: n]
        m = min(a.shape[0], b.shape[0]) - M
        a, b = a[M:m], b[M:m]
        return jnp.sqrt(jnp.mean(jnp.abs(a - b) ** 2)
                        / jnp.mean(jnp.abs(a) ** 2))

    return float(jax.device_get(rt(jax.random.PRNGKey(1))))


def bench_wola(M: int, n: int, C: int = 1, reps: int = 3, K: int = 8):
    from libtsd_tpu.models.channelizer import wola_analysis, wola_synthesis

    @jax.jit
    def gen(key):
        shape = (C, n) if C > 1 else (n,)
        return (jax.random.normal(key, shape)
                + 1j * jax.random.normal(key, shape)).astype(jnp.complex64)

    x = gen(jax.random.PRNGKey(0))

    # K chained round trips inside ONE jit (fori_loop) with a reduction
    # readback: host-chained dispatch timing is unreliable on the remote
    # runtime (block_until_ready returned in 0.02 ms for work that takes
    # ~19 ms when forced — see .claude/skills/verify/SKILL.md)
    @jax.jit
    def chain(z):
        def body(_, zz):
            return wola_synthesis(wola_analysis(zz, M), M)[..., :n]
        z = jax.lax.fori_loop(0, K, body, z)
        return jnp.stack([jnp.real(z[..., :64]).sum(),
                          jnp.imag(z[..., :64]).sum()]).repeat(16)
    r = np.asarray(chain(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = np.asarray(chain(x))
        best = min(best, (time.perf_counter() - t0) / K)
    return C * n / best / 1e6, best


def main():
    print("devices:", jax.devices(), flush=True)
    for M in (16, 64, 256):
        for n in (1 << 20, 1 << 22):
            r, t = bench(M, n)
            print(f"M={M:4d} n={n:8d}: {r:9.1f} Msamp/s input rate "
                  f"({t * 1e3:7.2f} ms/step)", flush=True)
    for C, M, n in ((1, 16, 1 << 21), (64, 16, 1 << 16),
                    (64, 256, 1 << 16), (256, 16, 1 << 14)):
        r, t = bench_wola(M, n, C=C)
        print(f"WOLA round-trip C={C:4d} M={M:4d}: {r:9.1f} Msamp/s "
              f"aggregate ({t * 1e3:7.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
