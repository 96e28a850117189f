"""BASELINE config 3 on real TPU: polyphase rational resampler
(48k -> 44.1k = 147/160) + 256-tap FIR on 64 channels.

The resampler's hot path is the one-cycle matmul form (ops/resample.py:
hop-strided frames x the precomputed (p, q+K) matrix — no per-output
window takes or LUT gathers).  Timing: K chained steps inside one jit
(lax.fori_loop) with a small reduction readback — the only trustworthy
methodology on the remote runtime (see .claude/skills/verify/SKILL.md).

Run: python benchmarks/tpu_resample_bench.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from libtsd_tpu.ops.fir_design import fir_lowpass
from libtsd_tpu.ops.filter_rt import Fir
from libtsd_tpu.ops.resample import RationalResampler

P, Q = 147, 160          # 44100 / 48000


def bench(C: int, n: int, reps: int = 3, K: int = 8,
          with_fir: bool = True):
    rr = RationalResampler.create(P / Q)
    fir = Fir.create(fir_lowpass(256, 0.2, "hn"))

    @jax.jit
    def gen(key):
        shape = (C, n) if C > 1 else (n,)
        return (jax.random.normal(key, shape)
                + 1j * jax.random.normal(key, shape)).astype(jnp.complex64)

    x = gen(jax.random.PRNGKey(0))

    @jax.jit
    def chain(xx):
        def body(_, carry):
            srr, sfir, acc = carry
            srr, y = rr.step(srr, xx)
            if with_fir:
                sfir, y = fir.step(sfir, y)
            # fold a dependence on y into the carry so no iteration can
            # be elided
            acc = acc + jnp.sum(jnp.real(y[..., :64]), axis=-1)
            return srr, sfir, acc
        srr = rr.init_for(xx)
        sfir = fir.init_for(xx[..., : n * P // Q])
        acc = jnp.zeros(xx.shape[:-1], jnp.float32)
        _, _, acc = jax.lax.fori_loop(0, K, body, (srr, sfir, acc))
        return acc.reshape(-1)[:16].sum().repeat(32)

    r = np.asarray(chain(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = np.asarray(chain(x))
        best = min(best, (time.perf_counter() - t0) / K)
    return C * n / best / 1e6, best


def main():
    print("devices:", jax.devices(), flush=True)
    for C, n, wf in ((1, Q * 512, False), (64, Q * 512, False),
                     (64, Q * 512, True), (64, Q * 2048, True),
                     (256, Q * 512, True)):
        r, t = bench(C, n, with_fir=wf)
        tag = "+ 256-tap FIR" if wf else "resampler only"
        print(f"C={C:4d} n={n:7d} {tag:15s}: {r:9.1f} Msamp/s input rate "
              f"({t * 1e3:7.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
