#!/usr/bin/env python
"""Benchmark: 256-tap FIR + 4k FFT chain, Msamples/s/chip.

The driver runs this on real TPU hardware at the end of every round and
records the JSON line in BENCH_r{N}.json (metric from BASELINE.json).

Timing methodology: the chain is iterated inside one jitted fori_loop with a
data dependency between iterations, and the result is reduced to a scalar
that is read back — client-side async-dispatch artifacts (the axon relay
makes plain block_until_ready unreliable) cannot fake this number.

vs_baseline: the reference publishes no numbers (BASELINE.md); the recorded
ratio is measured throughput / single-core CPU estimate of the same chain
(libtsd-class C++ at ~1 GFLOP/s effective on this chain ~= 12 Msamp/s; see
BASELINE.md cost model (2+3*log2 Nf) FLOPs/sample).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax


def main():
    from libtsd_tpu.ops import fir_design as FD
    from libtsd_tpu.ops import filter_rt as FR

    # the chain: 256 channels x 262144 samples per step.  256-tap FIR then
    # 4096-point FFT power spectrum per frame (the BASELINE.json metric
    # chain), batched over channels to fill the chip.  Sized to amortize
    # the ~0.8 ms/iteration loop overhead of the target runtime (the
    # effective HBM bandwidth through this TPU tunnel is ~70 GB/s; the
    # chain's ~4 passes over the data put its roofline at ~4 Gsamp/s).
    C = 256
    N = 1 << 18
    NFFT = 4096
    h = FD.fir_lowpass(256, 0.2)
    fir = FR.Fir.create(h)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((C, N)), jnp.float32)

    iters = 3

    @jax.jit
    def chain(fir, xin):
        # all state created inside jit; blocks passed as pytree args
        # (eager ops and closure-captured device constants are unsupported
        # on some TPU runtimes)
        state0 = fir.init_for(xin)

        def body(i, carry):
            st, acc, v = carry
            st, y = fir.step(st, v)
            frames = y.reshape(C, N // NFFT, NFFT)
            spec = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2
            acc = acc + jnp.sum(spec, axis=1)
            # feed back a cheap mix so iterations are data-dependent
            v = v * 0.999
            return st, acc, v
        st, acc, v = lax.fori_loop(
            0, iters, body,
            (state0, jnp.zeros((C, NFFT // 2 + 1), jnp.float32), xin))
        return jnp.sum(acc) + jnp.sum(v)

    # warmup + compile
    _ = float(chain(fir, x))
    t0 = time.perf_counter()
    _ = float(chain(fir, x))
    dt = (time.perf_counter() - t0) / iters

    samples = C * N
    msps = samples / dt / 1e6

    # single-core CPU baseline estimate for the same chain (BASELINE.md):
    # ~(2*256 FIR + 5*log2(4096) FFT) flops/sample at ~4 GFLOP/s sustained
    cpu_baseline_msps = 12.0

    print(json.dumps({
        "metric": "fir256+fft4k chain throughput",
        "value": round(msps, 1),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / cpu_baseline_msps, 2),
    }))


if __name__ == "__main__":
    main()
