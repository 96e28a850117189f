#!/usr/bin/env python
"""Sweep the fused chain kernel (ops/pallas/chain.py) precision/tb/
fir_passes configs on the real TPU — picks the BASELINE metric config.

Methodology: K state-chained iterations inside one jitted fori_loop with a
scalar readback (see .claude/skills/verify/SKILL.md — the only trustworthy
timing on the axon tunnel), best-of-3 per config.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_chain_bench.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def main():
    from libtsd_tpu.ops import fir_design as FD
    from libtsd_tpu.ops.filter_rt import fir_toeplitz_mats
    from libtsd_tpu.ops.pallas.chain import fir_periodogram4096

    C = 256
    N = 1 << 22
    iters = 3

    h = FD.fir_lowpass(256, 0.2)
    G = jnp.asarray(fir_toeplitz_mats(np.asarray(h, np.float64)),
                    jnp.float32)
    key = jax.random.PRNGKey(0)
    xf = jax.jit(lambda k: jax.random.normal(k, (C, N), jnp.float32))(key)
    xi16 = jax.jit(lambda k: jax.random.randint(
        k, (C, N), -2048, 2048, jnp.int16))(key)

    configs = []
    for tb in (128, 256):
        for fp in (3, 2):
            configs.append(("int16", tb, fp))
    configs += [("split", 128, 3), ("split", 128, 2), ("bf16", 128, 3),
                ("int16", 64, 3)]

    for prec, tb, fp in configs:
        x = xi16 if prec == "int16" else xf

        @jax.jit
        def chain(G, xin):
            def body(i, carry):
                acc, g = carry
                acc = acc + fir_periodogram4096(
                    xin, g, precision=prec, tb=tb, fir_passes=fp)
                g = g + jnp.mean(acc) * 1e-24
                return acc, g
            acc, _ = lax.fori_loop(
                0, iters, body, (jnp.zeros((C, 4096), jnp.float32), G))
            return jnp.sum(acc)

        try:
            _ = float(chain(G, x))  # compile+warm
            best = np.inf
            for _i in range(3):
                t0 = time.perf_counter()
                _ = float(chain(G, x))
                best = min(best, time.perf_counter() - t0)
            gsps = C * N * iters / best / 1e9
            print(f"{prec:6s} tb={tb:3d} fir_passes={fp}: "
                  f"{gsps:7.2f} Gsamp/s", flush=True)
        except Exception as e:  # noqa
            print(f"{prec:6s} tb={tb:3d} fir_passes={fp}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
