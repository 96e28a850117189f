#!/usr/bin/env python
"""Scaling benchmark (BASELINE.json config 3): polyphase 48k->44.1k
resampler + 256-tap FIR on 64 sharded channels; samples/s and scaling
efficiency across mesh sizes.

On CPU it uses virtual devices (XLA_FLAGS=--xla_force_host_platform_device_count=8)
to validate the sharding and measure relative efficiency; on a real pod
slice the same script measures true multi-chip scaling.

    PYTHONPATH=/root/repo python examples/scaling_bench.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import numpy as np
import jax

# NOTE: querying the backend would LOCK it before we can switch — decide by
# env var instead.  Set LIBTSD_SCALING_TPU=1 to run on real TPU devices.
if os.environ.get("LIBTSD_SCALING_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from libtsd_tpu.ops import fir_design as FD
from libtsd_tpu.ops import filter_rt as FR
from libtsd_tpu.ops.resample import RationalResampler
from libtsd_tpu.parallel import make_mesh


def build_step(C, N):
    h = FD.fir_lowpass(256, 0.2)
    fir = FR.Fir.create(h)
    rs = RationalResampler.create(147 / 160)  # 48k -> 44.1k

    def step(fir, rs, x):
        st = fir.init_for(x)
        _, y = fir.step(st, x)
        z = jax.vmap(lambda v: rs.step(rs.init_for(v), v)[1])(y)
        return jnp.sum(jnp.abs(z) ** 2)

    return fir, rs, jax.jit(step)


def bench(nchips: int, C: int = 64, N: int = 160 * 128, iters: int = 3):
    mesh = make_mesh(chan=nchips, time=1)
    fir, rs, step = build_step(C, N)
    x = jax.device_put(
        jnp.asarray(np.random.default_rng(0).standard_normal((C, N)),
                    jnp.float32),
        NamedSharding(mesh, P("chan", None)))
    float(step(fir, rs, x))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(iters):
        r = step(fir, rs, x)
    float(r)
    dt = (time.perf_counter() - t0) / iters
    return C * N / dt / 1e6


def main():
    ndev = len(jax.devices())
    counts = [c for c in [1, 2, 4, 8] if c <= ndev]
    base = None
    print(f"{'chips':>6}{'Msamp/s':>12}{'efficiency':>12}")
    for c in counts:
        msps = bench(c)
        if base is None:
            base = msps
        eff = msps / (base * c)
        print(f"{c:>6}{msps:>12.0f}{eff:>11.0%}")


if __name__ == "__main__":
    main()
