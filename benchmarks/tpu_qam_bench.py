"""Blind QAM-16 RX channel-scaling bench on real TPU.

The single-scan pointer demod (models/demod_dec2.py) is bound by its
sequential symbol-rate scan, not by per-channel VPU work — so aggregate
Msamples/s should rise ~linearly with the channel count C until the VPU
lanes saturate.  This measures that curve (TODO.md round-3 worklist).

Run: python benchmarks/tpu_qam_bench.py   (needs the axon TPU tunnel)
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from libtsd_tpu.models import waveform as WF
from libtsd_tpu.models.demod_dec import DecDemodConfig
from libtsd_tpu.models.demod_dec2 import DecisionDemod2
from libtsd_tpu.models.modulator import ModConfig, Modulator
from libtsd_tpu.models.bitstream import randbits

OSF = 4
N = 8192  # samples per channel per step


def make_signal(C: int) -> jax.Array:
    wf = WF.wf_qam(16, WF.PulseShape.rcs(0.25))
    mod = Modulator.create(ModConfig(wf=wf, fe=float(OSF), fsymb=1.0))

    @jax.jit
    def gen():
        # axon: no eager ops / no complex transfers — build everything
        # on device inside one jit; tiny per-channel perturbation so
        # channels are not byte-identical
        bits = randbits(jax.random.PRNGKey(0), 4 * (N // OSF))
        x, _ = mod.modulate(bits)
        x = x[:N]
        nr, ni = jax.random.normal(jax.random.PRNGKey(1),
                                   (2, C, N), jnp.float32) * 0.03
        return x[None, :] + (nr + 1j * ni).astype(jnp.complex64)

    return gen()


def bench(C: int, reps: int = 3) -> float:
    wf = WF.wf_qam(16, WF.PulseShape.rcs(0.25))
    dd = DecisionDemod2.create(wf, DecDemodConfig(osf=OSF))
    x = make_signal(C)
    step = jax.jit(jax.vmap(dd.step))
    st = jax.jit(lambda: jax.vmap(lambda _: dd.init())(jnp.arange(C)))()
    st, out = step(st, x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _, out = step(st, x)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return C * N / best / 1e6


def main():
    print("devices:", jax.devices())
    for C in (256, 1024, 4096):
        r = bench(C)
        print(f"C={C:5d}: {r:10.1f} Msamp/s aggregate "
              f"({r / 4:.1f} Msym/s, {r / C * 1e3:.1f} ksamp/s/chan)")


if __name__ == "__main__":
    main()
