"""Blind QAM-16 RX channel-scaling bench on real TPU.

Round-2 result (NEGATIVE, recorded in TODO.md): the symbol-rate pointer
demod (models/demod_dec2.py) is gather-bound when vmapped over channels
— aggregate was FLAT at 14.7/15.7/16.5 Msamp/s for C=256/1024/4096.

Round 3 adds the sub-block demod (models/demod_sb.py): ONE gather per S
symbols + dense intra-block math + sub-block-rate loop updates.  This
A/Bs both paths over the channel count (VERDICT round-3 item 1: done =
aggregate grows >=3x from C=256 to C=4096 at matching EVM).

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
from libtsd_tpu.models.demod_sb import DecisionDemodSB, SBDemodConfig
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


def bench(dd, C: int, reps: int = 3, batched: bool = False):
    x = make_signal(C)
    if batched:
        # natively batched step: zero per-channel gathers (demod_sb.py)
        step = jax.jit(dd.step)
        st = jax.jit(dd.init_for)(x)
    else:
        step = jax.jit(jax.vmap(dd.step))
        st = jax.jit(lambda: jax.vmap(lambda _: dd.init())(jnp.arange(C)))()
    st, out = step(st, x)
    jax.block_until_ready(out)
    # streaming (pipelined) throughput: chain K state-dependent steps,
    # one sync at the end — a single synchronous call measures the axon
    # tunnel round-trip (~25 ms), not device time
    K = 8
    best = float("inf")
    for _ in range(reps):
        s = st
        t0 = time.perf_counter()
        for _ in range(K):
            s, out = step(s, x)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / K)
    # EVM sanity on the run (tail symbols), computed fully inside jit
    # (axon: no eager complex ops / transfers)
    syms = out[1]

    @jax.jit
    def tail_evm(w, s):
        sym = w.symbols
        t = s[:, s.shape[1] // 2:]
        d2 = jnp.min(jnp.abs(t[..., None] - sym) ** 2, axis=-1)
        return jnp.sqrt(jnp.mean(d2) / jnp.mean(jnp.abs(sym) ** 2))

    e = float(jax.device_get(tail_evm(dd.wf, syms)))
    return C * N / best / 1e6, e


def main():
    wf = WF.wf_qam(16, WF.PulseShape.rcs(0.25))
    print("devices:", jax.devices())
    variants = [
        ("dd2 (symbol-rate)", DecisionDemod2.create(
            wf, DecDemodConfig(osf=OSF)), False),
        ("sb S=16 vmap", DecisionDemodSB.create(
            wf, SBDemodConfig(osf=OSF, S=16)), False),
        ("sb S=16 xla", DecisionDemodSB.create(
            wf, SBDemodConfig(osf=OSF, S=16, engine="xla")), True),
        ("sb S=16 pallas", DecisionDemodSB.create(
            wf, SBDemodConfig(osf=OSF, S=16, engine="pallas")), True),
        ("sb S=16 pal-bf16", DecisionDemodSB.create(
            wf, SBDemodConfig(osf=OSF, S=16, engine="pallas",
                              frames_bf16=True)), True),
        ("sb S=16 pal-mfb", DecisionDemodSB.create(
            wf, SBDemodConfig(osf=OSF, S=16, engine="pallas",
                              frames_bf16=True,
                              mf_precision="bf16")), True),
        ("sb S=16 fused", DecisionDemodSB.create(
            wf, SBDemodConfig(osf=OSF, S=16,
                              engine="pallas-fused")), True),
        ("sb S=32 xla", DecisionDemodSB.create(
            wf, SBDemodConfig(osf=OSF, S=32, tc=64.0, BL=0.0025,
                              engine="xla")), True),
        ("sb S=32 pallas", DecisionDemodSB.create(
            wf, SBDemodConfig(osf=OSF, S=32, tc=64.0, BL=0.0025,
                              engine="pallas")), True),
    ]
    want = sys.argv[1] if len(sys.argv) > 1 else ""
    for name, dd, batched in variants:
        if want and want not in name:
            continue
        for C in (256, 1024, 4096):
            r, e = bench(dd, C, batched=batched)
            print(f"{name:18s} C={C:5d}: {r:10.1f} Msamp/s aggregate "
                  f"({r / C * 1e3:8.1f} ksamp/s/chan)  tail_evm={e:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
