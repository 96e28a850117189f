#!/usr/bin/env python
"""BER vs Eb/N0 sweep across waveforms — the reference's benchmark
machinery (parity: bench_recepteur, core/tests/test-telecom.cc:731-809:
BPSK/QPSK/pi4-QPSK/8-PSK/16-QAM, SNR sweep, measured vs theoretical BER).

Writes ./build/report/ber_sweep/index.html with the curves and prints a
summary table.  Run on CPU or TPU:
    PYTHONPATH=/root/repo python examples/ber_sweep.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

# host-driven example: default to CPU (the axon remote-TPU tunnel cannot
# do the host-side complex transfers this script needs; set
# LIBTSD_EXAMPLE_TPU=1 on a directly-attached TPU).  Note the platform
# must be set BEFORE any backend query initializes jax.
if os.environ.get("LIBTSD_EXAMPLE_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from libtsd_tpu.models import waveform as WF
from libtsd_tpu.models import channel as CH
from libtsd_tpu.models import ber as BER
from libtsd_tpu.models.bitstream import randbits
from libtsd_tpu.models.modulator import ModConfig, Modulator
from libtsd_tpu.models.demod import DemodConfig, Demodulator
from libtsd_tpu.viz import Figure
from libtsd_tpu.viz.report import Report


def measure_ber(wf, EbN0_db: float, nbits: int, key, osf: int = 4,
                ncoefs: int = 0) -> float:
    """One TX -> AWGN -> demod -> count run.  ncoefs: shaping/matched
    filter length (0 = auto ~5*osf+1; the reference bench uses 63,
    test-telecom.cc:769, which lowers the truncation-ISI floor from
    6.3% to ~0.4% rms)."""
    mod = Modulator.create(ModConfig(wf=wf, fe=float(osf), fsymb=1.0,
                                     ncoefs=ncoefs))
    bits = randbits(key, nbits)
    x, _ = mod.modulate(bits)
    y = CH.awgn(jax.random.PRNGKey(hash((int(EbN0_db * 10),)) % (2 ** 31)),
                x, EbN0_db, osf=osf, k_bits=wf.info.k)
    dm = Demodulator.create(DemodConfig(wf=wf, fe=float(osf), fsymb=1.0,
                                        ncoefs_mf=ncoefs))
    rx_bits, syms, mask, bmask = dm.demodulate(y)
    rx = np.asarray(rx_bits)[np.asarray(bmask)]
    skip = nbits // 4  # convergence region
    if wf.info.is_psk or wf.info.is_qam:
        b, e, _ = BER.cmp_bits_psk(bits[skip:], jnp.asarray(rx[skip:]),
                                   wf.info.k, max_lag=64)
    else:
        b, e, _ = BER.cmp_bits(bits[skip:], jnp.asarray(rx[skip:]),
                               max_lag=64)
    return b


def main(nbits: int = 16384, snrs=None):
    # the reference's six-waveform sweep (test-telecom.cc:736-744):
    # 4-FSK at index 1.0 with Gaussian BT=2 shaping ("pour meilleure
    # discrimination"), everything else RRC 0.25; 63-tap filters
    if snrs is None:
        snrs = np.arange(-4.0, 16.1, 2.0)
    waveforms = [
        ("BPSK", WF.wf_bpsk(WF.PulseShape.rcs(0.25))),
        ("QPSK", WF.wf_qpsk(WF.PulseShape.rcs(0.25))),
        ("pi4-QPSK", WF.wf_pi4_qpsk(WF.PulseShape.rcs(0.25))),
        ("8PSK", WF.wf_psk(8, WF.PulseShape.rcs(0.25))),
        ("QAM16", WF.wf_qam(16, WF.PulseShape.rcs(0.25))),
        ("4FSK", WF.wf_fsk(4, 1.0, WF.PulseShape.gaussian(2.0))),
    ]
    rep = Report("./build/report/ber_sweep")
    print(f"{'waveform':<10}{'Eb/N0':>7}{'measured':>12}{'theory':>12}")
    for name, wf in waveforms:
        meas, theo = [], []
        for i, s in enumerate(snrs):
            b = measure_ber(wf, float(s), nbits,
                            jax.random.PRNGKey(1000 + i), ncoefs=63)
            t = float(wf.ber(float(s)))
            meas.append(max(b, 1e-7))
            theo.append(max(t, 1e-7))
            print(f"{name:<10}{s:>7.1f}{b:>12.2e}{t:>12.2e}")
        f = Figure(f"{name}: BER vs Eb/N0")
        f.plot(np.asarray(snrs), np.log10(theo), fmt="g-", label="theory")
        f.plot(np.asarray(snrs), np.log10(meas), fmt="r-o", label="measured")
        f.titles(f"{name}", "Eb/N0 (dB)", "log10 BER")
        rep.add_figure(f, name)
    rep.flush()
    print("report: ./build/report/ber_sweep/index.html")


if __name__ == "__main__":
    main()
