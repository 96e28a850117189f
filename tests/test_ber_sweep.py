"""Statistical BER-vs-theory agreement (the reference's correctness bound
for the modem stack — SURVEY §4, BASELINE.md: measured BER compared to the
waveform's theoretical ber(EbN0)).

Round 3 widens this to the reference bench's SIX waveforms
(test-telecom.cc:731-809: BPSK/QPSK/pi4-QPSK/8-PSK/16-QAM/4-FSK) at
MULTIPLE Eb/N0 points spanning each waterfall, under the reference
bench's conditions: 63-tap shaping filters (ncoefs_filtre_mise_en_forme,
:769) and no carrier loop (carrier_rec_bl=0, :768 — phase-aligned
simulation isolates matched-filter + clock-recovery loss).  The blind
full-chain (carrier loop ON) is gated separately where the loops are
stable, including the low-SNR region the round-2 tests excluded.

Gate factors are calibrated against measured behavior (committed in this
file's history): QPSK tracks theory within ~2x everywhere including
0 dB; BPSK sees Gardner timing slips below ~4 dB (3 dB less symbol SNR
than QPSK at equal Eb/N0); 4-FSK's quadrature-discriminator demod is
noncoherent, so its loss vs the coherent-orthogonal ber() curve grows
with SNR (the reference's own bench records FSK without gating,
check_errs=non)."""
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

from libtsd_tpu.models import ber as BER
from libtsd_tpu.models import channel as CH
from libtsd_tpu.models import waveform as WF
from libtsd_tpu.models.bitstream import randbits
from libtsd_tpu.models.demod import DemodConfig, Demodulator
from libtsd_tpu.models.modulator import ModConfig, Modulator

# tier-2: long statistical sweep — excluded from the <3-min default loop
pytestmark = pytest.mark.slow


def _measure(wf, EbN0_db, nbits, key, carrier_active, ncoefs=63, osf=4):
    mod = Modulator.create(ModConfig(wf=wf, fe=float(osf), fsymb=1.0,
                                     ncoefs=ncoefs))
    bits = randbits(key, nbits)
    x, _ = mod.modulate(bits)
    y = CH.awgn(jax.random.PRNGKey(hash((int(EbN0_db * 10),)) % (2 ** 31)),
                x, EbN0_db, osf=osf, k_bits=wf.info.k)
    dm = Demodulator.create(DemodConfig(wf=wf, fe=float(osf), fsymb=1.0,
                                        ncoefs_mf=ncoefs,
                                        carrier_active=carrier_active))
    rx_bits, syms, mask, bmask = dm.demodulate(y)
    rx = np.asarray(rx_bits)[np.asarray(bmask)]
    skip = nbits // 4
    if wf.info.is_psk or wf.info.is_qam:
        b, e, _ = BER.cmp_bits_psk(bits[skip:], jnp.asarray(rx[skip:]),
                                   wf.info.k, max_lag=64)
    else:
        b, e, _ = BER.cmp_bits(bits[skip:], jnp.asarray(rx[skip:]),
                               max_lag=64)
    return b


# ------------------------- reference-bench mode (carrier loop off) -----
# three points per waveform spanning the waterfall; factor = allowed
# measured/theory ratio + a counting floor

BENCH = [
    ("bpsk", lambda: WF.wf_bpsk(WF.PulseShape.rcs(0.25)),
     [(0.0, 8.0), (4.0, 4.0), (8.0, 6.0)]),
    ("qpsk", lambda: WF.wf_qpsk(WF.PulseShape.rcs(0.25)),
     [(0.0, 4.0), (4.0, 3.0), (8.0, 3.0)]),
    ("pi4qpsk", lambda: WF.wf_pi4_qpsk(WF.PulseShape.rcs(0.25)),
     [(2.0, 4.0), (4.0, 3.0), (8.0, 3.0)]),
    ("8psk", lambda: WF.wf_psk(8, WF.PulseShape.rcs(0.25)),
     [(6.0, 4.0), (8.0, 3.0), (10.0, 4.0)]),
    ("qam16", lambda: WF.wf_qam(16, WF.PulseShape.rcs(0.25)),
     [(6.0, 3.0), (8.0, 3.0), (12.0, 10.0)]),
    # 4-FSK: reference params (index 1.0, Gaussian BT=2, :743,755);
    # noncoherent discriminator loss vs the coherent curve
    ("4fsk", lambda: WF.wf_fsk(4, 1.0, WF.PulseShape.gaussian(2.0)),
     [(8.0, 8.0), (10.0, 15.0), (12.0, 50.0)]),
]


@pytest.mark.parametrize("name,wff,points",
                         BENCH, ids=[b[0] for b in BENCH])
def test_ber_vs_theory_bench_mode(name, wff, points):
    wf = wff()
    for EbN0, factor in points:
        b = _measure(wf, EbN0, 12000, jax.random.PRNGKey(7),
                     carrier_active=False)
        t = float(wf.ber(EbN0))
        assert b < factor * t + 6e-4, (name, EbN0, b, t)
    # waterfall sanity on the last two points: BER decreases with SNR
    # (checked implicitly by the per-point gates above)


# ----------------------------- blind full chain (carrier loop on) ------

BLIND = [
    ("qpsk", lambda: WF.wf_qpsk(WF.PulseShape.rcs(0.25)),
     [(0.0, 4.0), (4.0, 3.0), (8.0, 3.0)]),   # stable at 0 dB (measured)
    ("bpsk", lambda: WF.wf_bpsk(WF.PulseShape.rcs(0.25)),
     [(4.0, 8.0), (6.0, 5.0), (8.0, 4.0)]),   # slips below ~4 dB
    ("pi4qpsk", lambda: WF.wf_pi4_qpsk(WF.PulseShape.rcs(0.25)),
     [(8.0, 4.0), (10.0, 4.0)]),              # union-PED slips below ~7
    ("8psk", lambda: WF.wf_psk(8, WF.PulseShape.rcs(0.25)),
     [(8.0, 4.0), (10.0, 4.0)]),
    ("qam16", lambda: WF.wf_qam(16, WF.PulseShape.rcs(0.25)),
     [(8.0, 3.0), (10.0, 6.0)]),
]


@pytest.mark.parametrize("name,wff,points",
                         BLIND, ids=[b[0] for b in BLIND])
def test_ber_vs_theory_blind_chain(name, wff, points):
    wf = wff()
    for EbN0, factor in points:
        b = _measure(wf, EbN0, 12000, jax.random.PRNGKey(7),
                     carrier_active=True)
        t = float(wf.ber(EbN0))
        assert b < factor * t + 6e-4, (name, EbN0, b, t)


def test_blind_loops_noise_applied_sanity():
    """Noise actually flows (measured BER not impossibly good) and the
    bench-mode/blind-mode plumbing differs only by the carrier loop."""
    wf = WF.wf_qpsk(WF.PulseShape.rcs(0.25))
    b = _measure(wf, 4.0, 12000, jax.random.PRNGKey(7),
                 carrier_active=True)
    t = float(wf.ber(4.0))
    assert b > t / 10, (b, t)
