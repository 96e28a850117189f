"""Statistical BER-vs-theory agreement (the reference's correctness bound
for the modem stack — SURVEY §4, BASELINE.md: measured BER compared to the
waveform's theoretical ber(EbN0))."""
import numpy as np
import jax
import pytest

import sys
sys.path.insert(0, "/root/repo")
from examples.ber_sweep import measure_ber
from libtsd_tpu.models import waveform as WF


@pytest.mark.parametrize("name,wff,EbN0,factor", [
    # at very low SNR the blind clock/carrier loops add real
    # implementation loss (cycle slips); test where loops are stable
    ("bpsk", lambda: WF.wf_bpsk(WF.PulseShape.rcs(0.25)), 6.0, 4.0),
    ("qpsk", lambda: WF.wf_qpsk(WF.PulseShape.rcs(0.25)), 4.0, 3.0),
    ("qam16", lambda: WF.wf_qam(16, WF.PulseShape.rcs(0.25)), 8.0, 4.0),
])
def test_measured_ber_close_to_theory(name, wff, EbN0, factor):
    wf = wff()
    b = measure_ber(wf, EbN0, 12000, jax.random.PRNGKey(7))
    t = float(wf.ber(EbN0))
    # statistical agreement: within `factor` x theory + counting floor
    assert b < factor * t + 5e-3, (name, b, t)
    # and not impossibly good (sanity that noise was actually applied)
    assert b > t / 10, (name, b, t)
