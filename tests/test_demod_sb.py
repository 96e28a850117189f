"""Sub-block decision-directed demod (models/demod_sb.py): convergence,
1-D vs batched path equivalence, streaming continuity.

Parity anchor: same loop equations as DemodGen2
(core/src/telecom/demod-dec.cc) at sub-block update rate.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libtsd_tpu.models import ber as BER
from libtsd_tpu.models import channel as CH
from libtsd_tpu.models import waveform as WF
from libtsd_tpu.models.bitstream import randbits
from libtsd_tpu.models.demod_sb import DecisionDemodSB, SBDemodConfig
from libtsd_tpu.models.modulator import ModConfig, Modulator
from libtsd_tpu.ops.fft import delay_signal


def _qpsk_signal(nsym=3000, snr=15.0):
    wf = WF.wf_qpsk(WF.PulseShape.rcs(0.25))
    mod = Modulator.create(ModConfig(wf=wf, fe=4.0, fsymb=1.0))
    bits = randbits(jax.random.PRNGKey(40), 2 * nsym)
    x, _ = mod.modulate(bits)
    x = delay_signal(x, 1.7)
    x = x * jnp.exp(2j * jnp.pi * 2e-4 *
                    jnp.arange(x.shape[0])).astype(jnp.complex64)
    x = CH.awgn(jax.random.PRNGKey(41), x, snr, osf=4, k_bits=2)
    n = (x.shape[0] // 64) * 64
    return wf, bits, x[:n]


@pytest.mark.parametrize("S", [8, 16, 32])
def test_subblock_qpsk_converges(S):
    """Combined timing + frequency offset + noise: zero steady-state
    errors at every sub-block size."""
    wf, bits, x = _qpsk_signal()
    dd = DecisionDemodSB.create(wf, SBDemodConfig(osf=4, S=S))
    _, (rb, syms, mask, bmask) = dd.step(dd.init(), x)
    rbn = np.asarray(rb)[np.asarray(bmask)]
    ber, errs, lag = BER.cmp_bits_psk(bits[2 * 800:],
                                      jnp.asarray(rbn[2 * 800:]), 2,
                                      max_lag=64)
    assert errs == 0, (S, ber, errs)


def test_subblock_batched_matches_1d():
    """The gather-free batched path runs the SAME loop math as the 1-D
    dynamic_slice path: per-symbol outputs agree to float32 noise."""
    wf, bits, x = _qpsk_signal(nsym=1500)
    dd = DecisionDemodSB.create(wf, SBDemodConfig(osf=4, S=16))
    _, (b1, s1, m1, _) = dd.step(dd.init(), x)
    xb = jnp.stack([x, delay_signal(x, 0.9)])
    _, (b2, s2, m2, _) = dd.step(dd.init_for(xb), xb)
    m1n, m2n = np.asarray(m1), np.asarray(m2)
    both = m1n & m2n[0]
    d = np.abs(np.asarray(s1)[both] - np.asarray(s2)[0][both])
    assert d.max() < 1e-4 and d.mean() < 1e-5, (d.max(), d.mean())
    # second channel (different delay) also converges
    rbn = np.asarray(b2[1])[np.asarray(m2[1].repeat(2))]
    ber, errs, _ = BER.cmp_bits_psk(bits[2 * 800:],
                                    jnp.asarray(rbn[2 * 800:]), 2,
                                    max_lag=64)
    assert errs == 0, (ber, errs)


def test_subblock_streaming_matches_oneshot():
    """Block-boundary continuity of the batched path (carried MF tail,
    pointer re-basing, loop state)."""
    wf, bits, x = _qpsk_signal(nsym=1200)
    xb = x[None]
    dd = DecisionDemodSB.create(wf, SBDemodConfig(osf=4, S=16))
    _, (b1, s1, m1, _) = dd.step(dd.init_for(xb), xb)
    half = (x.shape[0] // 128) * 64
    st = dd.init_for(xb)
    st, (ba, sa, ma, _) = dd.step(st, xb[:, :half])
    st, (bb, sb, mb, _) = dd.step(st, xb[:, half:])
    one = np.asarray(s1)[0][np.asarray(m1)[0]]
    two = np.concatenate([np.asarray(sa)[0][np.asarray(ma)[0]],
                          np.asarray(sb)[0][np.asarray(mb)[0]]])
    ncmp = min(len(one), len(two))
    assert ncmp >= len(one) - 16    # at most one sub-block deferred
    d = np.abs(one[:ncmp] - two[:ncmp])
    # small residual = float32 pointer re-basing through the feedback
    # loop (same bound as the DecisionDemod2 streaming test)
    assert np.max(d) < 0.06 and np.mean(d) < 5e-3, (d.max(), d.mean())


def test_cmp_bits_rot_resolves_qam_rotation():
    """cmp_bits_rot undoes a 90-degree constellation lock that index
    rotation (cmp_bits_psk) cannot, on Gray-mapped QAM-16."""
    from libtsd_tpu.models.waveform import bits_to_symbol_indices
    wf = WF.wf_qam(16, WF.PulseShape.rcs(0.25))
    bits = randbits(jax.random.PRNGKey(7), 4 * 500)
    idx = bits_to_symbol_indices(bits, 4)
    syms = wf.symbols[idx] * jnp.exp(1j * jnp.pi / 2)
    ber, errs, lag = BER.cmp_bits_rot(bits, np.asarray(syms), wf)
    assert errs == 0 and lag == 0, (ber, errs, lag)


def test_subblock_odd_osf_rejected():
    wf = WF.wf_qpsk(WF.PulseShape.rcs(0.25))
    with pytest.raises(ValueError):
        DecisionDemodSB.create(wf, SBDemodConfig(osf=3, S=16))


def test_subblock_pointer_lockout_recovers():
    """A pointer driven outside the frame margins must re-anchor to the
    nominal grid and re-acquire — without the recovery, o_raw is
    invariant under the nominal advance and the channel stays invalid
    FOREVER (review finding, round 3)."""
    wf, bits, x = _qpsk_signal(nsym=2000)
    xb = x[None]
    dd = DecisionDemodSB.create(wf, SBDemodConfig(osf=4, S=16))
    st = dd.init_for(xb)
    # corrupt the pointer far past the forward margin (MH = 2*osf)
    st = dict(st, ptr=st["ptr"] + 40.0)
    st, (rb, syms, mask, bmask) = dd.step(st, xb)
    m = np.asarray(mask)[0]
    assert m.any(), "channel never recovered from an out-of-range pointer"
    # the tail must be converged symbols again (not just marked valid)
    tail = np.asarray(syms)[0][m]
    tail = tail[-400:]
    d2 = np.min(np.abs(tail[:, None] - np.asarray(wf.symbols)) ** 2, axis=1)
    evm = np.sqrt(d2.mean() / np.mean(np.abs(np.asarray(wf.symbols))**2))
    assert evm < 0.25, evm


def test_subblock_ndim3_batch():
    """The documented (..., n) contract: a (B, C, n) input runs through
    the batched path via leading-dim flattening."""
    wf, bits, x = _qpsk_signal(nsym=800)
    xb = jnp.stack([x, delay_signal(x, 0.9)]).reshape(2, 1, -1)
    dd = DecisionDemodSB.create(wf, SBDemodConfig(osf=4, S=16))
    st, (rb, syms, mask, bmask) = dd.step(dd.init_for(xb), xb)
    assert syms.shape[:2] == (2, 1)
    _, (r1, s1, m1, _) = dd.step(dd.init_for(x[None]), x[None])
    both = np.asarray(mask)[0, 0] & np.asarray(m1)[0]
    d = np.abs(np.asarray(syms)[0, 0][both] - np.asarray(s1)[0][both])
    assert d.max() < 1e-5


def test_subblock_sinc_interpolator_batched():
    """The windowed-sinc interpolator (highest-quality) now has
    closed-form batched taps — the batched path must accept it and
    converge (round-3 raised NotImplementedError)."""
    wf, bits, x = _qpsk_signal(nsym=1500)
    dd = DecisionDemodSB.create(wf, SBDemodConfig(osf=4, S=16,
                                                  itrp="sinc"))
    xb = jnp.stack([x, delay_signal(x, 0.9)])
    _, (rb, syms, mask, bmask) = dd.step(dd.init_for(xb), xb)
    rbn = np.asarray(rb[0])[np.asarray(bmask[0])]
    ber, errs, _ = BER.cmp_bits_psk(bits[2 * 800:],
                                    jnp.asarray(rbn[2 * 800:]), 2,
                                    max_lag=64)
    assert errs == 0, (ber, errs)


def test_subblock_pallas_matches_xla():
    """The Pallas kernel (ops/pallas/demod_sb.py, interpret mode) runs
    the same loop math as the XLA scan: outputs agree to float32 noise
    (the only re-associations are reductions and the polynomial atan2)."""
    wf, bits, x = _qpsk_signal(nsym=600)
    delays = np.linspace(0.0, 0.9, 8)
    xb = jnp.concatenate([jnp.stack([delay_signal(x, d) for d in delays])
                          for _ in range(16)])             # 128 channels
    dd_x = DecisionDemodSB.create(wf, SBDemodConfig(osf=4, S=16,
                                                    engine="xla"))
    dd_p = DecisionDemodSB.create(wf, SBDemodConfig(
        osf=4, S=16, engine="pallas-interpret"))
    _, (b1, s1, m1, _) = dd_x.step(dd_x.init_for(xb), xb)
    _, (b2, s2, m2, _) = dd_p.step(dd_p.init_for(xb), xb)
    assert np.array_equal(np.asarray(m1), np.asarray(m2))
    both = np.asarray(m1)
    d = np.abs(np.asarray(s1)[both] - np.asarray(s2)[both])
    assert d.max() < 1e-3, d.max()
    assert np.mean(np.asarray(b1) != np.asarray(b2)) < 1e-4


def test_subblock_pallas_qam16_closed_form_decisions():
    """Square-QAM closed-form per-axis quantization in the kernel must
    reproduce the XLA path's argmin decisions on a QAM-16 run."""
    import libtsd_tpu.models.waveform as WF2
    wf = WF2.wf_qam(16, WF2.PulseShape.rcs(0.25))
    from libtsd_tpu.models.modulator import ModConfig, Modulator
    mod = Modulator.create(ModConfig(wf=wf, fe=4.0, fsymb=1.0))
    bits = randbits(jax.random.PRNGKey(50), 4 * 800)
    x, _ = mod.modulate(bits)
    x = delay_signal(x, 1.3)
    x = CH.awgn(jax.random.PRNGKey(51), x, 18.0, osf=4, k_bits=4)
    n = (x.shape[0] // 64) * 64
    x = x[:n]
    xb = jnp.broadcast_to(x, (128, n))
    dd_x = DecisionDemodSB.create(wf, SBDemodConfig(osf=4, S=16,
                                                    engine="xla"))
    dd_p = DecisionDemodSB.create(wf, SBDemodConfig(
        osf=4, S=16, engine="pallas-interpret"))
    _, (b1, s1, m1, _) = dd_x.step(dd_x.init_for(xb), xb)
    _, (b2, s2, m2, _) = dd_p.step(dd_p.init_for(xb), xb)
    assert np.array_equal(np.asarray(m1), np.asarray(m2))
    assert np.mean(np.asarray(b1) != np.asarray(b2)) < 1e-4


def test_subblock_pallas_fused_converges_and_matches():
    """The fully fused MF+demod kernel (engine='pallas-fused', interpret
    mode): decodes the same QPSK stream with zero steady-state errors and
    symbol outputs closely tracking the XLA path (not bit-identical by
    design: streaming AGC pre-scale + true-MF-tail block edges)."""
    wf, bits, x = _qpsk_signal(nsym=900)
    n = x.shape[0]
    xb = jnp.broadcast_to(x, (128, n))
    dd_x = DecisionDemodSB.create(wf, SBDemodConfig(osf=4, S=16,
                                                    engine="xla"))
    dd_f = DecisionDemodSB.create(wf, SBDemodConfig(
        osf=4, S=16, engine="pallas-fused-interpret"))
    _, (b1, s1, m1, _) = dd_x.step(dd_x.init_for(xb), xb)
    _, (b2, s2, m2, bm2) = dd_f.step(dd_f.init_for(xb), xb)
    # convergence: decode the payload with zero errors past warm-up
    rbn = np.asarray(b2[0])[np.asarray(bm2[0])]
    ber, errs, _ = BER.cmp_bits_psk(bits[2 * 700:],
                                    jnp.asarray(rbn[2 * 700:]), 2,
                                    max_lag=64)
    assert errs == 0, (ber, errs)
    # post-lock symbols track the XLA path closely
    both = np.asarray(m1[0]) & np.asarray(m2[0])
    both[: len(both) // 2] = False
    d = np.abs(np.asarray(s1[0])[both] - np.asarray(s2[0])[both])
    assert np.median(d) < 0.02, np.median(d)


def test_subblock_pallas_fused_streaming_continuity():
    """Fused engine: two half-blocks equal one full block (input-tail MF
    recomputation + pointer rebase + power EMA carry)."""
    wf, bits, x = _qpsk_signal(nsym=1200)
    n = (x.shape[0] // 2048) * 2048
    x = x[:n]
    xb = jnp.broadcast_to(x, (128, n))
    dd = DecisionDemodSB.create(wf, SBDemodConfig(
        osf=4, S=16, engine="pallas-fused-interpret"))
    _, (b1, s1, m1, _) = dd.step(dd.init_for(xb), xb)
    st = dd.init_for(xb)
    st, (ba, sa, ma, _) = dd.step(st, xb[:, : n // 2])
    st, (bb, sb, mb, _) = dd.step(st, xb[:, n // 2:])
    one = np.asarray(s1[0])[np.asarray(m1[0])]
    two = np.concatenate([np.asarray(sa[0])[np.asarray(ma[0])],
                          np.asarray(sb[0])[np.asarray(mb[0])]])
    ncmp = min(len(one), len(two))
    # identical except the few block-boundary sub-blocks (bubble timing)
    d = np.abs(one[:ncmp] - two[:ncmp])
    assert np.median(d) < 0.02, np.median(d)


@pytest.mark.parametrize("kind,K", [("cspline", 4), ("linear", 2),
                                    ("lagrange", 4), ("sinc", 15)])
def test_tap_builders_agree_across_engines(kind, K):
    """The closed-form fractional-delay tap formulas exist in two
    deliberately separate forms — the vectorized XLA version
    (models/demod_sb._POLY_TAPS) and the Mosaic-safe unrolled version
    (ops/pallas/demod_sb._taps_rows, which cannot use float iota) — and
    both claim parity with ops/resample.py's LUT builders.  Pin all
    three against each other on a tau grid so an edit to one cannot
    silently desynchronize the engines."""
    from libtsd_tpu.models import demod_sb as MSB
    from libtsd_tpu.ops.pallas import demod_sb as PSB
    from libtsd_tpu.ops import resample as RS
    nph = 256
    taus = np.linspace(0.0, 1.0, 29).astype(np.float32)
    a = np.asarray(MSB._POLY_TAPS[kind](jnp.asarray(taus), nph))  # (n,K)
    b = np.asarray(PSB._taps_rows(kind, jnp.asarray(taus)[None, :],
                                  nph, K))                        # (K,n)
    assert a.shape == (len(taus), K) and b.shape == (K, len(taus))
    assert np.max(np.abs(a - b.T)) < 1e-6, (kind, np.max(np.abs(a - b.T)))
    # and against the design-time LUT builders (the cited originals)
    lut_fn = {"cspline": lambda t: RS.cspline_coefs(t),
              "linear": lambda t: RS.linear_coefs(t),
              "lagrange": lambda t: RS.lagrange_coefs(3, t),
              "sinc": lambda t: RS.sinc_interp_coefs(15, 0.5, t)}[kind]
    for t in (0.0, 0.25, 0.5, 0.75, 1.0):
        tq = round(t * nph) / nph
        ref = np.asarray(lut_fn(tq), np.float32)
        got = np.asarray(MSB._POLY_TAPS[kind](jnp.asarray([t]), nph))[0]
        assert np.max(np.abs(got - ref)) < 1e-6, (kind, t)


def test_forced_pallas_engine_rejects_bad_channel_count():
    """A FORCED Pallas engine must raise, not silently fall back to the
    XLA scan (which would ignore frames_bf16/mf tier and, for the fused
    engine, crash on the incompatible state layout)."""
    wf, bits, x = _qpsk_signal(nsym=200)
    xb = jnp.stack([x] * 4)                     # C=4, not 128-multiple
    for eng in ("pallas-interpret", "pallas-fused-interpret"):
        dd = DecisionDemodSB.create(wf, SBDemodConfig(osf=4, S=16,
                                                      engine=eng))
        with pytest.raises(ValueError, match="multiple of 128"):
            st = (dd.init_for(xb) if not eng.startswith("pallas-fused")
                  else dd.init_for_fused(xb))
            dd.step(st, xb)


def test_fused_engine_block_length_error_message():
    """Non-hop-multiple blocks get an actionable error, not a bare
    assert tuple."""
    wf, bits, x = _qpsk_signal(nsym=600)
    xb = jnp.stack([x] * 128)[:, :1000]         # 1000 % 64 != 0
    dd = DecisionDemodSB.create(wf, SBDemodConfig(
        osf=4, S=16, engine="pallas-fused-interpret"))
    st = dd.init_for(xb)
    with pytest.raises(ValueError, match="whole 64-sample"):
        dd.step(st, xb)


def test_fused_engine_honors_agc_off():
    """agc_active=False must leave the raw MF amplitude untouched on the
    fused path too (the streaming power pre-scale is gated)."""
    wf, bits, x = _qpsk_signal(nsym=600)
    xb = jnp.stack([3.0 * x[:2048]] * 128)      # deliberate 3x gain;
    # 2048 samples -> nsb=32 -> tb=8 (the fused grid wants tb*hop%128==0)
    sy = {}
    for eng in ("xla", "pallas-fused-interpret"):
        dd = DecisionDemodSB.create(wf, SBDemodConfig(
            osf=4, S=16, engine=eng, agc_active=False))
        _, (b, s, m, _) = dd.step(dd.init_for(xb), xb)
        sy[eng] = np.asarray(s)[np.asarray(m)]
    # with AGC off both engines keep the 3x amplitude (RMS ~3, not ~1)
    for eng, s in sy.items():
        assert 2.0 < np.sqrt(np.mean(np.abs(s) ** 2)) < 4.5, (
            eng, np.sqrt(np.mean(np.abs(s) ** 2)))


def test_1d_pointer_underrun_recovers():
    """A pointer driven below the carried-tail depth (sustained negative
    drift) must re-anchor to the nominal grid instead of silently
    interpolating clamped stale samples forever."""
    wf, bits, x = _qpsk_signal(nsym=600)
    dd = DecisionDemodSB.create(wf, SBDemodConfig(osf=4, S=16,
                                                  engine="xla"))
    st = dd.init()
    # poison the pointer far below the tail depth (T = K + 2 + 64)
    st["ptr"] = jnp.asarray(-1000.0, jnp.float32)
    st, (b, s, m, _) = dd.step(st, x[:2048])
    # the re-anchored pointer must be back in a sane range...
    p = float(st["ptr"])
    assert -64.0 <= p <= 2048.0, p
    # ...and a followup block must decode normally again
    st, (b2, s2, m2, _) = dd.step(st, x[2048:4096])
    assert float(jnp.mean(m2.astype(jnp.float32))) > 0.9
