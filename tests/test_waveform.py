"""Waveform/modulator/channel tests, incl. the first end-to-end loop:
bits -> mod -> AWGN -> matched filter -> decision -> BER vs theory
(mirrors the reference's statistical test strategy, SURVEY §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libtsd_tpu.models import waveform as WF
from libtsd_tpu.models import channel as CH
from libtsd_tpu.models import snr as SNR
from libtsd_tpu.models import ber as BER
from libtsd_tpu.models.bitstream import randbits
from libtsd_tpu.models.modulator import ModConfig, Modulator


def test_bits_symbols_roundtrip():
    key = jax.random.PRNGKey(0)
    bits = randbits(key, 96)
    for k in [1, 2, 4]:
        idx = WF.bits_to_symbol_indices(bits, k)
        b2 = WF.symbol_indices_to_bits(idx, k)
        assert np.array_equal(np.asarray(bits), np.asarray(b2)[:96])


def test_diff_encode_decode():
    idx = jnp.asarray([0, 1, 3, 2, 1, 0])
    enc = WF.diff_encode(idx, 4)
    dec = WF.diff_decode(enc, 4)
    assert np.array_equal(np.asarray(dec), np.asarray(idx))


@pytest.mark.parametrize("name,M", [("bpsk", 2), ("qpsk", 4), ("psk", 8),
                                    ("qam", 16), ("ask", 2)])
def test_waveform_decode_clean(name, M):
    wf = WF.make_waveform(name, M=M)
    key = jax.random.PRNGKey(1)
    bits = randbits(key, 120 * wf.info.k)
    s = wf.make_symbols(bits)
    b2 = wf.decode_symbols(s)
    assert np.array_equal(np.asarray(bits), np.asarray(b2)[: len(bits)])


def test_pi4_qpsk_rotates():
    wf = WF.wf_pi4_qpsk()
    bits = randbits(jax.random.PRNGKey(2), 40)
    s = np.asarray(wf.make_symbols(bits))
    # even symbols on the base constellation, odd on the rotated one
    base = np.asarray(wf.symbols)
    for i, v in enumerate(s):
        const = base * (np.exp(1j * np.pi / 4) if i % 2 else 1.0)
        assert np.min(np.abs(const - v)) < 1e-5
    # decode recovers bits
    b2 = wf.decode_symbols(jnp.asarray(s))
    assert np.array_equal(np.asarray(bits), np.asarray(b2)[: len(bits)])


def test_qam16_constellation():
    wf = WF.wf_qam(16)
    c = np.asarray(wf.constellation())
    assert len(c) == 16
    vals = sorted(set(np.round(c.real, 6)))
    assert np.allclose(vals, [-1, -1 / 3, 1 / 3, 1])


def test_ber_curves_sane():
    # BPSK theoretical BER at 10 dB ~ 3.9e-6 (0.5 erfc(sqrt(10)))
    wf = WF.wf_bpsk()
    from scipy.special import erfc
    b = float(wf.ber(10.0))
    assert abs(b - 0.5 * erfc(np.sqrt(10.0))) < 1e-8
    # QPSK == BPSK per-bit
    wq = WF.wf_qpsk()
    assert abs(float(wq.ber(8.0)) - 0.5 * erfc(np.sqrt(10 ** 0.8))) < 1e-6
    # 16QAM worse than QPSK at same EbN0
    assert float(WF.wf_qam(16).ber(8.0)) > float(wq.ber(8.0))


def test_pulse_shape_coefs():
    ps = WF.PulseShape.rcs(0.25)
    h = ps.get_coefs(0, 8)
    assert len(h) == 41  # 5*osf+1
    assert abs(np.sum(h) - 1.0) < 1e-6
    ps2 = WF.PulseShape.nrz()
    assert np.allclose(ps2.get_coefs(0, 4), np.ones(4) / 4)


def test_modulator_power_normalization():
    # shaping filter is energy normalized: output power == input symbol power
    wf = WF.wf_qpsk(WF.PulseShape.rcs(0.25))
    cfg = ModConfig(wf=wf, fe=8.0, fsymb=1.0)
    mod = Modulator.create(cfg)
    bits = randbits(jax.random.PRNGKey(3), 2 * 512)
    y, delay = mod.modulate(bits)
    p = float(jnp.mean(jnp.abs(y) ** 2))
    assert abs(p - 1.0) < 0.1
    assert delay > 0


def test_modulator_if_upconversion():
    wf = WF.wf_bpsk(WF.PulseShape.nrz())
    cfg = ModConfig(wf=wf, fe=8.0, fi=2.0, fsymb=1.0)
    mod = Modulator.create(cfg)
    bits = jnp.ones(64, jnp.int8)
    y, _ = mod.modulate(bits)
    # all-ones BPSK at IF=fe/4: spectrum peak at f=0.25
    from libtsd_tpu.ops.psd import freq_estim
    f = float(freq_estim(y, "fft"))
    assert abs(abs(f) - 0.25) < 0.02


def test_awgn_snr():
    key = jax.random.PRNGKey(4)
    x = jnp.exp(1j * 2 * jnp.pi * 0.05 * jnp.arange(20000)).astype(jnp.complex64)
    y = CH.awgn(key, x, 10.0, osf=1.0)
    noise = y - x
    snr = 10 * np.log10(float(jnp.mean(jnp.abs(x) ** 2))
                        / float(jnp.mean(jnp.abs(noise) ** 2)))
    # Eb/N0 10 dB with osf=1,k=1 -> SNR = EbN0 = 10 dB
    assert abs(snr - 10.0) < 0.3


def test_snr_matzner():
    key = jax.random.PRNGKey(5)
    bits = randbits(key, 50000)
    wf = WF.wf_qpsk()
    s = wf.make_symbols(bits)
    y = CH.awgn(jax.random.PRNGKey(6), s, 10.0, k_bits=2.0)
    S, N = SNR.snr_matzner(y)
    est = 10 * np.log10(float(S) / float(N))
    # true SNR = EbN0 + 10log10(k) = 13 dB
    assert abs(est - 13.0) < 1.0


def test_cmp_bits_alignment():
    key = jax.random.PRNGKey(7)
    tx = randbits(key, 1000)
    rx = jnp.concatenate([randbits(jax.random.PRNGKey(8), 17), tx])
    b, errs, lag = BER.cmp_bits(tx, rx)
    assert errs <= 2 and lag == -17


def test_end_to_end_qpsk_awgn_ber():
    """TX -> AWGN -> matched filter -> symbol decimation -> decisions."""
    key = jax.random.PRNGKey(9)
    wf = WF.wf_qpsk(WF.PulseShape.rcs(0.25))
    osf = 4
    cfg = ModConfig(wf=wf, fe=float(osf), fsymb=1.0)
    mod = Modulator.create(cfg)
    nbits = 2 * 4000
    bits = randbits(key, nbits)
    x, delay = mod.modulate(bits)

    EbN0 = 6.0
    y = CH.awgn(jax.random.PRNGKey(10), x, EbN0, osf=osf, k_bits=wf.info.k)

    # matched filter + decimate at the optimum instants
    mf = wf.shaping.matched_filter(0, osf)
    _, z = mf.step(mf.init_for(y), y)
    # total delay = shaping delay + matched filter delay
    d_total = int(round(delay + mf.delay))
    sym = z[d_total::osf][: nbits // 2]
    # amplitude normalize
    sym = sym / jnp.sqrt(jnp.mean(jnp.abs(sym) ** 2))
    rx_bits = wf.decode_symbols(sym)
    ber, errs, lag = BER.cmp_bits(bits, rx_bits, max_lag=4)
    th = float(wf.ber(EbN0))
    # statistical agreement with theory (~2.4e-3 at 6 dB): within 3x
    assert ber < th * 3 + 1e-3, (ber, th)
    assert ber > 0  # noise high enough that some errors occur


def test_pi4_qpsk_streaming_modulator_parity_carries():
    """REGRESSION: Modulator.step restarted the pi/4-QPSK rotation
    parity at even on every block — a stream modulated in blocks with
    odd symbol counts came out pi/4 off from the second block onward
    (one-shot != streaming).  The parity now rides the modulator
    state."""
    import numpy as np
    from libtsd_tpu.models.modulator import ModConfig, Modulator
    wf = WF.wf_pi4_qpsk(WF.PulseShape.rcs(0.35))
    mod = Modulator.create(ModConfig(wf=wf, fe=4.0, fsymb=1.0))
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, 2 * 31).astype(np.int8))
    # one shot
    st = mod.init()
    st, y1 = mod.step(st, bits)
    _, yf = mod.flush(st)
    one = np.concatenate([np.asarray(y1), np.asarray(yf)])
    # streamed in 3 blocks with ODD symbol counts (14, 22, 26 bits ->
    # 7, 11, 13 symbols)
    st = mod.init()
    outs = []
    for a, b in ((0, 14), (14, 36), (36, 62)):
        st, y = mod.step(st, bits[a:b])
        outs.append(np.asarray(y))
    _, yf = mod.flush(st)
    outs.append(np.asarray(yf))
    two = np.concatenate(outs)
    assert np.max(np.abs(one - two)) < 1e-6
