"""Direct numerical diff against the ACTUAL reference binary — round 4b:
PSD estimators, Hilbert one-shots, small streaming runtimes, DSSS, the
deterministic ECP path, binary symbol mapping.  Goldens from
refbuild/golden_gen5.cc (`make -C refbuild golden` regenerates).

REFERENCE DEFECTS found while generating (documented in golden_gen5.cc):
 * FHSSModulation ignores its hop sequence and indexes its oscillator
   vector out of bounds — unusable, no golden possible (our
   fhss_modulate implements the documented hop-sequence semantics);
 * ECPConfig.phase_noise is dead code (never read by ECP::step);
 * hilbert_tfd doubles the DC bin and zeroes Nyquist (vs the textbook
   analytic transform) — we pin the binary's convention.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def g(name):
    return np.load(os.path.join(GOLD, name + ".npy"))


# ------------------------------------------------------------- PSD

def test_psd_correlogram_matches_reference():
    from libtsd_tpu.ops.psd import psd
    xc = jnp.asarray(g("g5_psd_xc"))
    _, S = psd(xc)
    ref = g("g5_psd_c")
    # compare above the noise floor: at spectral nulls (-90 dB) the last
    # float32 bit of the periodogram flips whole dB
    m = ref > ref.max() - 60
    assert m.sum() > 200
    assert np.abs(np.asarray(S)[m] - ref[m]).max() < 2e-2   # dB
    # real input: the reference returns the positive half of the rfft
    # periodogram (fourier.hpp:741-760)
    from libtsd_tpu.ops.fft import rfft
    from libtsd_tpu.ops.window import window as mkwin
    xr = jnp.asarray(g("g5_psd_xr"))
    n = xr.shape[-1]
    w = jnp.asarray(mkwin("hn", n, sym=False), jnp.float32)
    Y = 10 * jnp.log10(jnp.abs(rfft(xr * w)) ** 2 + 1e-30)
    refr = g("g5_psd_r")
    half = np.asarray(Y)[: len(refr)]
    mr = refr > refr.max() - 60
    assert mr.sum() > 15
    assert np.abs(half[mr] - refr[mr]).max() < 2e-2


def test_psd_welch_matches_reference():
    from libtsd_tpu.ops.psd import psd_welch
    x = jnp.asarray(g("g5_welch_x"))
    _, S = psd_welch(x, 128, "hn")
    ref = g("g5_welch")
    m = ref > ref.max() - 60
    assert m.sum() > 15
    d = np.abs(np.asarray(S)[m] - ref[m])
    assert d.max() < 5e-2, d.max()    # dB (float32 sum accumulation)


# ----------------------------------------------------------- Hilbert

def test_hilbert_oneshots_match_reference():
    from libtsd_tpu.models.analog import hilbert_analytic, hilbert_tfd
    x = jnp.asarray(g("g5_hilb_x"))
    z = np.asarray(hilbert_analytic(x, 127))
    ref = g("g5_hilb_fir")
    assert np.abs(z - ref).max() < 1e-4
    z2 = np.asarray(hilbert_tfd(x))
    ref2 = g("g5_hilb_tfd")
    assert np.abs(z2 - ref2).max() < 1e-4


# ---------------------------------------------- streaming runtimes

def test_small_runtimes_match_reference():
    from libtsd_tpu.ops.filter_rt import MovingAverage, DcBlocker, DelayLine
    x = jnp.asarray(g("g5_rt_x"))
    mg = MovingAverage(K=8)
    _, y = mg.step(mg.init(), x)
    assert np.abs(np.asarray(y) - g("g5_rt_mg")).max() < 1e-3
    dc = DcBlocker.create(0.02)
    _, y = dc.step(dc.init(), x)
    assert np.abs(np.asarray(y) - g("g5_rt_dc")).max() < 1e-3
    dl = DelayLine(d=5)
    _, y = dl.step(dl.init(), x)
    assert np.array_equal(np.asarray(y), g("g5_rt_delay"))


# -------------------------------------------------------------- DSSS

def test_dsss_matches_reference():
    from libtsd_tpu.models.spread import dsss_modulate
    x = jnp.asarray(g("g5_dsss_x"))
    chips = jnp.asarray(g("g5_dsss_chips"))
    y = dsss_modulate(x, chips, osf_in=int(chips.shape[0]))
    ref = g("g5_dsss_y")
    assert np.abs(np.asarray(y) - ref).max() < 1e-6


# --------------------------------------------------------------- ECP

def test_ecp_deterministic_path_matches_reference():
    from libtsd_tpu.models.channel import ChannelConfig, propagation_channel
    x = jnp.asarray(g("g5_ecp_x"))
    cfg = ChannelConfig(fe=1.0, fsymb=0.25, fbit=0.25, Eb_N0=200.0,
                        freq_offset=0.01, phase_offset=0.7,
                        clock_delay=0.0)
    y = propagation_channel(jax.random.PRNGKey(0), x, cfg)
    ref = g("g5_ecp_y")
    # the mandatory AWGN draw differs (different RNG) but sigma ~ 1e-10
    assert np.abs(np.asarray(y) - ref).max() < 1e-4


# ---------------------------------------------------- symbol mapping

@pytest.mark.parametrize("k", [1, 2, 4])
def test_symbol_mapping_matches_reference(k):
    from libtsd_tpu.models.waveform import (bits_to_symbol_indices,
                                            symbol_indices_to_bits)
    bits = jnp.asarray(g("g5_map_bits"), jnp.int32)
    idx = bits_to_symbol_indices(bits, k)
    ref_idx = g(f"g5_map_k{k}")
    assert np.array_equal(np.asarray(idx)[: len(ref_idx)], ref_idx), k
    back = symbol_indices_to_bits(jnp.asarray(ref_idx, jnp.int32), k)
    ref_back = g(f"g5_demap_k{k}")
    assert np.array_equal(np.asarray(back)[: len(ref_back)], ref_back), k
