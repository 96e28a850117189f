"""Fused Pallas IIR cascade (ops/pallas/iir.py) and fused FM chain
(ops/pallas/fm.py): interpret-mode numerics vs the XLA reference paths.

Hardware results (committed benchmarks): IirFrame 2.53 Gsamp/s,
Pallas single-section ~0.99 Gsamp/s standalone; fused FM chain
76 Gsamp/s input-rate at C=256/262k blocks (~83% of the 9-byte/sample
HBM roofline), composed XLA chain 62 Gsamp/s, on-device agreement 8e-6.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as ss

from libtsd_tpu.ops.iir_design import design_iir, zpk_to_sos
from libtsd_tpu.ops.pallas.iir import IirCascadePallas
from libtsd_tpu.ops.pallas.fm import (FmChainPallas, _atan2_poly,
                                      fir_decim_toeplitz_mats)


def test_iir_cascade_pallas_matches_sosfilt():
    zpk = design_iir(4, "lp", "butterworth", 0.1)
    sos, k = zpk_to_sos(zpk)
    secs = [((sos[s, :3] * (k if s == 0 else 1.0)), sos[s, 3:])
            for s in range(sos.shape[0])]
    casc = IirCascadePallas(secs)
    x = np.random.default_rng(0).standard_normal((3, 128 * 64)).astype(
        np.float32)
    y, st = casc(jnp.asarray(x), tb=16, interpret=True)
    sos_sc = sos.copy()
    sos_sc[0, :3] *= k
    y_ref = ss.sosfilt(sos_sc, x, axis=-1)
    err = np.abs(np.asarray(y) - y_ref).max() / np.abs(y_ref).max()
    assert err < 1e-5, err


def test_iir_cascade_pallas_streaming_state():
    """Two chunks with carried state == one shot, bit-identical."""
    zpk = design_iir(2, "hp", "butterworth", 0.2)
    b, a = zpk.to_ba()
    casc = IirCascadePallas([(np.asarray(b), np.asarray(a))])
    x = np.random.default_rng(1).standard_normal((2, 128 * 32)).astype(
        np.float32)
    y, _ = casc(jnp.asarray(x), tb=8, interpret=True)
    y1, st = casc(jnp.asarray(x[:, :128 * 16]), tb=8, interpret=True)
    y2, _ = casc(jnp.asarray(x[:, 128 * 16:]), st, tb=8, interpret=True)
    ycat = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
    assert np.array_equal(ycat, np.asarray(y))


def test_fir_decim_toeplitz_mats_vs_lfilter():
    L = 128
    rng = np.random.default_rng(1)
    for K, R in ((63, 4), (255, 4), (63, 2), (129, 8)):
        h = rng.standard_normal(K)
        N = L * R * 4
        x = rng.standard_normal(N)
        G, r_max = fir_decim_toeplitz_mats(h, R)
        hist = max(r_max, 1)
        r_min = -(((L - 1) * R) // L)
        xf = np.concatenate([np.zeros((hist, L)), x.reshape(-1, L)])
        rows_out = N // R // L
        y = np.zeros((rows_out, L))
        for q in range(rows_out):
            for j in range(G.shape[0]):
                y[q] += xf[hist + q * R - (j + r_min)] @ G[j]
        y_ref = ss.lfilter(h, [1.0], x)[::R]
        assert np.abs(y.reshape(-1) - y_ref).max() < 1e-5, (K, R)


def test_atan2_poly_accuracy():
    rng = np.random.default_rng(0)
    y = rng.standard_normal(20000).astype(np.float32)
    x = rng.standard_normal(20000).astype(np.float32)
    a = np.asarray(_atan2_poly(jnp.asarray(y), jnp.asarray(x)))
    assert np.abs(a - np.arctan2(y, x)).max() < 1e-6


def test_fm_chain_pallas_matches_composed():
    """Fused kernel == the composed FmReceiver (mix -> FirDecim ->
    discriminator -> de-emphasis) to float32 tolerance, including chunk
    boundaries (FIR history, discriminator edge, IIR carry)."""
    from libtsd_tpu.models.receivers import FmReceiver, FmReceiverConfig
    cfg = FmReceiverConfig(channel_freq=0.25, decim=4, chan_taps=63,
                           deviation=0.1, deemph_fc=0.05)
    rx = FmReceiver.create(cfg)
    N = 4 * 32 * 128 * 2          # two kernel chunks at tb=32
    C = 2
    rng = np.random.default_rng(0)
    audio = 0.4 * np.sin(2 * np.pi * 0.002 * np.arange(N))
    ph = 2 * np.pi * np.cumsum(cfg.deviation / cfg.decim * audio)
    car = np.exp(1j * (2 * np.pi * cfg.channel_freq * np.arange(N) + ph))
    x = np.stack([car, car * np.exp(1j * 0.3)]).astype(np.complex64)
    x += 0.001 * (rng.standard_normal((C, N))
                  + 1j * rng.standard_normal((C, N)))
    _, y_ref = rx.step(rx.init_for(jnp.asarray(x)), jnp.asarray(x))
    fm = FmChainPallas(cfg.channel_freq, cfg.decim, cfg.chan_taps,
                       cfg.deviation, cfg.deemph_fc)
    y = np.asarray(fm(jnp.asarray(x.real), jnp.asarray(x.imag), tb=32,
                      interpret=True))
    d = np.abs(y[:, 4:] - np.asarray(y_ref)[:, 4:])
    assert d.max() < 1e-5, d.max()
