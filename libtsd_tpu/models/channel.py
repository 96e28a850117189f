"""Channel models: AWGN, propagation emulator (ECP), dispersive fading,
thermal noise (parity: core/src/telecom/telecom.cc:176-192,
ecp.cc:10-115, simulation.cc:22-168, limits.cc:7).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import complex_dtype, real_dtype
from ..ops.fft import delay_signal
from ..ops.signal import cycles

__all__ = [
    "awgn_noise", "awgn", "ChannelConfig", "propagation_channel",
    "doppler_psd", "dispersive_channel", "thermal_noise_power",
    "shannon_capacity",
]


def awgn_noise(key, x: jax.Array, sigma: float) -> jax.Array:
    """x + sigma*randn per real dimension (parity: bruit_awgn,
    telecom.cc:176-188)."""
    if jnp.iscomplexobj(x):
        k1, k2 = jax.random.split(key)
        nr = jax.random.normal(k1, x.shape, real_dtype)
        ni = jax.random.normal(k2, x.shape, real_dtype)
        return x + sigma * (nr + 1j * ni).astype(complex_dtype)
    return x + sigma * jax.random.normal(key, x.shape, real_dtype)


def awgn(key, x: jax.Array, EbN0_db: float, osf: float = 1.0,
         k_bits: float = 1.0) -> jax.Array:
    """Add noise for a target Eb/N0 given oversampling and bits/symbol.

    sigma = level * sqrt(0.5 * (fe/fbit) / EbN0_lin) with fe/fbit =
    osf / k_bits (parity: ECP::step noise calc, ecp.cc:44-62).
    """
    level = jnp.sqrt(jnp.mean(jnp.abs(x) ** 2))
    ebn0 = 10.0 ** (jnp.asarray(EbN0_db) / 10.0)
    sigma = level * jnp.sqrt(0.5 * (osf / k_bits) / ebn0)
    return awgn_noise(key, x, sigma)


@dataclasses.dataclass(frozen=True)
class ChannelConfig:
    """Propagation-channel emulator config (parity: ECPConfig,
    telecom.hpp)."""
    fe: float = 1.0
    fsymb: float = 0.25
    fbit: float = 0.25
    Eb_N0: float = 20.0
    freq_offset: float = 0.0      # décalage_fréquence (Hz)
    phase_offset: float = 0.0     # décalage_phase (rad)
    phase_noise_db_hz: float = -np.inf  # phase noise level
    clock_delay: float = 0.0      # délais_horloge (samples; <0 = random)


def propagation_channel(key, x: jax.Array, cfg: ChannelConfig) -> jax.Array:
    """Impairment chain: freq/phase offset -> phase noise -> AWGN -> clock
    delay (parity: ECP::step, ecp.cc:27-105)."""
    n = x.shape[-1]
    k1, k2, k3 = jax.random.split(key, 3)
    y = x
    # frequency + phase offset (phase ramp reduced mod 1 cycle — an
    # unreduced float32 ramp loses accuracy past k ~ 1e5)
    f = cfg.freq_offset / cfg.fe
    if f != 0.0 or cfg.phase_offset != 0.0:
        cyc = cycles(f, n)
        y = y * jnp.exp(1j * (cfg.phase_offset + 2 * jnp.pi * cyc)
                        ).astype(complex_dtype)
    # phase noise (random walk scaled from dBc/Hz)
    if np.isfinite(cfg.phase_noise_db_hz):
        pn_var = 10.0 ** (cfg.phase_noise_db_hz / 10.0) * cfg.fe
        dphi = jnp.sqrt(pn_var) * jax.random.normal(k2, (n,), real_dtype)
        y = y * jnp.exp(1j * jnp.cumsum(dphi)).astype(complex_dtype)
    # AWGN at Eb/N0
    y = awgn(k1, y, cfg.Eb_N0, osf=cfg.fe / cfg.fbit)
    # clock delay; negative config = randomized per call (kept traced so
    # the whole impairment chain stays jittable)
    d = cfg.clock_delay
    if d < 0:
        y = delay_signal(y, jax.random.randint(
            k3, (), 0, int(cfg.fe / cfg.fsymb)).astype(real_dtype))
    elif d:
        y = delay_signal(y, float(d))
    return y


def doppler_psd(f: jax.Array, fd: float) -> jax.Array:
    """Classic Jakes Doppler spectrum (parity: doppler_distri,
    simulation.cc:22-42)."""
    f = jnp.asarray(f, real_dtype)
    r = jnp.where(jnp.abs(f) < fd,
                  1.0 / (jnp.pi * fd * jnp.sqrt(
                      jnp.maximum(1e-12, 1 - (f / fd) ** 2))),
                  0.0)
    return r


def dispersive_channel(key, x: jax.Array, fd: float, fe: float = 1.0,
                       rice_factor: float = 0.0) -> jax.Array:
    """Flat Rayleigh/Rice fading with Jakes-shaped Doppler (parity:
    CanalDispersif, simulation.cc:44-140: white Gaussian process filtered to
    the Doppler PSD, optional LOS term).

    rice_factor K: 0 = Rayleigh; K>0 adds a unit LOS path with power ratio K.
    """
    n = x.shape[-1]
    k1, k2 = jax.random.split(key)
    # frequency-domain shaping of complex white noise
    g = (jax.random.normal(k1, (n,), real_dtype)
         + 1j * jax.random.normal(k2, (n,), real_dtype)) / np.sqrt(2)
    freqs = jnp.fft.fftfreq(n) * fe
    shape = jnp.sqrt(doppler_psd(freqs, max(fd, fe / n)))
    fad = jnp.fft.ifft(jnp.fft.fft(g) * shape)
    fad = fad / jnp.sqrt(jnp.mean(jnp.abs(fad) ** 2) + 1e-30)
    if rice_factor > 0:
        K = rice_factor
        fad = (np.sqrt(K / (K + 1)) + fad * np.sqrt(1 / (K + 1)))
    return x * fad.astype(complex_dtype)


def thermal_noise_power(bandwidth_hz: float, temp_k: float = 290.0) -> float:
    """Thermal noise power in Watts = k_B * T * B (parity:
    simulation.cc:141+)."""
    kb = 1.380649e-23
    return kb * temp_k * bandwidth_hz


def shannon_capacity(snr_db: float, bandwidth_hz: float = 1.0) -> float:
    """C = B log2(1 + SNR) (parity: limits.cc:7)."""
    return bandwidth_hz * float(np.log2(1 + 10 ** (snr_db / 10.0)))
