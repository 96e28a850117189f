"""Analog modems: AM (DSB/SSB) and FM modulation/demodulation.

Parity: core/src/telecom/analogique.cc (FM discriminator :18-76, AM
modulator :78-200, AM demod :200-379, FM demod w/ de-emphasis :381-658),
header core/include/tsd/telecom.hpp:1893-1997.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import complex_dtype, real_dtype
from ..ops.signal import cycles
from ..ops.filter_rt import Fir, fir_filter
from ..ops.fir_design import fir_hilbert, fir_lowpass
from ..ops.iir_design import design_lexp
from ..ops.filter_rt import Iir

__all__ = [
    "fm_discriminator", "fm_modulate", "fm_demodulate",
    "AMConfig", "am_modulate", "am_demodulate", "hilbert_analytic",
]


def fm_discriminator(x: jax.Array) -> jax.Array:
    """Polar quadrature discriminator: y[n] = arg(x[n] * conj(x[n-1]))
    (parity: FMDiscri, analogique.cc:18-66 — the reference's final polar
    form)."""
    xm1 = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    return jnp.angle(x * jnp.conj(xm1))


def fm_modulate(audio: jax.Array, deviation: float = 0.1) -> jax.Array:
    """FM: phase = 2*pi*deviation*cumsum(audio) (audio in [-1,1],
    deviation = peak normalized frequency)."""
    ph = 2 * jnp.pi * deviation * jnp.cumsum(audio, axis=-1)
    return jnp.exp(1j * ph).astype(complex_dtype)


def fm_demodulate(x: jax.Array, deviation: float = 0.1,
                  deemph_fc: float = 0.0) -> jax.Array:
    """FM demod: discriminator + optional de-emphasis first-order lowpass
    (parity: FMDemod, analogique.cc:381-658)."""
    y = fm_discriminator(x) / (2 * jnp.pi * deviation)
    if deemph_fc > 0:
        b, a = design_lexp(deemph_fc)
        blk = Iir.create(b, a)
        _, y = blk.step(blk.init_for(y), y)
    return y


def hilbert_analytic(x: jax.Array, ntaps: int = 255) -> jax.Array:
    """Real -> analytic signal via FIR Hilbert + delay compensation
    (parity: HilbertTransformeur, hilbert.cc:27-58)."""
    h = fir_hilbert(ntaps, "hn")
    xi = fir_filter(h, x)
    d = ntaps // 2
    xr = jnp.concatenate([jnp.zeros_like(x[..., :d]), x[..., :-d]], axis=-1)
    return (xr + 1j * xi).astype(complex_dtype)


@dataclasses.dataclass(frozen=True)
class AMConfig:
    """Parity: AMConfig, telecom.hpp:1893-1950."""
    mode: str = "dsb"     # dsb | dsb-sc | usb | lsb
    index: float = 0.5    # modulation index (dsb)
    f_rf: float = 0.25    # carrier frequency (normalized)


def am_modulate(audio: jax.Array, cfg: AMConfig) -> jax.Array:
    """AM modulation (parity: ModulateurAM, analogique.cc:78-200).

    The carrier phase is reduced mod 1 cycle in float64 (signal.cycles)
    before the float32 trig — matching the reference's double-precision
    recursive oscillator (OHC, tsd.cc:583-600) to ~1e-6.  The frequency is
    first quantized to float32 like the reference's OHConfig.freq field
    (its NCO runs double accumulation of a float32-valued frequency)."""
    n = audio.shape[-1]
    cyc = cycles(float(np.float32(cfg.f_rf)), n)
    if cfg.mode == "dsb":
        mx = jnp.max(jnp.abs(audio)) + 1e-30
        env = 1 + cfg.index * audio / mx
        return env * jnp.cos(2 * jnp.pi * cyc)
    if cfg.mode in ("dsb-sc", "dsb_suppressed_carrier"):
        return audio * jnp.cos(2 * jnp.pi * cyc)
    if cfg.mode in ("usb", "lsb"):
        z = hilbert_analytic(audio)
        lo = jnp.exp(2j * jnp.pi * cyc).astype(complex_dtype)
        # Reference formula (analogique.cc:121-126): y = re(z)*re(lo) +
        # signe*im(z)*im(lo) with signe=+1 for USB — i.e. Re(z*conj(lo))
        # for "USB" and Re(z*lo) for "LSB".  NOTE: with the standard
        # positive-frequency analytic signal z = x + i*H[x] (which the
        # reference's own hilbert_transformeur builds, hilbert.cc:27-50),
        # Re(z*conj(lo)) spectrally lands the audio BELOW the carrier —
        # the reference's mode labels are swapped relative to the actual
        # sideband produced.  We reproduce the binary's behavior
        # (golden-diffed in tests/test_golden_ref3.py) and keep its
        # labels.
        if cfg.mode == "usb":
            lo = jnp.conj(lo)
        return jnp.real(z * lo)
    raise ValueError(f"unknown AM mode {cfg.mode!r}")


def am_demodulate(x: jax.Array, cfg: AMConfig,
                  audio_cut: float = 0.1) -> jax.Array:
    """AM demodulation: envelope (dsb) or coherent product detection,
    with audio lowpass (parity: DemodulateurAM, analogique.cc:200-379)."""
    n = x.shape[-1]
    cyc = cycles(float(np.float32(cfg.f_rf)), n)
    h = fir_lowpass(63, audio_cut)
    if cfg.mode == "dsb":
        # envelope detector via analytic signal magnitude
        z = hilbert_analytic(x)
        env = jnp.abs(z)
        y = env - jnp.mean(env)
        return fir_filter(h, y)
    if cfg.mode in ("dsb-sc", "dsb_suppressed_carrier"):
        y = x * 2 * jnp.cos(2 * jnp.pi * cyc)
        return fir_filter(h, y)
    if cfg.mode in ("usb", "lsb"):
        lo = jnp.exp(-2j * jnp.pi * cyc).astype(complex_dtype)
        z = hilbert_analytic(x) * lo
        # real() is insensitive to conjugation — one expression serves
        # both sidebands (the sideband choice happened at modulation)
        y = jnp.real(z)
        return fir_filter(h, y)
    raise ValueError(f"unknown AM mode {cfg.mode!r}")
