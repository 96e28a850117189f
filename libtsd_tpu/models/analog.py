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
    "hilbert_tfd",
    "fm_broadcast_mono", "fm_broadcast_demodulate", "fm_broadcast_debug",
    "fm_broadcast_multiplex", "fm_pilot_unit",
]


def fm_discriminator(x: jax.Array, prev=None) -> jax.Array:
    """Polar quadrature discriminator: y[n] = arg(x[n] * conj(x[n-1]))
    (parity: FMDiscri, analogique.cc:18-66 — the reference's final polar
    form).  Delegates to models.demod.quadrature_discriminator (one copy
    of the primitive); ``prev`` enables streaming continuation."""
    from .demod import quadrature_discriminator
    return quadrature_discriminator(x, prev)


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


def hilbert_tfd(x: jax.Array) -> jax.Array:
    """Analytic signal by DFT masking, EXACTLY the reference's convention
    (hilbert_tfd, hilbert.cc:59-70): zero bins n/2..n-1 then ifft(2*X).
    NOTE this doubles DC as well (and drops Nyquist entirely) — the
    textbook analytic transform keeps DC/Nyquist at unit weight; we pin
    the binary's behavior (golden-diffed in tests/test_golden_ref5.py)."""
    n = x.shape[-1]
    X = jnp.fft.fft(x.astype(complex_dtype), axis=-1)
    mask = jnp.asarray(np.r_[np.ones(n // 2), np.zeros(n - n // 2)],
                       real_dtype)
    return jnp.fft.ifft(2.0 * X * mask, axis=-1).astype(complex_dtype)


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


# ------------------------------------------------ broadcast FM (stereo)

def _fm_broadcast_front(x: jax.Array, fe: float):
    """Shared front half of the broadcast FM receiver (parity: FMDemod,
    analogique.cc:460-478, 515-527): wideband raised-cosine channel FIR
    (+-100 kHz) -> polar quadrature discriminator scaled by the
    reference's 1/75 kHz excursion factor -> post-discriminator lowpass
    (65 kHz) -> decimation R = floor(fe / 130 kHz) to the multiplex rate
    fech2 = fe / R.  Returns (mpx, fech2, R)."""
    from ..ops.fir_design import raised_cosine
    from ..ops.signal import downsample
    h_wb = raised_cosine(255, 0.2, 100e3 / fe)
    y1 = fir_filter(h_wb, x)
    a = fm_discriminator(y1) / 75e3          # reference scale factor
    h_fm = raised_cosine(255, 0.1, 65e3 / fe)
    a2 = fir_filter(h_fm, a)
    R = max(int(np.floor(fe / (65e3 * 2))), 1)
    a3 = downsample(a2, R) if R > 1 else a2
    return a3, fe / R, R


def fm_broadcast_mono(x: jax.Array, fe: float) -> jax.Array:
    """Mono (L+R) audio from a broadcast FM IF signal — the deterministic
    half of the reference's FMDemod chain (analogique.cc:460-478,
    515-527, 583): front end + 15 kHz audio lowpass.

    Golden-diffed against the reference binary running the SAME
    sub-component calls (design_rif_cs / discriminateur_fm / sousech) in
    tests/test_golden_ref4.py.  The reference's own FMDemod::step is not
    diffable end to end: its stereo pilot PLL is configured from an
    UNINITIALIZED RPLLConfig.freq (telecom.hpp:1682 has no default
    member initializer and analogique.cc:497-500 never sets it — UB), a
    documented reference defect; see fm_broadcast_demodulate for this
    framework's working stereo path."""
    from ..ops.fir_design import raised_cosine
    a3, fech2, _ = _fm_broadcast_front(x, fe)
    h_audio = raised_cosine(255, 0.1, 15e3 / fech2)
    return fir_filter(h_audio, a3)


def fm_pilot_unit(a3: jax.Array, fech2: float) -> jax.Array:
    """Recover the 19 kHz stereo pilot from a broadcast FM multiplex and
    return it as a UNIT-magnitude analytic signal e^{i(2*pi*19k*t + phi)}.

    This is the coherent reference for BOTH subcarriers of the multiplex:
    its square is the 38 kHz L-R carrier (fm_broadcast_demodulate) and its
    cube the 57 kHz RDS carrier (models/rds.py).  Pilot tracking = exact
    downconversion to DC, 500 Hz lowpass, complex PLL; the loop phase
    theta = arg(xb * conj(pll_out)) is re-applied because the CPLL output
    itself is derotated to zero phase by construction."""
    from ..ops.fir_design import raised_cosine
    from .carrier_rec import Cpll, CpllConfig
    f19 = 19e3 / fech2
    n = a3.shape[-1]
    lo = jnp.exp(-2j * jnp.pi * cycles(f19, n)).astype(complex_dtype)
    h_bb = raised_cosine(127, 0.1, (500.0 / fech2) / 2)
    xb = fir_filter(h_bb, a3.astype(complex_dtype) * lo)
    cpll = Cpll(cfg=CpllConfig(ped="tloop", M=1, order=2,
                               BL=250.0 / fech2))
    _, x3 = cpll.step(cpll.init(), xb)
    rot = xb * jnp.conj(x3)
    # RELATIVE magnitude floor: |rot| = |xb|^2 scales with the SQUARE of
    # the (already tiny — the discriminator leaves the multiplex at
    # m*2pi/fe) pilot amplitude, ~1e-13 at fe ~ 1 MHz.  An absolute
    # 1e-12 floor silently disabled the unit normalization there, which
    # collapsed the regenerated 38 kHz subcarrier (and with it the
    # stereo separation) at high front-end rates — found by the
    # fm_broadcast_debug pilot-magnitude check.
    mag = jnp.abs(rot)
    floor = 1e-3 * jnp.max(mag) + 1e-30
    zu = rot / jnp.maximum(mag, floor)            # e^{i theta_loop}
    return zu * jnp.conj(lo)            # unit analytic 19 kHz pilot


def fm_broadcast_demodulate(x: jax.Array, fe: float
                            ) -> Tuple[jax.Array, jax.Array]:
    """Full broadcast FM STEREO receiver -> (L, R) audio.

    Structure parity: FMDemod (analogique.cc:381-658) minus the RDS
    side-channel (whose decode is dead code in the reference — the
    syndrome error count is never accumulated, analogique.cc:545-560):
    mono L+R from the 0-15 kHz band; the 19 kHz pilot tracked by a
    complex PLL after exact downconversion; the UNIT-normalized analytic
    pilot squared regenerates the coherent 38 kHz subcarrier that
    demodulates the L-R DSB band; L = (L+R) + (L-R), R = (L+R) - (L-R).

    DOCUMENTED IMPROVEMENTS over the reference's stereo path (which is
    unusable as shipped): (a) its pilot RPLL reads an UNINITIALIZED
    RPLLConfig.freq (telecom.hpp:1682, analogique.cc:497-500 — UB);
    (b) it squares the RAW recovered pilot, so the L-R product scales
    with the SQUARE of the (tiny) pilot amplitude — we normalize to a
    unit subcarrier; (c) the baseband-filter group delay at 19 kHz
    phase-shifts the regenerated subcarrier (the reference's own TODO,
    analogique.cc:587-589) — we compensate the known linear phase."""
    L, R, _ = fm_broadcast_debug(x, fe)
    return L, R


def fm_broadcast_multiplex(audio_l: jax.Array, audio_r: jax.Array,
                           fe: float, pilot_level: float = 0.1,
                           rds: Optional[jax.Array] = None
                           ) -> jax.Array:
    """Build a broadcast FM stereo IF signal (test/bench source): the
    standard multiplex m = 0.5(L+R) + pilot*cos(2 pi 19k t) +
    0.5(L-R)cos(2 pi 38k t) [+ rds], FM-modulated at 75 kHz excursion.

    ``rds``: an optional pre-built 57 kHz RDS component at rate fe
    (models/rds.rds_subcarrier — phase-locked to the same pilot)."""
    n = audio_l.shape[-1]
    c19 = jnp.cos(2 * jnp.pi * cycles(19e3 / fe, n))
    c38 = jnp.cos(2 * jnp.pi * cycles(38e3 / fe, n))
    m = (0.5 * (audio_l + audio_r) + pilot_level * c19
         + 0.5 * (audio_l - audio_r) * c38)
    if rds is not None:
        m = m + rds
    ph = 2 * jnp.pi * (75e3 / fe) * jnp.cumsum(m, axis=-1)
    return jnp.exp(1j * ph).astype(complex_dtype)


def fm_broadcast_debug(x: jax.Array, fe: float):
    """``fm_broadcast_demodulate`` + named per-stage intermediates
    (parity: the reference's debug_actif observability — FMDemod plots
    its discriminator/multiplex/pilot stages when enabled).  Returns
    (L, R, debug) where debug maps stage names to signals at their
    native rates: ``mpx`` (demodulated multiplex at fech2), ``pilot``
    (unit analytic 19 kHz), ``sub38`` (regenerated L-R subcarrier),
    ``lpr`` / ``lmr`` (the two audio-band components).  Render with
    viz.debug.debug_report."""
    from ..ops.fir_design import raised_cosine
    a3, fech2, _ = _fm_broadcast_front(x, fe)
    h_audio = raised_cosine(255, 0.1, 15e3 / fech2)
    x_lpr = fir_filter(h_audio, a3)
    z19 = fm_pilot_unit(a3, fech2)
    sub38 = jnp.real(z19 * z19)
    x_lmr = fir_filter(h_audio, a3 * 2.0 * sub38)
    dbg = dict(mpx=a3, pilot=z19, sub38=sub38, lpr=x_lpr, lmr=x_lmr,
               fech2=jnp.full((16,), fech2, real_dtype))
    return x_lpr + x_lmr, x_lpr - x_lmr, dbg
