"""Resampling: polyphase interpolation/decimation, half-band, CIC,
fractional-delay interpolators, rational-ratio rate adaptation.

Parity: core/src/reechan/ (polyphase.cc, cic.cc, itrp.cc, ra.cc, hb.cc).

TPU design notes:
* The polyphase upsampler is a single MXU matmul: window matrix (n, Kp) x
  phase-tap matrix (Kp, R) -> (n, R) -> interleave.  No per-sample loop
  (reference: FiltreRIFUps, polyphase.cc:247-343).
* The arbitrary-ratio adapter reformulates the reference's per-sample phase
  accumulator (AdaptationRythmeSimple, ra.cc:14-80) as a *rational* resampler
  p/q with static output shapes: output j interpolates input time j*q/p,
  computed vectorized (gather + LUT dot), jit-able and shardable.  Arbitrary
  float ratios are approximated by a fraction to < 1e-9 relative error.
* CIC runs on int32 with two's-complement wraparound — overflow-exact, the
  classic CIC property (reference uses C++ ints, cic.cc:12-101).
"""
from __future__ import annotations

import fractions
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..block import Block
from ..config import complex_dtype, real_dtype
from .filter_rt import Fir, FirDecim
from .fir_design import fir_design_windowed, fir_halfband

__all__ = [
    "polyphase_form", "ipolyphase_form",
    "FirUps", "fir_ups_delay", "HalfbandDecim", "CicConfig", "Cic",
    "cic_design_ba", "cic_freq", "cic_bits", "cic_bit_growth",
    "cic_comp_design",
    "sinc_interp_lut", "cspline_coefs", "cspline_lut", "linear_coefs",
    "lagrange_coefs", "Interpolator", "make_interpolator",
    "RationalResampler", "resample", "Resampler", "interp_irregular",
]


def polyphase_form(x: jax.Array, M: int) -> jax.Array:
    """Signal -> (M, n/M) polyphase matrix, row p = x[p::M] (parity:
    forme_polyphase, core/include/tsd/filtrage.hpp:1225-1254)."""
    n = (x.shape[-1] // M) * M
    return x[..., :n].reshape(*x.shape[:-1], n // M, M).swapaxes(-1, -2)


def ipolyphase_form(X: jax.Array) -> jax.Array:
    """Inverse of polyphase_form (parity: iforme_polyphase)."""
    return X.swapaxes(-1, -2).reshape(*X.shape[:-2], -1)


# ----------------------------------------------------------- upsampling

class FirUps(Block):
    """Polyphase upsampling FIR: insert R-1 zeros + anti-image filter, taps
    scaled by R to preserve amplitude (parity: FiltreRIFUps,
    polyphase.cc:247-343).

    y[n*R + r] = sum_j h[(n-j)*R + r] * x[j] — per-phase FIR via one matmul.
    """

    Hm: jax.Array   # (Kp, R) phase-tap matrix, Hm[i, r] = hR[i*R + r]
    K: int = struct.field(pytree_node=False)    # padded tap count
    R: int = struct.field(pytree_node=False)
    K0: int = struct.field(pytree_node=False, default=0)  # original tap count

    @classmethod
    def create(cls, h, R: int) -> "FirUps":
        h = np.asarray(h, np.float64) * R
        K0 = len(h)
        K = K0
        if K % R:
            h = np.concatenate([h, np.zeros(R - K % R)])
            K = len(h)
        Kp = K // R
        Hm = h.reshape(Kp, R)
        return cls(Hm=jnp.asarray(np.asarray(Hm, np.float32)), K=K, R=R, K0=K0)

    def init(self):
        return jnp.zeros((self.Hm.shape[0] - 1,), real_dtype)

    def init_for(self, x):
        dt = complex_dtype if jnp.iscomplexobj(x) else real_dtype
        return jnp.zeros(x.shape[:-1] + (self.Hm.shape[0] - 1,), dt)

    @property
    def ratio(self) -> float:
        return float(self.R)

    @property
    def delay(self) -> float:
        # group delay in output samples.  NOTE: differs from the reference's
        # filtre_rif_ups_délais (+pad, polyphase.cc:363-372) because this
        # implementation's polyphase convention y[nR+r] = sum_j h[(n-j)R+r]x[j]
        # appends the padding zeros at the END of the taps, which does not
        # shift the peak: delay = (K_orig - 1)/2.
        return (self.K0 - 1) / 2.0

    def step(self, state, x):
        n = x.shape[-1]
        Kp = self.Hm.shape[0]
        xx = jnp.concatenate([state, x], axis=-1)  # (..., n + Kp - 1)
        # Gather-free polyphase: y[mR + r] = sum_i x[m - i] Hm[i, r].
        # Kp static shifted slices + MACs instead of the (n, Kp)
        # advanced-index window (an element-rate gather on TPU — the
        # same pattern whose removal sped the channelizer 270x)
        def branch(xr):
            acc = None
            for i in range(Kp):
                sl = jax.lax.slice_in_dim(xr, Kp - 1 - i, Kp - 1 - i + n,
                                          axis=-1)
                t = sl[..., :, None] * self.Hm[i][None, :]
                acc = t if acc is None else acc + t
            return acc                       # (..., n, R)

        if jnp.iscomplexobj(xx):
            Y = (branch(jnp.real(xx).astype(real_dtype))
                 + 1j * branch(jnp.imag(xx).astype(real_dtype))
                 ).astype(complex_dtype)
        else:
            Y = branch(xx)
        y = Y.reshape(*x.shape[:-1], n * self.R)
        # shape-based slice: -(Kp-1) would be -0 for Kp == 1 and return
        # the WHOLE buffer (state growing every step; scan carry crash)
        return xx[..., xx.shape[-1] - (Kp - 1):], y


def fir_ups_delay(nc: int, R: int) -> float:
    """Group delay (in output samples) of FirUps (parity concept:
    filtre_rif_ups_délais, polyphase.cc:363-372 — but NOT its formula:
    the reference front-pads its taps to a multiple of R, shifting the
    peak by the pad; this implementation end-pads, so the delay is just
    (nc-1)/2 regardless of R.  Verified by the impulse-peak
    delay-convention test)."""
    del R
    return (nc - 1) / 2.0


class HalfbandDecim(Block):
    """Decimate-by-2 with a half-band FIR (zeros at odd taps) — thin wrapper
    over the polyphase decimator (parity: FiltreRIFDemiBande,
    polyphase.cc:55-155; on the MXU the dense matmul is already optimal,
    the zero-tap trick buys nothing)."""

    inner: FirDecim

    @classmethod
    def create(cls, h=None, n: int = 31) -> "HalfbandDecim":
        if h is None:
            h = fir_halfband(n)
        return cls(inner=FirDecim.create(h, 2))

    def init(self):
        return self.inner.init()

    def init_for(self, x):
        return self.inner.init_for(x)

    @property
    def ratio(self):
        return 0.5

    @property
    def delay(self):
        return self.inner.delay

    def step(self, state, x):
        return self.inner.step(state, x)


# ------------------------------------------------------------------- CIC

class CicConfig(struct.PyTreeNode):
    """Parity: CICConfig, core/include/tsd/filtrage.hpp:1014-1024."""
    R: int = struct.field(pytree_node=False, default=4)   # decimation ratio
    N: int = struct.field(pytree_node=False, default=4)   # number of stages
    M: int = struct.field(pytree_node=False, default=1)   # design delay


class Cic(Block):
    """CIC decimator ('d') or interpolator ('i'/'u') with int32 wraparound
    arithmetic (parity: FiltreCIC, cic.cc:12-101).

    Input is cast to int32 (like the reference's as<Ti>); use ``scale`` to
    pre-quantize float signals (y is rescaled back).
    """

    config: CicConfig
    mode: str = struct.field(pytree_node=False, default="d")
    scale: float = struct.field(pytree_node=False, default=1.0)

    def __post_init__(self):
        assert self.config.M == 1, "only M=1 supported (like the reference)"
        assert self.mode in ("d", "i", "u")

    @property
    def gain(self) -> float:
        RM = self.config.R * self.config.M
        N = self.config.N
        if self.mode == "d":
            return 1.0 / RM ** N
        return float(self.config.R) / RM ** N

    @property
    def ratio(self):
        return 1.0 / self.config.R if self.mode == "d" else float(self.config.R)

    def init(self):
        N = self.config.N
        # integrator carries + comb memories
        return (jnp.zeros((N,), jnp.int32), jnp.zeros((N,), jnp.int32))

    def init_for(self, x):
        N = self.config.N
        # complex IQ runs as a leading (2,) re/im plane axis
        lead = (2,) if jnp.iscomplexobj(x) else ()
        return (jnp.zeros(lead + x.shape[:-1] + (N,), jnp.int32),
                jnp.zeros(lead + x.shape[:-1] + (N,), jnp.int32))

    def step(self, state, x):
        if jnp.iscomplexobj(x):
            # complex IQ: run the re/im planes through the SAME integer
            # pipeline as a leading plane axis (the reference FiltreCIC
            # is templated over complex T, cic.cc:12; the old
            # complex->int32 cast silently DROPPED the Q plane)
            planes = jnp.stack([jnp.real(x), jnp.imag(x)])
            state, y = self.step(state, planes)
            return state, (y[0] + 1j * y[1]).astype(complex_dtype)
        integ, combs = state
        N, R = self.config.N, self.config.R
        if self.mode == "d":
            # the decimation phase restarts at each step() call, so
            # streaming correctness requires whole-R blocks (same
            # constraint as FirDecim)
            assert x.shape[-1] % R == 0, \
                f"Cic decimator block length must be a multiple of R={R}"
        xi = jnp.round(x * self.scale).astype(jnp.int32)
        if self.mode == "d":
            # N cascaded integrators (wraparound-exact int32 cumsum)
            for i in range(N):
                xi = jnp.cumsum(xi, axis=-1, dtype=jnp.int32) + integ[..., i:i + 1]
                integ = integ.at[..., i].set(xi[..., -1])
            # decimate
            xd = xi[..., ::R]
            # N comb stages at low rate: y = x - x_prev (memory carried)
            for i in range(N):
                prev = jnp.concatenate(
                    [combs[..., i:i + 1], xd[..., :-1]], axis=-1)
                combs = combs.at[..., i].set(xd[..., -1])
                xd = xd - prev
            y = xd.astype(real_dtype) * (self.gain / self.scale)
            return (integ, combs), y
        # interpolation: combs first, then zero-stuff, then integrators
        for i in range(N):
            prev = jnp.concatenate([combs[..., i:i + 1], xi[..., :-1]], axis=-1)
            combs = combs.at[..., i].set(xi[..., -1])
            xi = xi - prev
        n = xi.shape[-1]
        up = jnp.zeros(xi.shape[:-1] + (n, R), jnp.int32)
        up = up.at[..., 0].set(xi).reshape(*xi.shape[:-1], n * R)
        xi = up
        for i in range(N):
            xi = jnp.cumsum(xi, axis=-1, dtype=jnp.int32) + integ[..., i:i + 1]
            integ = integ.at[..., i].set(xi[..., -1])
        y = xi.astype(real_dtype) * (self.gain / self.scale)
        return (integ, combs), y


def cic_design_ba(config: CicConfig) -> Tuple[np.ndarray, np.ndarray]:
    """CIC equivalent FIR transfer function ((1/RM) sum z^-i)^N (parity:
    design_cic, cic.cc:107-115)."""
    RM = config.R * config.M
    h = np.ones(RM) / RM
    out = np.array([1.0])
    for _ in range(config.N):
        out = np.convolve(out, h)
    return out, np.array([1.0])


def cic_freq(config: CicConfig, f: np.ndarray) -> np.ndarray:
    """|H(f)| of the CIC (parity: cic_freq, cic.cc:222-235)."""
    f = np.asarray(f, float)
    RM = config.R * config.M
    d = RM * np.sin(np.pi * f)
    with np.errstate(divide="ignore", invalid="ignore"):
        mag = np.abs(np.sin(RM * np.pi * f) / d) ** config.N
    return np.where(d == 0, 1.0, mag)


def cic_bits(config: CicConfig) -> int:
    """Additional accumulator bits needed (parity: cic_analyse,
    cic.cc:209-211)."""
    return int(np.ceil(config.N * np.log2(config.R) - 1))


def _poly_div_1mz(c: np.ndarray) -> np.ndarray:
    """Exact division of a polynomial in z^-1 by (1 - z^-1): the quotient
    coefficients are the running partial sums (valid when the division is
    exact, i.e. c sums to zero)."""
    q = np.cumsum(c)[:-1]
    assert abs(np.sum(c)) < 1e-9 * np.abs(c).sum()
    return q


def cic_bit_growth(config: CicConfig, bin_bits: int = 16,
                   bout_bits: Optional[int] = None) -> dict:
    """Per-stage register analysis of the integer decimating CIC runtime
    (Hogenauer 1981, "An economical class of digital filters for
    decimation and interpolation", IEEE Trans. ASSP).

    The reference's ``cic_analyse`` reports only the TOTAL extra bits
    (cic.cc:209-211); this is the full per-stage picture — a documented
    improvement:

    * every register (integrators and combs) must hold ``bmax = bin_bits
      + ceil(N log2(R M))`` bits — two's-complement wraparound makes the
      SAME width sufficient at every node (Hogenauer's register-growth
      result);
    * truncating ``prunable[j]`` least-significant bits at the output of
      stage j (1..2N, integrators then combs) keeps the total injected
      truncation noise at the output below the quantization noise of the
      ``bout_bits``-bit output, under Hogenauer's equal-noise-allocation
      rule.  The per-stage noise gains F_j are computed numerically as
      the L2 norms of the exact stage->output impulse responses
      ((1-z^-RM)^N / (1-z^-1)^(N-j) for integrator j; (1-z^-M)^(2N-j)
      for comb j-N, at the decimated rate).

    Returns dict(bmax, growth_bits (per integrator, worst-case MSB
    growth ceil(j log2 RM)), F (2N noise gains), prunable (2N)).
    """
    R, N, M = config.R, config.N, config.M
    RM = R * M
    if bout_bits is None:
        bout_bits = bin_bits
    G = int(np.ceil(N * np.log2(RM)))
    bmax = bin_bits + G
    base = np.zeros(RM + 1)
    base[0], base[RM] = 1.0, -1.0
    numc = np.array([1.0])
    for _ in range(N):
        numc = np.convolve(numc, base)
    F = []
    for j in range(1, N + 1):            # after integrator j
        c = numc.copy()
        for _ in range(N - j):
            c = _poly_div_1mz(c)
        F.append(float(np.sqrt(np.sum(c * c))))
    cb = np.zeros(M + 1)
    cb[0], cb[M] = 1.0, -1.0
    for j in range(N + 1, 2 * N + 1):    # after comb j-N (decimated)
        c = np.array([1.0])
        for _ in range(2 * N - j):
            c = np.convolve(c, cb)
        F.append(float(np.sqrt(np.sum(c * c))))
    # output discard budget, spread equally over the 2N stages
    b_out_discard = max(bmax - bout_bits, 0)
    prunable = [
        int(np.clip(np.floor(b_out_discard - np.log2(max(f, 1e-300))
                             - 0.5 * np.log2(2 * N)), 0, bmax))
        for f in F]
    growth_bits = [int(np.ceil(j * np.log2(RM))) for j in range(1, N + 1)]
    return dict(bmax=bmax, growth_bits=growth_bits, F=F,
                prunable=prunable)


def cic_comp_design(config: CicConfig, fe: float, R2: int, fc: float,
                    ncoefs: int) -> np.ndarray:
    """FIR compensation filter for the CIC droop, by frequency sampling of
    the inverse CIC response with a cutoff at fc (parity: design_cic_comp,
    cic.cc:238-331).

    ``R2`` (the post-compensation decimation ratio) is kept for signature
    parity but does NOT affect the design — the reference's own
    implementation ignores it too (cic.cc:238-331 derives everything from
    fs = fe/R and fc; R2 only labels its analysis plots)."""
    from .fir_design import fir_design_freq_sampling
    fs = fe / config.R
    m = (ncoefs + 1) // 2
    # frequency grid of the freq-sampling design, at the decimated rate
    fr = np.linspace(0, 0.5 * (1 - 1.0 / m), m) * fs
    mag = cic_freq(config, fr / fe)
    ideal = 1.0 / np.maximum(mag, 1e-9)
    idx = np.searchsorted(fr, fc)
    idx = min(max(idx, 2), m - 2)
    ideal[idx - 1] = ideal[idx - 2] / 2
    ideal[idx] = ideal[idx - 1] / 2
    ideal[idx + 1] = ideal[idx] / 2
    ideal[idx + 2:] = 0.0
    return fir_design_freq_sampling(ncoefs, ideal)


# ------------------------------------------------- fractional interpolators

def sinc_interp_coefs(nc: int, fcut: float, tau: float,
                      fen: str = "hn") -> np.ndarray:
    """Windowed-sinc fractional-delay taps at offset tau in [0,1]
    (parity: InterpolateurSinc::coefs_calcule, itrp.cc:24-39, including the
    tau-shifted Hann window)."""
    i = np.arange(nc)
    # reference two-arg sinc(2fc, k) = 2fc * sinc(2fc * k)
    k = i - nc // 2 - tau
    h = 2 * fcut * np.sinc(2 * fcut * k)
    if fen == "hn":
        a, b = 0.5, 0.25
        t = (np.linspace(-(nc // 2), (nc - 1) // 2, nc) - tau) * (2 * np.pi / nc)
        h = h * (a + 2 * b * np.cos(t))
    s = h.sum()
    return h / s if abs(s) > 1e-12 else h


def sinc_interp_lut(nc: int = 15, nphases: int = 256, fcut: float = 0.5,
                    fen: str = "hn") -> np.ndarray:
    """(nphases+1, nc) LUT of fractional-delay taps (parity:
    InterpolateurSinc, itrp.cc:11-57)."""
    return np.stack([sinc_interp_coefs(nc, fcut, p / nphases, fen)
                     for p in range(nphases + 1)])


def cspline_coefs(t: float, c: float = 0.0) -> np.ndarray:
    """Cardinal cubic spline taps on (p-1, p0, p1, p2) (parity:
    cspline_filtre, itrp.cc:293-312; c=0 is Catmull-Rom)."""
    h = np.array([(1 + 2 * t) * (t - 1) ** 2,
                  t * (t - 1) ** 2,
                  t * t * (3 - 2 * t),
                  t * t * (t - 1)])
    return np.array([
        -(1 - c) * h[1] / 2,
        h[0] - (1 - c) * h[3] / 2,
        h[2] + (1 - c) * h[1] / 2,
        (1 - c) * h[3] / 2])


def cspline_lut(n: int = 256, c: float = 0.0) -> np.ndarray:
    """(n+1, 4) spline LUT (parity: cspline_calc_lut, itrp.cc:315-321)."""
    return np.stack([cspline_coefs(i / n, c) for i in range(n + 1)])


def linear_coefs(t: float) -> np.ndarray:
    """Parity: InterpolateurLineaire, itrp.cc:82-95."""
    return np.array([1 - t, t])


def lagrange_coefs(d: int, tau: float) -> np.ndarray:
    """Lagrange interpolator of degree d, K=d+1 taps, interpolating at
    (d-1)/2 + tau (parity: InterpolateurLagrange, itrp.cc:98-140)."""
    t = (d - 1.0) / 2 + tau
    pts = np.arange(d + 1, dtype=float)
    h = np.ones(d + 1)
    for i in range(d + 1):
        for j in range(d + 1):
            if i != j:
                h[i] *= (t - pts[j]) / (pts[i] - pts[j])
    return h


class Interpolator(struct.PyTreeNode):
    """Phase-LUT fractional interpolator: taps[phase] dot window.

    Convention (measured, tests/test_resample.py): with window w[i] =
    x[s+i], ``taps(tau) @ w`` evaluates x at s + center + tau where
    ``center = K - 1 - delay_``; equivalently, when the window ends at
    the newest sample x[m] (the causal streaming case), the output is
    x(m - delay_ + tau) — ``delay_`` IS the causal group delay in input
    samples."""

    lut: jax.Array   # (nphases+1, K)
    K: int = struct.field(pytree_node=False)
    delay_: float = struct.field(pytree_node=False)

    @property
    def nphases(self) -> int:
        return self.lut.shape[0] - 1

    def taps(self, tau: jax.Array) -> jax.Array:
        """Taps for fractional offsets tau in [0,1] (batched)."""
        idx = jnp.clip(jnp.round(tau * self.nphases).astype(jnp.int32),
                       0, self.nphases)
        return self.lut[idx]


def make_interpolator(kind: str = "sinc", **kw) -> Interpolator:
    """Factory (parity: itrp_sinc / itrp_cspline / itrp_lineaire /
    itrp_lagrange, itrp.cc)."""
    if kind == "sinc":
        nc = kw.get("ncoefs", 15)
        lut = sinc_interp_lut(nc, kw.get("nphases", 256),
                              kw.get("fcut", 0.5), kw.get("fen", "hn"))
        # kernel center is nc//2 (sinc_interp_coefs uses k = i - nc//2
        # - tau) -> causal group delay nc - 1 - nc//2.  For odd nc this
        # equals the old (nc-1) - (nc-1)//2; for EVEN nc the old formula
        # overstated the delay by one full sample (review finding,
        # verified by measuring taps(0) @ arange(nc))
        delay = nc - 1 - nc // 2
        return Interpolator(lut=jnp.asarray(np.asarray(lut, np.float32)), K=nc, delay_=delay)
    if kind == "cspline":
        lut = cspline_lut(kw.get("nphases", 256), kw.get("c", 0.0))
        return Interpolator(lut=jnp.asarray(np.asarray(lut, np.float32)), K=4, delay_=2.0)
    if kind == "linear":
        n = kw.get("nphases", 256)
        lut = np.stack([linear_coefs(i / n) for i in range(n + 1)])
        return Interpolator(lut=jnp.asarray(np.asarray(lut, np.float32)), K=2, delay_=1.0)
    if kind == "lagrange":
        d = kw.get("degree", 3)
        n = kw.get("nphases", 256)
        lut = np.stack([lagrange_coefs(d, i / n) for i in range(n + 1)])
        # the kernel interpolates at (d-1)/2 + tau -> causal delay
        # (d+1)/2 EXACTLY (a float: even degrees sit half a sample off
        # the old integer formula — review finding, measured)
        return Interpolator(lut=jnp.asarray(np.asarray(lut, np.float32)), K=d + 1,
                            delay_=(d + 1) / 2)
    raise ValueError(f"unknown interpolator {kind!r}")


# ------------------------------------------------- rational rate adapter

class RationalResampler(Block):
    """Resample by the exact rational ratio p/q (output rate = input * p/q)
    using a fractional interpolator bank — the static-shape TPU
    reformulation of the reference's phase-accumulator loop
    (AdaptationRythmeSimple, ra.cc:14-80).

    Block input length must be a multiple of q; output length is n*p/q.
    Output j interpolates input time j*q/p (plus interpolator delay).

    TPU hot path: the p fractional phases repeat every q input samples,
    so one full cycle (p outputs from a (q+K)-sample window) is a dense
    precomputed ``A (p, q+K)`` matrix — the whole resampler is
    hop-strided frames + ONE batched matmul on the MXU, with zero
    runtime LUT lookups (the per-output window take + LUT gather of the
    naive form lowers to element-rate gathers; measured on the
    channelizer that costs ~35 M gathered elements/s on v5e).
    """

    itrp: Interpolator
    A: jax.Array     # (p, q+K) one-cycle interpolation matrix
    p: int = struct.field(pytree_node=False)
    q: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, ratio: float, itrp: Optional[Interpolator] = None,
               max_den: int = 1 << 16) -> "RationalResampler":
        fr = fractions.Fraction(ratio).limit_denominator(max_den)
        if itrp is None:
            # anti-alias at half the lower of the two rates (ra.cc:151)
            fcut = min(0.4, 0.5 * min(1.0, float(fr)))
            itrp = make_interpolator("sinc", ncoefs=15, fcut=fcut)
        p, q = fr.numerator, fr.denominator
        K = itrp.K
        # one-cycle matrix: output r of a cycle reads window samples
        # ip_r+1+i (i < K) of the (q+K)-wide frame with taps(tau_r).
        # Guarded: an irrational ratio pushed through a large max_den can
        # make p*(q+K) enormous (pi/2 at 1<<16 -> 52174 x 33230 = 6.9 GB)
        # — those configs keep the gather fallback; better, pass a small
        # max_den (the Resampler cascade uses 256: ratio error <1e-5)
        if p * (q + K) <= (1 << 23):
            # all index math on HOST ints (p, q are static); the only
            # device op is one take at creation — keeps create() usable
            # at trace time (resample() inside jit)
            nph = itrp.lut.shape[0] - 1
            r = np.arange(p)
            ip = (r * q) // p
            tau = ((r * q) % p) / p
            ph = np.minimum(np.round(tau * nph).astype(np.int64), nph)
            taps = itrp.lut[jnp.asarray(ph)]                 # (p, K)
            cols = np.arange(q + K)[None, :] - (ip[:, None] + 1)
            valid = (cols >= 0) & (cols < K)
            gcols = np.clip(cols, 0, K - 1)
            A = jnp.where(jnp.asarray(valid),
                          jnp.take_along_axis(
                              taps, jnp.asarray(gcols), axis=1),
                          0.0).astype(real_dtype)
        else:
            A = jnp.zeros((1, 1), real_dtype)   # fallback marker
        return cls(itrp=itrp, A=A, p=p, q=q)

    @property
    def ratio(self):
        return self.p / self.q

    @property
    def delay(self) -> float:
        return self.itrp.delay_ * self.ratio

    def init(self):
        return jnp.zeros((self.itrp.K,), real_dtype)

    def init_for(self, x):
        dt = complex_dtype if jnp.iscomplexobj(x) else real_dtype
        return jnp.zeros(x.shape[:-1] + (self.itrp.K,), dt)

    def step(self, state, x):
        n = x.shape[-1]
        p, q, K = self.p, self.q, self.itrp.K
        assert (n * p) % q == 0, "block length * p must be a multiple of q"
        nout = n * p // q
        xx = jnp.concatenate([state, x], axis=-1)  # (..., n + K)
        if n % q == 0 and self.A.shape == (p, q + K):
            # MXU path: frames with hop q (gather-free: S static slices
            # of the q-column reshape) x the one-cycle matrix A
            ncyc = n // q
            W = q + K
            S = -(-W // q)                     # frames span S hop-rows
            total = (ncyc + S - 1) * q
            from ..block import safe_pad
            xp = safe_pad(xx, 0, total - xx.shape[-1], axis=-1)
            xr = xp.reshape(*xp.shape[:-1], ncyc + S - 1, q)
            frames = jnp.concatenate(
                [jax.lax.slice_in_dim(xr, s, s + ncyc, axis=-2)
                 for s in range(S)], axis=-1)[..., :W]  # (..., ncyc, W)
            A = self.A.astype(real_dtype)
            if jnp.iscomplexobj(xx):
                yr = jnp.einsum("...cw,pw->...cp", jnp.real(frames), A,
                                precision=jax.lax.Precision.HIGHEST)
                yi = jnp.einsum("...cw,pw->...cp", jnp.imag(frames), A,
                                precision=jax.lax.Precision.HIGHEST)
                y = (yr + 1j * yi).astype(complex_dtype)
            else:
                y = jnp.einsum("...cw,pw->...cp", frames, A,
                               precision=jax.lax.Precision.HIGHEST)
            y = y.reshape(*x.shape[:-1], nout)
            return xx[..., -K:], y
        # fallback (n a multiple of q/gcd only): per-output window take —
        # correct but gather-bound; prefer q-multiple blocks
        j = jnp.arange(nout)
        # exact integer phase: t_j = j*q/p input samples
        ip = (j * q) // p                      # integer part
        tau = ((j * q) % p).astype(real_dtype) / p
        # causal window for output j ends at the newest available sample
        # x[ip]: w = x[ip-K+1 .. ip] (xx index of x[t] is K + t, so the
        # window starts at xx index ip + 1); the interpolated value is
        # then x(ip + tau - delay_) — see Interpolator's convention note
        i = jnp.arange(K)[None, :]
        widx = (ip[:, None] + 1 + i)           # covers x[ip - K + 1 .. ip]
        W = xx[..., widx]                      # (..., nout, K)
        T = self.itrp.taps(tau)                # (nout, K)
        y = jnp.sum(W * T.astype(W.dtype), axis=-1)
        return xx[..., -K:], y


class Resampler(Block):
    """Arbitrary-ratio resampler: cascade of half-band decimators /
    polyphase x2 upsamplers bringing the residual ratio into [0.5, 2), then a
    rational interpolator (parity: AdaptationRythmeArbitraire,
    ra.cc:85-179)."""

    stages: Tuple[Block, ...]

    @classmethod
    def create(cls, ratio: float) -> "Resampler":
        stages = []
        post = ratio
        h = fir_design_windowed(15, "lp", 0.25, "hn")
        while post < 0.5:
            stages.append(HalfbandDecim.create(n=15))
            post *= 2
        while post >= 2:
            stages.append(FirUps.create(h, 2))
            post /= 2
        if abs(post - 1.0) > 1e-9:
            # small denominator for the residual stage: the achieved
            # ratio differs by ~1e-6 relative (ppm rate error), while
            # huge p/q fractions for irrational ratios would force
            # gigantic block-length constraints (pad-to-multiple-of-q
            # zero tails) and an unbuildable cycle matrix — pi at the old
            # 1<<16 default meant q=33215 and a -20 dB spur floor from
            # the padding
            stages.append(RationalResampler.create(post, max_den=1024))
        return cls(stages=tuple(stages))

    @property
    def ratio(self):
        r = 1.0
        for s in self.stages:
            r *= s.ratio
        return r

    def init(self):
        return tuple(s.init() for s in self.stages)

    def init_for(self, x):
        states = []
        for s in self.stages:
            states.append(s.init_for(x) if hasattr(s, "init_for") else s.init())
        return tuple(states)

    def step(self, state, x):
        new_states = []
        for s, st in zip(self.stages, state):
            st, x = s.step(st, x)
            new_states.append(st)
        return tuple(new_states), x


def resample(x: jax.Array, ratio: float) -> jax.Array:
    """One-shot arbitrary-ratio resampling (parity: filtre_reechan one-shot
    use / rééchan)."""
    blk = Resampler.create(ratio)
    # pad so every stage's block-length constraint is met
    n = x.shape[-1]
    # the constraints MULTIPLY across stages: d half-band decimators need
    # a multiple of 2^d, and the rational stage then needs what reaches
    # it to be a multiple of its q — a multiple of 2^d * q at the input
    # satisfies both
    q = 1
    for s in blk.stages:
        if isinstance(s, RationalResampler):
            q *= s.q
        elif isinstance(s, HalfbandDecim):
            q *= 2
    from ..block import pad_to_multiple
    xp = pad_to_multiple(x, q, axis=x.ndim - 1)
    _, y = blk.step(blk.init_for(xp), xp)
    # trim the zero-padding tail: for large-q residual ratios (e.g. pi/2
    # -> q=226) the pad added up to q-1 input samples, whose resampled
    # images are NOT signal — return ~n*ratio samples as documented
    nout = int(round(n * blk.ratio))
    return y[..., :nout] if y.shape[-1] > nout else y


def interp_irregular(x: jax.Array, y: jax.Array, x2: jax.Array,
                     mode: str = "linear") -> jax.Array:
    """Interpolate an irregularly sampled function: given knots (x, y) with
    x strictly increasing, evaluate at the points x2 (parity:
    tsd::filtrage::interp, filtrage.hpp:2048-2068 — InterpOption
    LINEAIRE / CSPLINE natural cubic splines).

    mode: "linear" or "cspline" (natural cubic spline: second derivative
    zero at both ends; the tridiagonal system is solved densely, fine for
    the typical few-thousand-knot use).  Evaluation clamps outside
    [x[0], x[-1]] like the reference's boundary handling.
    """
    x = jnp.asarray(x, real_dtype)
    y = jnp.asarray(y)
    # promote y to float up front: the spline math divides by knot
    # spacings cast to y's dtype, which truncates to garbage for int y
    y = y.astype(complex_dtype if jnp.iscomplexobj(y) else real_dtype)
    x2 = jnp.asarray(x2, real_dtype)
    if mode == "linear":
        if jnp.iscomplexobj(y):
            return (jnp.interp(x2, x, jnp.real(y))
                    + 1j * jnp.interp(x2, x, jnp.imag(y))
                    ).astype(complex_dtype)
        return jnp.interp(x2, x, y.astype(real_dtype))
    assert mode == "cspline", mode
    n = x.shape[0]
    h = jnp.diff(x)                                    # (n-1,)
    # natural spline: solve for interior second derivatives m[1..n-2]
    # (m[0] = m[n-1] = 0) in the standard tridiagonal system
    dy = jnp.diff(y) / h.astype(y.dtype)
    rhs = 6.0 * jnp.diff(dy)                           # (n-2,)
    A = (jnp.diag(2.0 * (h[:-1] + h[1:]))
         + jnp.diag(h[1:-1], 1) + jnp.diag(h[1:-1], -1))
    if jnp.iscomplexobj(y):
        m_int = (jnp.linalg.solve(A, jnp.real(rhs))
                 + 1j * jnp.linalg.solve(A, jnp.imag(rhs)))
    else:
        m_int = jnp.linalg.solve(A, rhs)
    m = jnp.concatenate([jnp.zeros((1,), m_int.dtype), m_int,
                         jnp.zeros((1,), m_int.dtype)])
    # evaluate piecewise cubic on each query point
    k = jnp.clip(jnp.searchsorted(x, x2, side="right") - 1, 0, n - 2)
    xk, hk = x[k], h[k]
    t = jnp.clip((x2 - xk) / hk, 0.0, 1.0)
    yk, yk1, mk, mk1 = y[k], y[k + 1], m[k], m[k + 1]
    hk = hk.astype(y.dtype)
    t_ = t.astype(y.dtype)
    a = yk
    b = (yk1 - yk) / hk - hk * (2.0 * mk + mk1) / 6.0
    c = mk / 2.0
    d = (mk1 - mk) / (6.0 * hk)
    dx = t_ * hk
    return a + dx * (b + dx * (c + dx * d))
