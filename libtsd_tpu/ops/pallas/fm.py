"""Pallas TPU kernel: fully fused FM broadcast receiver chain.

BASELINE.json config 4 — channelize (NCO mix) -> channel-select lowpass
+ decimate -> quadrature discriminator -> de-emphasis — in ONE kernel:
the mixed/filtered/decimated signal and the discriminator output never
exist in HBM.  Per grid step (channel c, chunk f), all in VMEM:

  1. NCO mix to baseband (VPU): phase in wrapped CYCLES — the ramp
     frac(f0*idx) is precomputed host-side in float64 and the per-chunk
     offset arrives via a (nchunks,) table, so there is no float32
     phase random walk at any stream length.
  2. Channel lowpass + decimate by R (MXU): STRIDED banded-Toeplitz
     matmuls G_r[u, i] = h[r*L + i*R - u] — each decimated output frame
     is a sum of tap-block matmuls over the R input frames it spans
     (the polyphase structure folded into the Toeplitz factors; same
     FLOPs as FirDecim, zero non-matmul work).
  3. Quadrature discriminator (VPU + 2 tiny MXU shifts): the 1-sample
     delay inside the frame layout is a subdiagonal shift matrix matmul
     plus a last-lane injector carrying the previous frame's edge;
     d = atan2(Im(z), Re(z)) with z = x * conj(x_delayed).
  4. De-emphasis IIR (MXU + k-dim state hop): the IirFrame operators
     (T/S/W/M, ops/filter_rt.py:454) applied in-kernel, with the
     cross-frame state recursion as a fori_loop over the chunk's frames
     (k = 1 scalar per step) — see ops/pallas/iir.py.

Parity: FmReceiver (models/receivers.py) = the composed XLA chain;
reference: FM demod analogique.cc:18-76,381-658.  This kernel computes
the same chain fused; audio output scale matches FmReceiver
(d / (2*pi*deviation), de-emphasized).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..filter_rt import _iir_frame_mats

__all__ = ["FmChainPallas"]

_L = 128
_KP = 8

# minimax polynomial for atan(t)/t in s = t^2 on [0, 1] (degree 8 in s,
# Chebyshev-node fit; max abs error 9.7e-9 < f32 ulp of pi/4) — Mosaic
# has no atan2 primitive
_ATAN_C = (0.99999998, -0.33333037, 0.19991872, -0.14197798,
           0.10618371, -0.07456855, 0.04213762, -0.01573125,
           0.00276628)


def _atan2_poly(y, x):
    """Elementwise atan2 from the polynomial atan (VPU-only ops)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    s = t * t
    p = jnp.full_like(s, _ATAN_C[-1])
    for cc in _ATAN_C[-2::-1]:
        p = p * s + cc
    r = p * t                              # atan(min/max) in [0, pi/4]
    r = jnp.where(ay > ax, (np.pi / 2) - r, r)
    r = jnp.where(x < 0, np.pi - r, r)
    return jnp.where(y < 0, -r, r)


def fir_decim_toeplitz_mats(h: np.ndarray, R: int, L: int = _L
                            ) -> Tuple[np.ndarray, int]:
    """Strided banded-Toeplitz factors for FIR + decimate-by-R.

    y[q*L + i] = sum_k h[k] x[(q*L + i)*R - k]
               = sum_r sum_u x[(q*R - r)*L + u] * G[r][u, i]
    with G[r][u, i] = h[r*L + i*R - u] (zero outside [0, K)).

    One DECIMATED output frame spans R input frames FORWARD plus the
    tap lookback: r ranges over all values where k = r*L + i*R - u can
    land in [0, K) for some (u, i) in [0, L)^2, i.e.
    r_min = -floor((L-1)*R/L) (input frames ahead of q*R) to
    r_max = floor((K+L-2)/L) (tap history).  Returns (G[j] for
    j = r - r_min, r_max) — the kernel needs r_max history frames.
    """
    h = np.asarray(h, np.float64)
    K = len(h)
    r_min = -(((L - 1) * R) // L)
    r_max = (K + L - 2) // L
    Dr = r_max - r_min + 1
    G = np.zeros((Dr, L, L), np.float32)
    u = np.arange(L)[:, None]
    i = np.arange(L)[None, :]
    for j, r in enumerate(range(r_min, r_max + 1)):
        idx = r * L + i * R - u
        valid = (idx >= 0) & (idx < K)
        G[j] = np.where(valid, h[np.clip(idx, 0, K - 1)], 0.0)
    return G, r_max


def _kernel(xr_ref, xi_ref, g_ref, ramp_ref, offs_ref, shm_ref, inj_ref,
            t_ref, s_ref, w_ref, m_ref,
            y_ref, hr_scr, hi_scr, prev_scr, iirs_scr, u_scr, lc_scr,
            *, R: int, rows_in: int, rows_out: int, inv_2pi_dev: float,
            nchunks: int, hist: int):
    f = pl.program_id(1)
    hp = jax.lax.Precision.HIGHEST
    dot = functools.partial(jnp.dot, precision=hp,
                            preferred_element_type=jnp.float32)
    Dr = g_ref.shape[1]
    r_min = -(((_L - 1) * R) // _L)

    @pl.when(f == 0)
    def _():
        hr_scr[...] = jnp.zeros_like(hr_scr)
        hi_scr[...] = jnp.zeros_like(hi_scr)
        prev_scr[...] = jnp.zeros_like(prev_scr)
        iirs_scr[...] = jnp.zeros_like(iirs_scr)

    # ---- (1) NCO mix to baseband (VPU, wrapped cycles) ----
    ph = ramp_ref[...] + offs_ref[f, 0]
    ph = ph - jnp.floor(ph)
    ang = (-2.0 * np.pi) * ph
    cs, sn = jnp.cos(ang), jnp.sin(ang)
    xr = xr_ref[0]
    xi = xi_ref[0]
    br = xr * cs - xi * sn
    bi = xr * sn + xi * cs

    # ---- (2) strided-Toeplitz FIR + decimate (MXU) ----
    exr = jnp.concatenate([hr_scr[...], br], axis=0)
    exi = jnp.concatenate([hi_scr[...], bi], axis=0)
    hr_scr[...] = br[rows_in - hist:, :]
    hi_scr[...] = bi[rows_in - hist:, :]

    def decim(ex):
        # output frame q reads input frame q*R + o_j with
        # o_j = hist - j - r_min; for fixed j the q-range is a stride-R
        # frame slice -> ONE (rows_out, L) @ (L, L) matmul per tap block
        # (a per-(q, j) loop was 2*rows_out*Dr tiny matmuls — slow to
        # compile and to issue)
        # R-1 trailing zero frames so every strided view reshapes
        # cleanly; [:, 0] never selects them
        exp = jnp.concatenate(
            [ex, jnp.zeros((R - 1, _L), ex.dtype)], axis=0)
        acc = None
        for j in range(Dr):
            o = hist - j - r_min
            sl = exp[o: o + rows_out * R].reshape(rows_out, R, _L)[:, 0]
            t = dot(sl, g_ref[0, j])
            acc = t if acc is None else acc + t
        return acc

    zr = decim(exr)                                  # (rows_out, L)
    zi = decim(exi)

    # ---- (3) quadrature discriminator (VPU + shift matmuls) ----
    # 1-sample delay in frame layout: lane shift via subdiagonal matrix
    # + previous frame's last sample injected, with the cross-chunk edge
    # carried in prev_scr = [re, im] of the last decimated sample
    SH = shm_ref[...]
    INJ = inj_ref[...]
    # edge vector per output frame: frame q's delayed lane 0 comes from
    # frame q-1's lane L-1 (frame -1 -> carried scalar).  Assembled in
    # scratch — Mosaic miscompiles a value-level concat of offset slices.
    lc_scr[1:rows_out, 0:1] = zr[: rows_out - 1, _L - 1:_L]
    lc_scr[0:1, 0:1] = prev_scr[0:1, 0:1]
    lc_scr[1:rows_out, 1:2] = zi[: rows_out - 1, _L - 1:_L]
    lc_scr[0:1, 1:2] = prev_scr[1:2, 0:1]
    dzr = dot(zr, SH) + dot(lc_scr[:, 0:1], INJ)
    dzi = dot(zi, SH) + dot(lc_scr[:, 1:2], INJ)
    # (1,1) slice stores (Mosaic cannot store scalars to VMEM)
    prev_scr[0:1, 0:1] = zr[rows_out - 1:rows_out, _L - 1:_L]
    prev_scr[1:2, 0:1] = zi[rows_out - 1:rows_out, _L - 1:_L]
    # z * conj(z_delayed)
    wr = zr * dzr + zi * dzi
    wi = zi * dzr - zr * dzi
    d = _atan2_poly(wi, wr) * inv_2pi_dev          # (rows_out, L)

    # ---- (4) de-emphasis IIR (MXU + k-dim hop) ----
    # u staged through VMEM scratch: Mosaic cannot dynamic-slice a VALUE
    # inside fori_loop, only a ref
    u_scr[...] = dot(d, w_ref[0])                    # (rows_out, _KP)
    M = m_ref[0]

    def body(j, sv):
        iirs_scr[pl.ds(1 + j, 1), :] = sv
        return jnp.dot(sv, M.T, precision=hp,
                       preferred_element_type=jnp.float32) \
            + u_scr[pl.ds(j, 1), :]

    sv = jax.lax.fori_loop(0, rows_out, body, iirs_scr[pl.ds(0, 1), :])
    iirs_scr[pl.ds(0, 1), :] = sv                    # next chunk's carry
    s_start = iirs_scr[pl.ds(1, rows_out), :]
    y_ref[0] = dot(d, t_ref[0]) + dot(s_start, s_ref[0])


class FmChainPallas:
    """Fused FM receiver chain.  Matches FmReceiver's stage semantics
    with zero-state boundaries handled in-kernel; input (C, n) complex
    given as real planes (axon: no complex transfers)."""

    def __init__(self, channel_freq: float, decim: int, chan_taps: int,
                 deviation: float, deemph_fc: float,
                 chan_h: np.ndarray | None = None):
        from ..fir_design import fir_design_windowed
        from ..iir_design import design_lexp
        R = decim
        if chan_h is None:
            chan_h = np.asarray(
                fir_design_windowed(chan_taps, "lp", 0.4 / R, "hn"))
        G, r_max = fir_decim_toeplitz_mats(chan_h, R)
        self.G = jnp.asarray(G[None])
        self.hist = max(r_max, 1)
        if deemph_fc > 0:
            b, a = design_lexp(deemph_fc)
        else:
            b, a = np.array([1.0, 0.0]), np.array([1.0, 0.0])
        # order >= 1 operators (design_lexp is order 1)
        T, S, W, Apow = _iir_frame_mats(np.asarray(b), np.asarray(a), _L)
        k = S.shape[1]
        Sp = np.zeros((_KP, _L), np.float32)
        Sp[:k] = S.T
        Wp = np.zeros((_L, _KP), np.float32)
        Wp[:, :k] = W[:, ::-1].T
        Mp = np.zeros((_KP, _KP), np.float32)
        Mp[:k, :k] = Apow[_L]
        self.T = jnp.asarray(T.T.astype(np.float32)[None])
        self.S = jnp.asarray(Sp[None])
        self.W = jnp.asarray(Wp[None])
        self.M = jnp.asarray(Mp[None])
        # 1-sample-delay operators: SH[u, i] = 1 at u = i - 1 (lane
        # shift right); INJ[0, 0] = 1 injects the previous frame's edge
        SH = np.zeros((_L, _L), np.float32)
        SH[np.arange(_L - 1), np.arange(1, _L)] = 1.0
        INJ = np.zeros((1, _L), np.float32)
        INJ[0, 0] = 1.0
        self.SH = jnp.asarray(SH)
        self.INJ = jnp.asarray(INJ)
        self.f0 = float(channel_freq)
        self.R = R
        self.dev = float(deviation)

    def __call__(self, xr: jax.Array, xi: jax.Array, tb: int = 32,
                 interpret: bool = False) -> jax.Array:
        """xr/xi: (C, N) float32 planes; N % (tb*128*R) == 0.
        Returns audio (C, N // R) float32."""
        if tb * self.R < self.hist:
            # the kernel seeds its filter-history scratch from the LAST
            # `hist` input frames of each grid step: the step must hold
            # at least that many, or the scratch assignment would fail
            # with an opaque trace-time shape error
            raise ValueError(
                f"chunk too small for the channel filter: tb*R = "
                f"{tb * self.R} input frames/step < history {self.hist} "
                f"(~ceil((len(chan_h)-1)/128) frames) — raise tb or "
                f"shorten chan_h")
        return _fm_chain(xr, xi, self.G, self.T, self.S, self.W, self.M,
                         self.SH, self.INJ, f0=self.f0, R=self.R,
                         dev=self.dev, tb=tb, interpret=interpret,
                         hist=self.hist)


@functools.partial(jax.jit, static_argnames=("f0", "R", "dev", "tb",
                                              "interpret", "hist"))
def _fm_chain(xr, xi, G, T, S, W, M, SH, INJ, *, f0: float, R: int,
              dev: float, tb: int, interpret: bool, hist: int):
    C, N = xr.shape
    rows_out = tb
    rows_in = tb * R
    chunk_in = rows_in * _L
    assert N % chunk_in == 0, f"N must be a multiple of {chunk_in}"
    nchunks = N // chunk_in
    Nout = N // R
    # wrapped-cycle NCO tables (float64 host-side; no f32 random walk)
    idx = np.arange(chunk_in, dtype=np.float64).reshape(rows_in, _L)
    ramp = np.mod(f0 * idx, 1.0).astype(np.float32)
    offs = np.mod(f0 * chunk_in * np.arange(max(nchunks, 1),
                                            dtype=np.float64),
                  1.0).astype(np.float32).reshape(-1, 1)
    kern = functools.partial(
        _kernel, R=R, rows_in=rows_in, rows_out=rows_out,
        inv_2pi_dev=float(1.0 / (2 * np.pi * dev)), nchunks=nchunks,
        hist=hist)
    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kern,
        grid=(C, nchunks),
        in_specs=[
            pl.BlockSpec((1, rows_in, _L), lambda c, f: (c, f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_in, _L), lambda c, f: (c, f, 0),
                         memory_space=pltpu.VMEM),
            const(), const(), const(), const(), const(),
            const(), const(), const(), const(),
        ],
        out_specs=pl.BlockSpec((1, rows_out, _L), lambda c, f: (c, f, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, nchunks * rows_out, _L),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hist, _L), jnp.float32),      # FIR history re
            pltpu.VMEM((hist, _L), jnp.float32),      # FIR history im
            pltpu.VMEM((2, 1), jnp.float32),          # discri edge
            pltpu.VMEM((1 + rows_out, _KP), jnp.float32),  # IIR states
            pltpu.VMEM((rows_out, _KP), jnp.float32),      # IIR u stage
            pltpu.VMEM((rows_out, 2), jnp.float32),        # discri edges
        ],
        interpret=interpret,
    )(xr.astype(jnp.float32).reshape(C, nchunks * rows_in, _L),
      xi.astype(jnp.float32).reshape(C, nchunks * rows_in, _L),
      G, jnp.asarray(ramp), jnp.asarray(offs), SH, INJ, T, S, W, M)
    return y.reshape(C, Nout)
