"""Correlations, coherence, delay estimation (JAX, jit-able).

Parity: core/src/fourier/fourier.cc:491-607 and
core/src/fourier/estimation-delais.cc.

Lag conventions match the reference:
* ``ccorr``  — circular, lags 0..m-1 (index k means lag +k, wrapping).
* ``xcorr`` / ``xcorrb`` — linear, lags -(m-1)..(m-1); biased version divides
  by n, unbiased by the number of overlapping samples.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp

from ..config import complex_dtype, real_dtype

__all__ = ["ccorr", "xcorr", "xcorrb", "coherence", "estimate_delay", "align_int"]


def _asc(x):
    return x.astype(complex_dtype)


def ccorr(x0: jax.Array, x1: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
    """Circular cross-correlation c[k] = (1/m) sum_n x0[n]*conj(x1[n+k]).

    Returns (lags, c) with lags = 0..m-1 (k >= m/2 are negative lags by
    periodicity).  Parity: tsd::fourier::ccorr, fourier.cc:544-550.
    """
    if x1 is None:
        x1 = x0
    m = x0.shape[-1]
    X0 = jnp.fft.fft(_asc(x0))
    X1 = jnp.fft.fft(_asc(x1))
    # sum_n x0[n] conj(x1[n+k]) = ifft( conj( fft(conj(x0)) * ... ) ) — derive
    # directly: c[k] = ifft( X0 * conj(X1) )[-k] = ifft(conj(X0)*X1)[k] conj.
    c = jnp.conj(jnp.fft.ifft(jnp.conj(X0) * X1))
    lags = jnp.arange(m, dtype=real_dtype)
    return lags, c / m


def xcorrb(x: jax.Array, y: Optional[jax.Array] = None,
           m: Optional[int] = None) -> Tuple[jax.Array, jax.Array]:
    """Biased linear cross-correlation, lags -(m-1)..(m-1), normalized by n.

    c[k] = (1/n) sum_n x[n] * conj(y[n+k]).
    Parity: tsd::fourier::xcorrb, fourier.cc:552-576.
    """
    if y is None:
        y = x
    # unequal lengths supported like the reference (pad_zeros to the
    # common length before correlating, estimation-delais.cc)
    n = max(x.shape[-1], y.shape[-1])
    if m is None:
        m = n
    assert m <= n, f"lag range m={m} must be <= common length n={n}"
    # zero-pad both to n + 2m then circular-correlate
    L = n + 2 * m
    x2 = jnp.zeros(x.shape[:-1] + (L,), complex_dtype
                   ).at[..., m:m + x.shape[-1]].set(_asc(x))
    y2 = jnp.zeros(y.shape[:-1] + (L,), complex_dtype
                   ).at[..., m:m + y.shape[-1]].set(_asc(y))
    _, r = ccorr(x2, y2)
    r = r * L  # un-normalize ccorr's 1/m
    pos = r[..., :m]          # lags 0..m-1
    neg = r[..., L - (m - 1):] if m > 1 else r[..., :0]  # lags -(m-1)..-1
    c = jnp.concatenate([neg, pos], axis=-1) / n
    lags = jnp.arange(-(m - 1), m, dtype=real_dtype)
    return lags, c


def xcorr(x: jax.Array, y: Optional[jax.Array] = None,
          m: Optional[int] = None) -> Tuple[jax.Array, jax.Array]:
    """Unbiased linear cross-correlation (divides by overlap count).
    Parity: tsd::fourier::xcorr, fourier.cc:578-596."""
    n = max(x.shape[-1], (x if y is None else y).shape[-1])
    if m is None:
        m = n
    assert m <= n, f"lag range m={m} must be <= signal length n={n}"
    lags, c = xcorrb(x, y, m)
    overlap = jnp.maximum(n - jnp.abs(lags), 1.0) / n
    return lags, c / overlap.astype(real_dtype)


def coherence(x: jax.Array, y: jax.Array, N: int = 0) -> jax.Array:
    """Magnitude-squared coherence |<X Y*>|^2 / (<|X|^2><|Y|^2>),
    Welch-averaged over 50%-overlapped length-N segments (N=0: n//8).

    DOCUMENTED REFERENCE DEFECT: the reference's coherence
    (fourier.cc:599-604) computes |X Y*| / (|X| |Y|) over single
    whole-signal FFTs — which is IDENTICALLY 1 for every input (the
    numerator equals the denominator bin by bin), conveying nothing.
    Coherence is only meaningful with cross/auto spectra AVERAGED over
    segments before the ratio; this implements the standard estimator."""
    n = x.shape[-1]
    if N <= 0:
        N = max(n // 8, 8)
    hop = max(N // 2, 1)
    nseg = (n - N) // hop + 1
    # frame once + ONE batched FFT pair per signal: the old per-segment
    # Python loop emitted one FFT op pair per segment (~620 ops at
    # n=20k/N=64), blowing up trace/compile time inside jitted callers
    from .signal import sliding_frames
    w = jnp.asarray(np.hanning(N), real_dtype)
    Fx = sliding_frames(_asc(x), N, hop, nseg) * w      # (nseg, N)
    Fy = sliding_frames(_asc(y), N, hop, nseg) * w
    X = jnp.fft.fft(Fx, axis=-1)
    Y = jnp.fft.fft(Fy, axis=-1)
    Sxy = jnp.sum(X * jnp.conj(Y), axis=0)
    Sxx = jnp.sum(jnp.abs(X) ** 2, axis=0)
    Syy = jnp.sum(jnp.abs(Y) ** 2, axis=0)
    return jnp.abs(Sxy) ** 2 / (Sxx * Syy + 1e-30)


def estimate_delay(x: jax.Array, y: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Estimate the delay of y relative to x by correlation peak with
    quadratic (parabolic) sub-sample interpolation.

    Returns (delay, score) where score in [0,1] is the normalized peak
    correlation.  Parity: estimation_délais,
    core/src/fourier/estimation-delais.cc:21-168 (same parabolic refinement).
    """
    assert x.ndim == 1 and y.ndim == 1, (
        "estimate_delay is single-signal (the argmax/refinement indexing "
        "is 1-D); vmap it for batches")
    n = max(x.shape[-1], y.shape[-1])
    lags, c = xcorrb(x, y, n)
    a = jnp.abs(c)
    i = jnp.argmax(a)
    # parabolic interpolation around the peak; skipped at the boundaries
    # (the clamped neighbor would equal the peak and bias frac to +-0.5 —
    # the reference also skips there, estimation-delais.cc)
    ym1 = a[jnp.maximum(i - 1, 0)]
    y0 = a[i]
    yp1 = a[jnp.minimum(i + 1, a.shape[0] - 1)]
    denom = ym1 - 2 * y0 + yp1
    frac = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (ym1 - yp1) / denom, 0.0)
    frac = jnp.where((i == 0) | (i == a.shape[0] - 1), 0.0, frac)
    frac = jnp.clip(frac, -0.5, 0.5)
    delay = lags[i] + frac
    ex = jnp.sum(jnp.abs(x) ** 2)
    ey = jnp.sum(jnp.abs(y) ** 2)
    score = (y0 * n) / (jnp.sqrt(ex * ey) + 1e-30)
    return delay, jnp.clip(score, 0.0, 1.0)


def align_int(x: jax.Array, y: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Align two signals by the integer part of their estimated delay; returns
    (x_aligned, y_aligned, delay) of equal static length (min length).
    Parity: aligne_entier, estimation-delais.cc."""
    d, _ = estimate_delay(x, y)
    di = jnp.round(d).astype(jnp.int32)
    n = min(x.shape[-1], y.shape[-1])
    # shift y back by di with ZERO fill (a circular roll would wrap
    # |di| far-end samples into the aligned region; the reference trims,
    # estimation-delais.cc)
    idx = jnp.arange(n) + di
    ok = (idx >= 0) & (idx < y.shape[-1])
    y2 = jnp.where(ok, y[..., jnp.clip(idx, 0, y.shape[-1] - 1)], 0)
    return x[..., :n], y2, di
