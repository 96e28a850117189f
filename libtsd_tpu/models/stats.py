"""Statistics / linear prediction: Levinson-Durbin, general Toeplitz
Levinson, LPC, FIR Wiener, covariance matrix, subspace (MUSIC/EV) spectrum.

Parity: core/src/stats.cc, core/include/tsd/stats.hpp:98-267.

These run at analysis time on modest sizes: implemented with numpy/JAX
hybrid (recursions host-side float64, spectra vectorized JAX).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import complex_dtype, real_dtype

__all__ = [
    "levinson_real", "levinson", "lpc", "wiener_fir", "r2R", "covmtx",
    "subspace_spectrum", "psd_subspace",
]


def levinson_real(r: np.ndarray) -> np.ndarray:
    """Levinson-Durbin for a real autocorrelation sequence; returns the
    prediction-error filter a (a[0]=1) (parity: levinson_reel,
    stats.cc:18-41)."""
    r = np.asarray(r, np.float64)
    n = len(r)
    a = np.zeros(n)
    a[0] = 1.0
    if n == 1:          # order 0: trivial predictor
        return a
    k = -r[1] / r[0]
    a[1] = k
    alpha = r[0] * (1 - k * k)
    for i in range(2, n):
        s = np.sum(r[1:i] * a[1:i][::-1]) + r[i]
        k = -s / alpha
        a[1:i] = a[1:i] + k * a[1:i][::-1]
        a[i] = k
        alpha *= (1 - k * k)
    return a


def levinson(l1: np.ndarray, c1: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Solve T x = y for a general (non-symmetric) Toeplitz T given its
    first row l1 and first column c1 (parity: levinson, stats.cc:44-115)."""
    l1 = np.asarray(l1, np.float64)
    c1 = np.asarray(c1, np.float64)
    y = np.asarray(y, np.float64)
    n = len(l1)
    assert len(c1) == n and len(y) == n and l1[0] == c1[0]
    c1r = c1[1:][::-1]
    l1r = l1[1:]
    f = np.zeros(n)
    b = np.zeros(n)
    x = np.zeros(n)
    f[0] = 1 / l1[0]
    b[0] = 1 / c1[0]
    x[0] = y[0] / l1[0]
    for i in range(2, n + 1):
        fb = np.concatenate([f[:i - 1], [0.0]])
        bb = np.concatenate([[0.0], b[:i - 1]])
        ef = np.dot(c1r[-(i - 1):], f[:i - 1])
        eb = np.dot(l1r[:i - 1], b[:i - 1])
        fr = 1 / (1 - eb * ef)
        f[:i] = fr * fb - ef * fr * bb
        b[:i] = fr * bb - eb * fr * fb
        ex = np.dot(c1r[-(i - 1):], x[:i - 1])
        x[:i] = x[:i] + (y[i - 1] - ex) * b[:i]
    return x


def lpc(x: np.ndarray, order: int) -> Tuple[np.ndarray, float]:
    """Linear-prediction coefficients by autocorrelation + Levinson
    (parity: tsd::stats::lpc).  Returns (a, prediction_error_power)."""
    x = np.asarray(x, np.float64)
    n = len(x)
    r = np.array([np.dot(x[: n - k], x[k:]) for k in range(order + 1)]) / n
    a = levinson_real(r)
    err = float(r[0] + np.sum(a[1:] * r[1:]))
    return a, err


def wiener_fir(rxx: np.ndarray, rxy: np.ndarray) -> np.ndarray:
    """FIR Wiener filter: solve the Toeplitz normal equations
    R h = rxy (parity: wiener_rif, stats.cc)."""
    rxx = np.asarray(rxx, np.float64)
    rxy = np.asarray(rxy, np.float64)
    n = len(rxy)
    return levinson(rxx[:n], rxx[:n], rxy)


def r2R(r) -> jax.Array:
    """Autocorrelation vector -> Hermitian Toeplitz autocorrelation matrix
    R[i,j] = r[|i-j|] (conjugated above the diagonal for complex r,
    matching the reference).
    Parity: dsp::stats::r2R / tsd::stats::r_vers_R
    (/root/reference/core/include/dsp/stats.hpp:114)."""
    r = jnp.asarray(r)
    n = r.shape[-1]
    idx = jnp.arange(n)[:, None] - jnp.arange(n)[None, :]
    R = r[..., jnp.abs(idx)]      # (..., n, n), gathered on the last axis
    if jnp.iscomplexobj(r):
        R = jnp.where(idx < 0, jnp.conj(R), R)
    return R


def covmtx(x: jax.Array, m: int) -> jax.Array:
    """Sample covariance matrix of sliding windows of length m (parity:
    tsd::stats::covmtx)."""
    x = jnp.asarray(x)
    n = x.shape[-1]
    nw = n - m + 1
    # hop-1 sliding windows as m static shifted slices (an index-array
    # take here lowers to an element-rate gather on TPU)
    W = jnp.stack([jax.lax.slice_in_dim(x, k, k + nw, axis=-1)
                   for k in range(m)], axis=-1)  # (nw, m)
    # R = E[w w^H]: R[a,b] = E[x[i+a] conj(x[i+b])] — a tone at +f then has
    # eigenvector exp(+2 pi i f k), matching the MUSIC steering convention
    return (W.T @ jnp.conj(W)) / nw


def subspace_spectrum(R: jax.Array, Ns: int, Nf: int = 512,
                      steering: Optional[Callable] = None
                      ) -> Tuple[jax.Array, jax.Array]:
    """MUSIC pseudo-spectrum from a covariance matrix.

    Returns (grid, spectrum_db).  ``steering(f, m)`` maps a grid value to an
    m-element steering vector; default is the Fourier vector exp(2 pi i f k)
    over f in [-1/2, 1/2) (parity: subspace_spectrum, stats.cc:143-236).
    """
    R = jnp.asarray(R, complex_dtype)
    m = R.shape[0]
    assert Ns < m
    w, V = jnp.linalg.eigh(R)  # ascending eigenvalues
    noise = V[:, : m - Ns]     # noise subspace
    grid = jnp.linspace(-0.5, 0.5 - 1.0 / Nf, Nf)
    if steering is None:
        k = jnp.arange(m)
        A = jnp.exp(2j * jnp.pi * grid[:, None] * k[None, :])
    else:
        A = jnp.stack([steering(float(f), m) for f in np.asarray(grid)])
    # S(f) = 1 / sum_j |a(f)^H v_j|^2  over noise eigenvectors
    proj = jnp.abs(jnp.conj(A) @ noise) ** 2  # (Nf, m-Ns)
    S = 1.0 / (jnp.sum(proj, axis=-1) + 1e-30)
    return grid, 10.0 * jnp.log10(S)


def psd_subspace(x: jax.Array, Ns: int, Nf: int = 512,
                 m: int = 0) -> Tuple[jax.Array, jax.Array]:
    """High-resolution line spectrum by MUSIC on the signal covariance
    (parity: psd_sousesp, stats.cc:240-255)."""
    if m == 0:
        m = min(x.shape[-1] // 2, 64)
    R = covmtx(x, m)
    return subspace_spectrum(R, Ns, Nf)
