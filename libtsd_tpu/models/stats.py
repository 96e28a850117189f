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
    "mdl_criterion", "mdl_source_count", "subspace_spectrum", "psd_subspace",
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
    """Autocorrelation (Toeplitz) covariance matrix, built exactly as the
    reference does: unbiased xcorr positive lags -> Hermitian Toeplitz
    (parity: tsd::stats::covmtx, stats.hpp:146-156 = r_vers_R(xcorr(x,x,m)
    .tail(m))).

    NOTE a reference code-vs-doc mismatch we reproduce on purpose: the
    reference docstring claims R_ij = E[x_{.+i} x*_{.+j}], but its xcorr
    computes c(tau) = sum_k x(k) conj(x(k+tau)) (frequency-reversed
    product, fourier.cc:491-502), so the matrix actually built is the
    CONJUGATE, R_ij = E[x*_{.+i} x_{.+j}].  Consequence: a tone at +f has
    signal-subspace eigenvector exp(-2 pi i f k), so the MUSIC spectrum
    from this matrix peaks at the MIRRORED frequency -f — exactly like the
    reference binary (golden-diffed in tests/test_golden_ref3.py)."""
    from ..ops.corr import xcorr
    _, c = xcorr(jnp.asarray(x), None, m)   # unbiased, lags -(m-1)..m-1
    return r2R(c[..., m - 1:])              # lags 0..m-1


def mdl_criterion(R) -> Tuple[np.ndarray, int]:
    """MDL source-count criterion over a covariance matrix, EXACTLY as the
    reference computes it (parity: subspace_spectrum Ns==-1 branch,
    stats.cc:148-187, after Williams, "Detection: Determining the Number
    of Sources", DSP Handbook).

    Returns (vmdl, Ns_ref): the criterion vector vmdl[k-1] for k = 1..m-1
    candidate sources, and the reference's selection Ns_ref.

    TWO REFERENCE DEFECTS reproduced on purpose (golden-diffed against the
    binary in tests/test_golden_ref4.py):
    * the formula deviates from Williams' MDL — the reference expands
      ``-N*(somme - (Ns-m)*(-log(m-Ns) + somme))`` (stats.cc:174), which
      is NOT -N*(m-Ns)*log(GM/AM); it also fixes N (number of snapshots)
      to m, the matrix dimension (stats.cc:168 "à confirmer");
    * the selection takes ``index_max`` of the criterion (stats.cc:180)
      although MDL selects a MINIMUM — and with the mis-expanded formula
      NEITHER extremum recovers the true source count (measured: two
      clean tones in a 12x12 covariance give argmax=1, argmin=11).
      ``subspace_spectrum(Ns=-1)`` therefore uses the correct Wax-Kailath
      MDL (:func:`mdl_source_count`) — a documented improvement; this
      function exists for the golden diff and returns Ns_ref = what the
      reference binary would pick.
    """
    R = np.asarray(R)
    m = R.shape[0]
    w = np.linalg.eigvalsh(R)            # ascending
    la = np.abs(w[::-1]).astype(np.float64)   # descending magnitude
    N = m                                 # reference: N = m (stats.cc:168)
    vmdl = np.zeros(m - 1, np.float64)
    for k in range(1, m):
        somme = float(np.log(la[k:]).sum())
        vmdl[k - 1] = (-N * (somme - (k - m) * (-np.log(m - k) + somme))
                       + 0.5 * k * (2 * m - k) * np.log(N))
    return vmdl.astype(np.float32), int(np.argmax(vmdl) + 1)


def mdl_source_count(R, n_obs: Optional[int] = None
                     ) -> Tuple[int, np.ndarray]:
    """Correct MDL source-count estimate (Wax & Kailath 1985; the formula
    the reference's stats.cc:148-187 cites via Williams but mis-expands —
    see :func:`mdl_criterion`).

    MDL(k) = -N (m-k) log(GM_k / AM_k) + 0.5 k (2m-k) log N, with GM/AM
    the geometric/arithmetic means of the m-k smallest eigenvalues;
    the estimate is argmin_k MDL(k).  Returns (Ns, criterion)."""
    R = np.asarray(R)
    m = R.shape[0]
    N = int(n_obs) if n_obs else m
    la = np.abs(np.linalg.eigvalsh(R)[::-1]).astype(np.float64)
    la = np.maximum(la, 1e-30)
    crit = np.zeros(m, np.float64)
    for k in range(m):
        noise = la[k:]
        gm = np.exp(np.mean(np.log(noise)))
        am = np.mean(noise)
        crit[k] = (-N * (m - k) * np.log(gm / am)
                   + 0.5 * k * (2 * m - k) * np.log(N))
    return int(np.argmin(crit)), crit.astype(np.float32)


def subspace_spectrum(R: jax.Array, Ns: int, Nf: int = 512,
                      steering: Optional[Callable] = None,
                      debug: bool = False,
                      ) -> Tuple[jax.Array, jax.Array]:
    """MUSIC pseudo-spectrum from a covariance matrix.

    Returns (grid, spectrum_db).  ``steering(f, m)`` maps a grid value to an
    m-element steering vector; default is the Fourier vector exp(2 pi i f k)
    over f in [-1/2, 1/2) (parity: subspace_spectrum, stats.cc:143-236).

    Ns = -1 selects the source count automatically by the (corrected)
    Wax-Kailath MDL criterion — the reference's auto path
    (stats.cc:148-187) mis-expands the formula and takes the wrong
    extremum; see :func:`mdl_criterion` / :func:`mdl_source_count`.
    ``debug=True`` additionally shows the eigenvalue + MDL figures like
    the reference's ``debug_actif`` (stats.cc:182-190).
    """
    R = jnp.asarray(R, complex_dtype)
    m = R.shape[0]
    if Ns == -1:
        Ns, crit = mdl_source_count(np.asarray(R))
        Ns = max(Ns, 1)                  # keep >=1 noise-subspace split
        if debug:
            from ..viz.figure import Figures
            la = np.abs(np.linalg.eigvalsh(np.asarray(R))[::-1])
            figs = Figures()
            f1 = figs.subplot()
            f1.plot(10 * np.log10(np.maximum(la, 1e-30)))
            f1.titles("Eigenvalues (log)", "index", "dB")
            f2 = figs.subplot()
            f2.plot(np.arange(m), crit)
            f2.titles("MDL criterion", "source count", "MDL")
            figs.show("MDL")
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
