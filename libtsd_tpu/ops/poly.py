"""Polynomials and rational transfer functions (design-time, host numpy).

Parity: core/include/tsd/filtrage/frat.hpp (Poly<T>/FRat<T>) and
core/src/filtrage/frat.cc (roots via companion matrix).  JAX tracing subsumes
the reference's expression templates; what remains useful at design time is
root finding, evaluation, and the coefficient<->root conversions, which numpy
provides directly — thin wrappers keep the reference's conventions
(coefficients in ascending power order, like Poly<T>::coefs).
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "poly_roots", "poly_from_roots", "horner", "polymul", "polyadd",
    "chebyshev_T", "chebyshev_U", "freq_response_ba", "group_delay_ba",
]


def poly_roots(coefs: np.ndarray) -> np.ndarray:
    """Roots of a polynomial given ascending-order coefficients (parity:
    Poly::roots via companion-matrix eigensolver, frat.cc:40-86)."""
    c = np.trim_zeros(np.asarray(coefs), "b")
    if len(c) <= 1:
        return np.array([], complex)
    return np.roots(c[::-1])


def poly_from_roots(roots: np.ndarray) -> np.ndarray:
    """Ascending-order coefficients from roots (monic)."""
    return np.poly(np.asarray(roots))[::-1]


def horner(coefs: np.ndarray, x):
    """Evaluate ascending-order polynomial at x (parity: horner,
    frat.hpp)."""
    acc = np.zeros_like(np.asarray(x), dtype=np.result_type(coefs, x))
    for c in np.asarray(coefs)[::-1]:
        acc = acc * x + c
    return acc


def polymul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.convolve(a, b)


def polyadd(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    n = max(len(a), len(b))
    out = np.zeros(n, dtype=np.result_type(a, b))
    out[: len(a)] += a
    out[: len(b)] += b
    return out


def chebyshev_T(n: int) -> np.ndarray:
    """Chebyshev polynomial of the first kind, ascending coefficients
    (parity: Chebychev_T, core/src/divers.cc:55-91)."""
    t0 = np.array([1.0])
    t1 = np.array([0.0, 1.0])
    if n == 0:
        return t0
    for _ in range(n - 1):
        t2 = polyadd(np.concatenate([[0.0], 2 * t1]), -t0)
        t0, t1 = t1, t2
    return t1


def chebyshev_U(n: int) -> np.ndarray:
    """Chebyshev polynomial of the second kind (parity: Chebychev_U)."""
    t0 = np.array([1.0])
    t1 = np.array([0.0, 2.0])
    if n == 0:
        return t0
    for _ in range(n - 1):
        t2 = polyadd(np.concatenate([[0.0], 2 * t1]), -t0)
        t0, t1 = t1, t2
    return t1


def freq_response_ba(b: np.ndarray, a: np.ndarray,
                     f: np.ndarray) -> np.ndarray:
    """H(e^{2 pi i f}) for coefficients in z^-1 (b, a descending delays:
    b[0] + b[1] z^-1 + ...) — the digital-filter convention of the runtime."""
    z = np.exp(-2j * np.pi * np.asarray(f, float))
    num = horner(np.asarray(b), z)
    den = horner(np.asarray(a), z)
    return num / den


def group_delay_ba(b: np.ndarray, a: np.ndarray,
                   f: np.ndarray) -> np.ndarray:
    """Group delay in samples via the derivative-of-phase ramp trick."""
    f = np.asarray(f, float)
    df = 1e-5
    h0 = freq_response_ba(b, a, f - df / 2)
    h1 = freq_response_ba(b, a, f + df / 2)
    dphi = np.angle(h1 * np.conj(h0))
    return -dphi / (2 * np.pi * df)
