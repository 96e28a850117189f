"""Direction of arrival: steering vectors, sensor covariance, 1-D MUSIC.

Parity: core/src/apps/doa.cc:17-84, core/include/tsd/apps/doa.hpp:25-48.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import complex_dtype, real_dtype
from .stats import subspace_spectrum

__all__ = ["steervec_1d", "sensorcov_1d", "musicdoa_1d"]


def steervec_1d(pos: jax.Array, angle: jax.Array) -> jax.Array:
    """Steering matrix A[i, j] = exp(i * pos_i * cos(angle_j)) for a linear
    array; pos in radians-per-wavelength units (parity: steervec_1d,
    stats.cc:258-268)."""
    pos = jnp.asarray(pos, real_dtype)
    angle = jnp.asarray(angle, real_dtype)
    return jnp.exp(1j * pos[:, None] * jnp.cos(angle)[None, :]).astype(
        complex_dtype)


def sensorcov_1d(pos: jax.Array, angle: jax.Array,
                 snr_db: float = 20.0) -> jax.Array:
    """Ideal sensor covariance R = A A^H + sigma^2 I for unit-power sources
    (parity: sensorcov_1d, stats.cc:270-281 — note the reference adds
    db2pow(SNR) * I; we add the NOISE power 10^(-snr/10) * I, which is the
    physically meaningful convention)."""
    A = steervec_1d(pos, angle)
    Nr = A.shape[0]
    noise = 10.0 ** (-snr_db / 10.0)
    return A @ jnp.conj(A).T + noise * jnp.eye(Nr, dtype=complex_dtype)


def musicdoa_1d(R: jax.Array, d: float, Ns: int,
                Nf: int = 512) -> jax.Array:
    """1-D MUSIC DOA for an equispaced linear array with spacing d (in
    wavelengths); returns the Ns strongest arrival angles in radians
    (parity: musicdoa_1d, stats.cc:283-330).

    The scan angle phi in [0, pi] maps to spatial frequency d*cos(phi).
    """
    R = jnp.asarray(R, complex_dtype)
    m = R.shape[0]
    w, V = jnp.linalg.eigh(R)
    noise = V[:, : m - Ns]
    phis = jnp.linspace(0.0, jnp.pi, Nf)
    k = jnp.arange(m)
    A = jnp.exp(2j * jnp.pi * (d * jnp.cos(phis))[:, None] * k[None, :]
                ).astype(complex_dtype)
    proj = jnp.abs(jnp.conj(A) @ noise) ** 2
    S = 1.0 / (jnp.sum(proj, axis=-1) + 1e-30)
    # peak picking: top-Ns local maxima
    left = jnp.concatenate([S[:1] * 0, S[:-1]])
    right = jnp.concatenate([S[1:], S[-1:] * 0])
    is_peak = (S > left) & (S >= right)
    Sm = jnp.where(is_peak, S, 0.0)
    order = jnp.argsort(-Sm)[:Ns]
    return phis[order]
