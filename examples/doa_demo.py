#!/usr/bin/env python
"""Direction-of-arrival demo: MUSIC vs Capon/MVDR on a uniform linear
array, including the coherent-multipath case spatial smoothing exists for.

Scenario: a 16-element half-wavelength ULA receives
  (a) two INCOHERENT sources (independent envelopes) — MUSIC and Capon
      both localize them directly from the sample covariance;
  (b) a COHERENT pair (one signal plus its own delayed/attenuated
      multipath copy) — the signal subspace collapses to rank 1, the MDL
      source counter sees one source, and subspace methods need
      forward-backward spatial smoothing to restore the rank.

Everything runs in ONE jitted function per case (snapshot synthesis,
covariance, smoothing, MUSIC + Capon spectra and angle estimates).

Parity anchor: the reference's DOA surface (MUSIC only,
/root/reference/core/src/apps/doa.cc:17-84); spatial smoothing and the
Capon/MVDR spectrum are beyond-reference additions (models/doa.py).

Run:  PYTHONPATH=/root/repo python examples/doa_demo.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from libtsd_tpu.models import doa as DOA
from libtsd_tpu.models.stats import mdl_source_count

M, D, L, T = 16, 0.5, 10, 400
TRUE_DEG = (70.0, 110.0)


def steer(theta_deg):
    k = np.arange(M)
    return np.exp(2j * np.pi * D * np.cos(np.deg2rad(theta_deg)) * k)


def snapshots(coherent: bool, seed: int = 11) -> np.ndarray:
    """(M, T) complex snapshots for the two-source scene."""
    rng = np.random.default_rng(seed)
    c1 = (rng.standard_normal(T) + 1j * rng.standard_normal(T)) / 2 ** 0.5
    if coherent:
        # multipath: the SAME envelope arrives from both angles with a
        # fixed complex gain on the second path
        X = np.outer(steer(TRUE_DEG[0])
                     + 0.8 * np.exp(1j * 0.7) * steer(TRUE_DEG[1]), c1)
    else:
        c2 = (rng.standard_normal(T)
              + 1j * rng.standard_normal(T)) / 2 ** 0.5
        X = np.outer(steer(TRUE_DEG[0]), c1) + np.outer(steer(TRUE_DEG[1]), c2)
    X += 0.1 * (rng.standard_normal((M, T))
                + 1j * rng.standard_normal((M, T))) / 2 ** 0.5
    return X.astype(np.complex64)


@jax.jit
def estimate(X):
    """Sample covariance -> raw + smoothed MUSIC, Capon, eigenvalues."""
    R = X @ jnp.conj(X).T / X.shape[1]
    Rs = DOA.spatial_smoothing(R, L)
    music_raw = jnp.sort(DOA.musicdoa_1d(R, D, 2, Nf=2048))
    music_sm = jnp.sort(DOA.musicdoa_1d(Rs, D, 2, Nf=2048))
    capon = jnp.sort(DOA.capondoa_1d(R, D, 2, Nf=2048))
    ev_raw = jnp.linalg.eigvalsh(R)
    ev_sm = jnp.linalg.eigvalsh(Rs)
    return music_raw, music_sm, capon, ev_raw, ev_sm, Rs


def run_case(name: str, coherent: bool):
    X = snapshots(coherent)
    music_raw, music_sm, capon, ev_raw, ev_sm, Rs = estimate(jnp.asarray(X))
    n_raw = mdl_source_count(X @ X.conj().T / T, T)[0]
    n_sm = mdl_source_count(np.asarray(Rs), T)[0]
    print(f"--- {name} (true angles {TRUE_DEG[0]:.0f}/{TRUE_DEG[1]:.0f} deg)")
    print(f"  MDL source count: raw={n_raw}  smoothed={n_sm}")
    print(f"  MUSIC  raw     : {np.rad2deg(np.asarray(music_raw)).round(2)}")
    print(f"  MUSIC  smoothed: {np.rad2deg(np.asarray(music_sm)).round(2)}")
    print(f"  Capon/MVDR     : {np.rad2deg(np.asarray(capon)).round(2)}")
    err = np.abs(np.rad2deg(np.asarray(music_sm)) - np.asarray(TRUE_DEG))
    assert err.max() < 1.0, err
    return n_raw, n_sm


if __name__ == "__main__":
    n1_raw, n1_sm = run_case("incoherent sources", coherent=False)
    n2_raw, n2_sm = run_case("coherent multipath", coherent=True)
    assert (n1_raw, n1_sm) == (2, 2)
    assert (n2_raw, n2_sm) == (1, 2), "smoothing must restore the rank"
    print("OK: smoothing restored the coherent pair's rank (MDL 1 -> 2)")
