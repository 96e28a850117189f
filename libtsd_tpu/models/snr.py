"""SNR estimators (parity: core/src/telecom/snr.cc).

Vectorized block estimators; the reference's per-sample exponential moment
trackers become first-order recursions via associative scan.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import real_dtype
from ..ops.filter_rt import _first_order_scan

__all__ = ["snr_matzner", "snr_bpsk_abs", "MatznerTracker"]


def snr_matzner(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Matzner M2/M4 moment SNR estimator over a block; returns (S, N)
    powers (parity: Matzner, snr.cc:9-43 with ke=1, kn=2 i.e. constant
    modulus constellations)."""
    e2 = jnp.mean(jnp.abs(x) ** 2, axis=-1)
    e4 = jnp.mean(jnp.abs(x) ** 4, axis=-1)
    S = jnp.sqrt(jnp.maximum(2 * e2 * e2 - e4, 0.0))
    N = e2 - S
    return S, N


def snr_bpsk_abs(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """|real| based estimator for BPSK (parity: BPSKAbsSNREstimator,
    snr.cc:45-90): S = mean(|re|)^2, N = E|x|^2 - S."""
    m = jnp.mean(jnp.abs(jnp.real(x)), axis=-1)
    e2 = jnp.mean(jnp.abs(x) ** 2, axis=-1)
    S = m * m
    N = jnp.maximum(e2 - S, 1e-30)
    return S, N


class MatznerTracker:
    """Streaming Matzner estimator with forget factor gamma — returns
    per-sample S and N tracks (parity: Matzner::step's exponential
    averaging, snr.cc:9-43), computed in log-depth with an associative
    scan.

    Reference-parity NaN behavior (default): wherever 2*e2^2 - e4 goes
    negative the reference's sqrt returns NaN and so do we.  That happens
    (a) during warm-up from zero state (first sample:
    gamma*e2i^2*(2*gamma - 1) < 0 for gamma < 0.5 — golden-diffed against
    the binary in tests/test_golden_ref3.py), and (b) INDEFINITELY on
    noise-dominated input, where E|x|^4 = 2(E|x|^2)^2 exactly for complex
    Gaussian noise, so the statistic fluctuates around zero and roughly
    half the samples are NaN at very low SNR — a property of the
    estimator itself, not just a transient.  Pass ``clamp=True`` for a
    monitoring-friendly variant that floors S at 0 (like the block
    ``snr_matzner``) at the cost of exact reference parity."""

    def __init__(self, gamma: float = 0.1, clamp: bool = False):
        self.gamma = gamma
        self.clamp = clamp

    def step(self, state, x: jax.Array):
        e2_0, e4_0 = state
        g = self.gamma
        e2i = jnp.abs(x) ** 2
        e4i = e2i * e2i
        e2 = _first_order_scan(1 - g, g * e2i, e2_0)
        e4 = _first_order_scan(1 - g, g * e4i, e4_0)
        stat = 2 * e2 * e2 - e4
        if self.clamp:
            S = jnp.sqrt(jnp.maximum(stat, 0.0))
        else:
            S = jnp.sqrt(stat)      # NaN where negative, like the ref
        N = e2 - S
        return (e2[..., -1], e4[..., -1]), (S, N)

    def init(self):
        return (jnp.zeros((), real_dtype), jnp.zeros((), real_dtype))
