"""BER measurement tooling: bit alignment by correlation, error counting,
M-PSK phase-ambiguity resolution.

Parity: cmp_bits / cmp_bits_psk (core/include/tsd/telecom.hpp:1745-1792,
impl in telecom.cc / tests).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["cmp_bits", "cmp_bits_psk", "cmp_bits_rot", "ber_count"]


def _align_bits(a: np.ndarray, b: np.ndarray, max_lag: int = 256):
    """Best integer lag of b relative to a via +-1 correlation."""
    aa = 2.0 * a - 1
    bb = 2.0 * b - 1
    nmax = min(len(aa), len(bb))
    best = (0, -1e30)
    for lag in range(-max_lag, max_lag + 1):
        if lag >= 0:
            x, y = aa[lag:nmax], bb[: nmax - lag]
        else:
            x, y = aa[: nmax + lag], bb[-lag:nmax]
        if len(x) < 8:
            continue
        c = float(np.dot(x, y)) / len(x)
        if c > best[1]:
            best = (lag, c)
    return best[0]


def ber_count(a: jax.Array, b: jax.Array) -> Tuple[float, int]:
    """Error rate + count over the common length (no alignment)."""
    n = min(a.shape[0], b.shape[0])
    errs = int(jnp.sum(a[:n].astype(jnp.int32) ^ b[:n].astype(jnp.int32)))
    return errs / max(n, 1), errs


def cmp_bits(tx: jax.Array, rx: jax.Array,
             max_lag: int = 256) -> Tuple[float, int, int]:
    """Align rx to tx by correlation, count bit errors.
    Returns (ber, nerrs, lag).  Parity: cmp_bits, telecom.hpp:1745."""
    a = np.asarray(tx, np.int8)
    b = np.asarray(rx, np.int8)
    lag = _align_bits(a, b, max_lag)
    if lag >= 0:
        x, y = a[lag:], b[: len(a) - lag]
    else:
        x, y = a[: len(a) + lag], b[-lag:]
    n = min(len(x), len(y))
    errs = int(np.sum(x[:n] != y[:n]))
    return errs / max(n, 1), errs, lag


def cmp_bits_psk(tx: jax.Array, rx: jax.Array, k: int,
                 max_lag: int = 256) -> Tuple[float, int, int]:
    """Like cmp_bits but resolves the M-PSK phase ambiguity: tries all M
    constellation rotations of the received symbol indices and keeps the
    best (parity: cmp_bits_psk, telecom.hpp:1760-1792)."""
    from .waveform import bits_to_symbol_indices, symbol_indices_to_bits
    M = 1 << k
    a = np.asarray(tx, np.int8)
    best = None
    rxi = np.asarray(bits_to_symbol_indices(jnp.asarray(rx), k))
    nrx = len(np.asarray(rx))
    for rot in range(M):
        ri = (rxi + rot) % M
        rb = np.asarray(symbol_indices_to_bits(jnp.asarray(ri), k), np.int8)
        # trim back to the original rx length: bits_to_symbol_indices
        # zero-pads a partial trailing symbol, and under a nonzero
        # rotation the PAD symbol maps to nonzero garbage bits that
        # would count as extra errors for rotations != 0 only (biasing
        # the best-rotation pick)
        rb = rb[:nrx]
        ber, errs, lag = cmp_bits(a, jnp.asarray(rb), max_lag)
        # initialize from the FIRST measurement: a strict < against a
        # sentinel returned a bogus 2^30 error count whenever every
        # rotation measured BER exactly 1.0 (cmp_bits_rot's comment
        # documents this very bug)
        if best is None or ber < best[0]:
            best = (ber, errs, lag)
    return best


def cmp_bits_rot(tx: jax.Array, rx_syms: np.ndarray, wf,
                 max_lag: int = 256,
                 rotations: int = 4) -> Tuple[float, int, int]:
    """Resolve the GEOMETRIC rotational ambiguity of a blind carrier
    loop on an arbitrary constellation (e.g. square QAM with the
    reference's per-axis binary mapping, modulations.cc:490 — where a
    90-degree lock is NOT an index rotation, so cmp_bits_psk cannot
    undo it): rotate the received symbols by each multiple of
    2*pi/rotations, re-decide on wf, and keep the best bit alignment.

    rx_syms: converged received symbols (host array, already masked).
    Returns (ber, nerrs, lag) of the best rotation."""
    from .waveform import symbol_indices_to_bits
    k = wf.info.k
    s = np.asarray(rx_syms)
    best = None
    for r in range(rotations):
        sr = jnp.asarray(s * np.exp(2j * np.pi * r / rotations))
        idx = wf.closest(sr)
        rb = symbol_indices_to_bits(idx, k)
        out = cmp_bits(tx, rb, max_lag)
        # initialize from the FIRST measurement (None sentinel): a
        # strict < against a numeric placeholder returned a bogus
        # nerrs=2^30 when every rotation measured BER exactly 1.0
        if best is None or out[0] < best[0]:
            best = out
    return best
