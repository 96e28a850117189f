"""LFSR / PRBS generation, self-synchronizing receiver, MLS & Barker codes.

Parity: core/src/telecom/prbs.cc (LFSRGenerateur :87-180, LFSRRecepteur
:180-280, code_mls :66-86, Barker codes), core/include/tsd/telecom/lfsr.hpp.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["primitive_poly", "lfsr_bits", "mls_code", "barker_code",
           "prbs_check"]

# maximal-period tap masks for the Fibonacci right-shift recurrence
# reg' = (reg >> 1) | (parity(reg & mask) << (n-1)) — these are the
# REFERENCE's masks (prbs.cc:pols_prim | 1, the implicit x^n term), so
# code_mls output is bit-identical (tests/test_golden_ref3.py); all
# brute-force verified to give period 2^n - 1
_PRIMITIVE = {
    2: 3, 3: 5, 4: 9, 5: 9, 6: 33, 7: 65, 8: 113, 9: 33, 10: 129,
    11: 513, 12: 801, 13: 5633, 14: 43, 15: 16385, 16: 45,
}

_BARKER = {
    2: [1, -1], 3: [1, 1, -1], 4: [1, 1, -1, 1], 5: [1, 1, 1, -1, 1],
    7: [1, 1, 1, -1, -1, 1, -1], 11: [1, 1, 1, -1, -1, -1, 1, -1, -1, 1, -1],
    13: [1, 1, 1, 1, 1, -1, -1, 1, 1, -1, 1, -1, 1],
}


def primitive_poly(reglen: int) -> int:
    """Primitive polynomial tap mask for a register of length reglen."""
    if reglen not in _PRIMITIVE:
        raise ValueError(f"no primitive polynomial stored for reglen={reglen}")
    return _PRIMITIVE[reglen]


def lfsr_bits(reglen: int, nbits: int, seed: int = 1,
              pol: int = 0) -> jax.Array:
    """Generate a PRBS via a Fibonacci LFSR (parity: LFSRGenerateur::step,
    prbs.cc:104-130: feedback = parity(reg & pol), output = feedback,
    reg = (reg >> 1) | (feedback << (reglen-1))).

    The register recurrence is tiny sequential host work — computed in
    numpy (a device scan would waste a compile on bit twiddling)."""
    if pol == 0:
        pol = primitive_poly(reglen)
    reg = seed & ((1 << reglen) - 1)
    if reg == 0:
        reg = 1
    bits = np.empty(nbits, np.int8)
    for i in range(nbits):
        s = bin(reg & pol).count("1") & 1
        bits[i] = s
        reg = (reg >> 1) | (s << (reglen - 1))
    return jnp.asarray(bits)


def mls_code(reglen: int) -> jax.Array:
    """Maximum-length sequence of length 2^reglen - 1 (parity: code_mls,
    prbs.cc:66-86 — LSB output convention)."""
    m = (1 << reglen) - 1
    pol = primitive_poly(reglen)

    bits = []
    reg = 1
    for _ in range(m):
        s = bin(reg & pol).count("1") & 1
        bits.append(reg & 1)          # POIDS_FAIBLE output
        reg = (reg >> 1) | (s << (reglen - 1))
    return jnp.asarray(bits, jnp.int8)


def barker_code(n: int) -> jax.Array:
    """Barker code of length n in +-1 (parity: code_Barker)."""
    if n not in _BARKER:
        raise ValueError(f"no Barker code of length {n}")
    return jnp.asarray(_BARKER[n], jnp.float32)


def prbs_check(bits: jax.Array, reglen: int, pol: int = 0) -> Tuple[float, int]:
    """Self-synchronizing PRBS error check: seed the register from the
    received bits themselves, then compare predicted vs received (parity:
    LFSRRecepteur, prbs.cc:180-280).  Returns (ber, nerrs) over the bits
    after the sync preamble."""
    if pol == 0:
        pol = primitive_poly(reglen)
    b = np.asarray(bits, np.int64)
    n = len(b)
    if n <= reglen:
        return 0.0, 0
    # build register from the first reglen received bits: the generator
    # emits the feedback bit then shifts it into the MSB, so the register
    # contents equal the last reglen outputs (newest at MSB)
    errs = 0
    total = 0
    reg = 0
    for i in range(reglen):
        reg = (reg >> 1) | (int(b[i]) << (reglen - 1))
    for i in range(reglen, n):
        pred = bin(reg & pol).count("1") & 1
        errs += int(pred != b[i])
        total += 1
        # self-synchronizing: inject the RECEIVED bit
        reg = (reg >> 1) | (int(b[i]) << (reglen - 1))
    return errs / max(total, 1), errs
