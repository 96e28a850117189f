"""Polyphase-FFT channelizer: split a wideband signal into M uniformly
spaced channels, each decimated by M, in one shot.

The reference declares channelization (canalise/décanalise,
core/src/telecom/canalisation/canalisation.cc) but its polyphase-FFT path
is legacy/commented-out; only the single-channel TranspoBB is live.  This
is the completed TPU-first design: the polyphase partition is a reshape +
batched FIR, and the channel separation is ONE batched FFT across the
polyphase branches — all MXU/FFT-friendly, no per-channel loops.

y[m, c] = channel c at decimated time m, centered at f_c = c/M.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..block import Block
from ..config import complex_dtype, real_dtype
from ..ops.fir_design import fir_lowpass

__all__ = ["Channelizer", "channelize", "dechannelize"]


class Channelizer(Block):
    """M-channel critically sampled polyphase-FFT analysis bank.

    Prototype lowpass h (length K*M) is partitioned into M branches
    P[p, j] = h[j*M + p]; input phases x_p[m] = x[m*M - p] run through the
    branches and an M-point IFFT across p yields all channels at once.
    """

    P: jax.Array     # (M, K) polyphase branch taps
    M: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, M: int, taps_per_branch: int = 8,
               h: Optional[np.ndarray] = None) -> "Channelizer":
        if h is None:
            h = fir_lowpass(M * taps_per_branch, 0.5 / M, "hn") * M
        K = len(h) // M
        h = np.asarray(h[: K * M], np.float64)
        P = h.reshape(K, M).T  # P[p, j] = h[j*M + p]
        return cls(P=jnp.asarray(P, real_dtype), M=M)

    @property
    def ratio(self):
        return 1.0 / self.M

    def init(self):
        K = self.P.shape[1]
        return dict(
            hist=jnp.zeros((2, self.M, K - 1), real_dtype),
            raw=jnp.zeros((2, self.M - 1), real_dtype),  # last M-1 samples
        )

    def step(self, state, x: jax.Array):
        """x: (n,) with n % M == 0 -> (n//M, M) channel matrix."""
        M = self.M
        K = self.P.shape[1]
        n = x.shape[-1]
        assert n % M == 0
        m = n // M
        xc = x.astype(complex_dtype)
        # polyphase decomposition: branch p takes x[m*M - p].
        # x[mM - p] = x[(m-1)M + (M-p)]; the m=0 row for p>=1 needs the last
        # M-1 samples of the PREVIOUS block (carried in state)
        Xf = xc.reshape(m, M)               # Xf[m, q] = x[mM + q]
        b0 = Xf[:, 0:1]
        prev_raw = (state["raw"][0] + 1j * state["raw"][1]).astype(
            complex_dtype)                   # x[-(M-1)..-1] of the stream
        first_row = prev_raw[::-1][None, :]  # [p-1] = x[-p]
        bp = jnp.concatenate([first_row, Xf[:-1, 1:][:, ::-1]], axis=0)
        B = jnp.concatenate([b0, bp], axis=1)  # (m, M): B[m, p] = x[mM - p]
        # FIR each branch over time with carried history
        hist = (state["hist"][0] + 1j * state["hist"][1]).astype(
            complex_dtype)                   # (M, K-1)
        Bt = B.T  # (M, m)
        full = jnp.concatenate([hist, Bt], axis=1)  # (M, K-1+m)
        idx = jnp.arange(m)[None, :, None] + jnp.arange(K)[None, None, :]
        win = full[jnp.arange(M)[:, None, None], idx]  # (M, m, K)
        taps = jnp.flip(self.P, axis=1)  # conv: newest sample * h[0]
        Y = jnp.einsum("pmk,pk->pm", win, taps.astype(complex_dtype))
        # channel separation: IFFT across branches
        ch = jnp.fft.ifft(Y, axis=0) * M  # (M, m)
        new_hist = full[:, -(K - 1):]
        new_state = dict(
            hist=jnp.stack([jnp.real(new_hist), jnp.imag(new_hist)]),
            raw=jnp.stack([jnp.real(xc[-(M - 1):]),
                           jnp.imag(xc[-(M - 1):])]),
        )
        return new_state, ch.T

    def frequencies(self) -> np.ndarray:
        """Channel center frequencies (normalized)."""
        f = np.arange(self.M) / self.M
        return np.where(f >= 0.5, f - 1.0, f)


def channelize(x: jax.Array, M: int, taps_per_branch: int = 8) -> jax.Array:
    """One-shot channelization -> (n//M, M)."""
    c = Channelizer.create(M, taps_per_branch)
    from ..block import pad_to_multiple
    xp = pad_to_multiple(x, M, axis=x.ndim - 1)
    _, y = c.step(c.init(), xp)
    return y


def dechannelize(ch: jax.Array, M: int, taps_per_branch: int = 8) -> jax.Array:
    """Synthesis bank: reassemble the wideband signal from channels
    (perfect only up to the prototype's stop-band leakage)."""
    # simple synthesis: FFT across channels, upsample branches, polyphase
    # interp with the same prototype
    m = ch.shape[0]
    Y = jnp.fft.fft(ch.T, axis=0)  # (M, m)
    # zero-stuff each branch to rate M and filter with branch p of h
    c = Channelizer.create(M, taps_per_branch)
    K = c.P.shape[1]
    out = jnp.zeros((m * M,), complex_dtype)
    for p in range(M):
        b = Y[p]
        # branch filter (time-domain conv, K small)
        hist = jnp.concatenate([jnp.zeros(K - 1, complex_dtype), b])
        idx = jnp.arange(m)[:, None] + jnp.arange(K)[None, :]
        win = hist[idx]
        taps = jnp.flip(c.P[p]).astype(complex_dtype)
        fb = win @ taps
        out = out.at[p::M].set(fb)
    return out
