"""Constant-Q transform (CQT).

Parity: core/include/tsd/fourier/cqt.hpp:13-71, core/src/fourier/cqt.cc
(per-bin kernels with constant Q = fk/bandwidth, streaming decimation).

TPU design: the per-bin kernels (windowed complex exponentials of varying
length) are precomputed into one dense (nbins, Nmax) bank; analysis is a
single matmul of gathered signal frames against the bank — MXU-friendly,
no per-bin loops at runtime.
"""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from ..config import real_dtype

__all__ = ["CqtKernel", "cqt_kernel", "cqt", "cqt_freqs"]


@dataclasses.dataclass(frozen=True)
class CqtKernel:
    bank_re: np.ndarray    # (nbins, Nmax)
    bank_im: np.ndarray
    freqs: np.ndarray      # (nbins,)
    lengths: np.ndarray    # (nbins,)

    @property
    def Nmax(self) -> int:
        return self.bank_re.shape[1]


def cqt_freqs(fmin: float, fmax: float, bins_per_octave: int = 12
              ) -> np.ndarray:
    """Geometric frequency grid (parity: CQT bin layout, cqt.cc)."""
    noct = np.log2(fmax / fmin)
    nbins = int(np.floor(noct * bins_per_octave)) + 1
    return fmin * 2.0 ** (np.arange(nbins) / bins_per_octave)


def cqt_kernel(fmin: float, fmax: float, bins_per_octave: int = 12,
               window: str = "hn") -> CqtKernel:
    """Precompute the CQT kernel bank.  Frequencies are normalized
    (cycles/sample).  Each bin k has Q = 1/(2^(1/b)-1) periods, window
    length Nk = Q/fk, Hann windowed, centered in the common Nmax frame."""
    from .window import window as make_window
    freqs = cqt_freqs(fmin, fmax, bins_per_octave)
    Q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    lengths = np.minimum(np.ceil(Q / freqs).astype(int) | 1, 1 << 20)
    Nmax = int(lengths.max())
    nbins = len(freqs)
    bank = np.zeros((nbins, Nmax), np.complex128)
    for k in range(nbins):
        Nk = int(lengths[k])
        w = make_window(window, Nk, sym=True)
        t = np.arange(Nk) - Nk // 2
        ker = w * np.exp(-2j * np.pi * freqs[k] * t)
        ker /= np.sum(w)
        off = (Nmax - Nk) // 2
        bank[k, off:off + Nk] = ker
    return CqtKernel(bank_re=bank.real, bank_im=bank.imag,
                     freqs=freqs, lengths=lengths)


def cqt(x: jax.Array, kernel: CqtKernel, hop: int = 256) -> jax.Array:
    """CQT magnitude matrix: (nframes, nbins).  Frames centered every
    ``hop`` samples; one matmul against the kernel bank."""
    n = x.shape[-1]
    Nmax = kernel.Nmax
    xp = jnp.pad(x.astype(real_dtype) if not jnp.iscomplexobj(x)
                 else x, [(0, 0)] * (x.ndim - 1) + [(Nmax // 2, Nmax)])
    starts = np.arange(0, n, hop)
    idx = jnp.asarray(starts)[:, None] + jnp.arange(Nmax)[None, :]
    F = xp[..., idx]  # (nframes, Nmax)
    Br = jnp.asarray(kernel.bank_re, real_dtype)
    Bi = jnp.asarray(kernel.bank_im, real_dtype)
    hp = jax.lax.Precision.HIGHEST
    if jnp.iscomplexobj(F):
        Fr, Fi = jnp.real(F), jnp.imag(F)
        re = Fr @ Br.T - Fi @ Bi.T
        im = Fr @ Bi.T + Fi @ Br.T
    else:
        re = jnp.matmul(F, Br.T, precision=hp)
        im = jnp.matmul(F, Bi.T, precision=hp)
    return jnp.sqrt(re * re + im * im)
