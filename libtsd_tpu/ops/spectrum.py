"""Real-time spectrum analyzer: streaming block spectrum with averaging,
windowing, and optional sub-band sweep.

Parity: rt_spectrum / SpectrumConfig, core/src/fourier/fourier.cc:1150-1337,
core/include/tsd/fourier.hpp:908-957.  The reference's one multithreaded
spot (OpenMP over sub-FFTs, fourier.cc:1242-1248) becomes a batched FFT —
trivially parallel on TPU.
"""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
from flax import struct

from ..block import Block
from ..config import complex_dtype, real_dtype
from .window import window as make_window

__all__ = ["SpectrumConfig", "RtSpectrum"]


@dataclasses.dataclass(frozen=True)
class SpectrumConfig:
    """Parity: SpectrumConfig, fourier.hpp:908-949."""
    N: int = 1024             # FFT size
    navg: int = 4             # exponential averaging factor (blocks)
    window: str = "hn"
    nsubs: int = 1            # sub-FFT batching (sweep / parallel)


class RtSpectrum(Block):
    """step(state, x) -> (state, spectrum) where x length is a multiple of
    N; spectrum is the exponentially averaged, fftshifted power spectrum
    in dB."""

    win: jax.Array
    cfg: SpectrumConfig = struct.field(pytree_node=False)

    @classmethod
    def create(cls, cfg: SpectrumConfig) -> "RtSpectrum":
        w = make_window(cfg.window, cfg.N, sym=False)
        return cls(win=jnp.asarray(w, real_dtype), cfg=cfg)

    def init(self):
        return jnp.zeros((self.cfg.N,), real_dtype)  # averaged power

    def step(self, state, x: jax.Array):
        N = self.cfg.N
        n = x.shape[-1]
        assert n % N == 0, "input must be a multiple of N"
        frames = x.reshape(*x.shape[:-1], n // N, N)
        X = jnp.fft.fft(frames.astype(complex_dtype) * self.win, axis=-1)
        P = jnp.fft.fftshift(jnp.mean(jnp.abs(X) ** 2, axis=-2), axes=-1)
        g = 1.0 / self.cfg.navg
        avg = (1 - g) * state + g * P
        return avg, 10.0 * jnp.log10(avg + 1e-30)
