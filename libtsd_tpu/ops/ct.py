"""Sampled continuous-time functions and their Fourier transforms.

Parity: core/include/tsd/ct.hpp:16-122, core/src/ct.cc
(FonctionEchantillonnée / TF): represent a function sampled on a uniform
time grid, evaluate, resample, and compute its continuous-spectrum
approximation.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..config import complex_dtype, real_dtype

__all__ = ["SampledFunction", "sample_function", "dirichlet"]


@dataclasses.dataclass(frozen=True)
class SampledFunction:
    """A function sampled uniformly on [t0, t1] (parity:
    FonctionEchantillonnée)."""
    values: jax.Array
    t0: float
    t1: float

    @property
    def n(self) -> int:
        return self.values.shape[-1]

    @property
    def fs(self) -> float:
        return (self.n - 1) / (self.t1 - self.t0)

    def times(self) -> jax.Array:
        return jnp.linspace(self.t0, self.t1, self.n)

    def __call__(self, t) -> jax.Array:
        """Linear interpolation at arbitrary times."""
        t = jnp.asarray(t, real_dtype)
        pos = (t - self.t0) * self.fs
        i = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, self.n - 2)
        frac = pos - i
        return (1 - frac) * self.values[..., i] + frac * self.values[..., i + 1]

    def fourier(self) -> Tuple[jax.Array, jax.Array]:
        """Continuous FT approximation: (freqs_Hz, spectrum) with the
        dt scaling and phase reference at t0 (parity: TF, ct.cc)."""
        dt = 1.0 / self.fs
        X = jnp.fft.fftshift(jnp.fft.fft(self.values)) * dt
        f = jnp.fft.fftshift(jnp.fft.fftfreq(self.n, dt))
        # phase reference: samples start at t0
        X = X * jnp.exp(-2j * jnp.pi * f * self.t0).astype(complex_dtype)
        return f.astype(real_dtype), X

    def energy(self) -> jax.Array:
        return jnp.sum(jnp.abs(self.values) ** 2) / self.fs


def sample_function(fn: Callable, t0: float, t1: float,
                    n: int) -> SampledFunction:
    """Sample fn on n points of [t0, t1] (parity: échantillonne)."""
    t = jnp.linspace(t0, t1, n)
    return SampledFunction(values=fn(t), t0=t0, t1=t1)


def dirichlet(N: int, omega) -> jax.Array:
    """Dirichlet kernel sin((N+1/2)w)/sin(w/2), value 2N+1 at w=0
    (parity: Dirichlet, core/src/divers.cc:21-37)."""
    w = jnp.mod(jnp.asarray(omega, real_dtype), 2 * jnp.pi)
    s = jnp.sin(w / 2)
    safe = jnp.abs(s) > 1e-7
    return jnp.where(safe,
                     jnp.sin((N + 0.5) * w) / jnp.where(safe, s, 1.0),
                     2.0 * N + 1.0)
