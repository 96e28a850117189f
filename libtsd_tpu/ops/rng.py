"""Random signal generation (JAX PRNG).

Parity: tsd.hpp:1001-1092 (randn/randu/randb/randi, global generator).  The
reference uses a mutable global std::mt19937; JAX is functional, so the
explicit-key API is primary and a convenience stateful wrapper mirrors the
reference's global-generator ergonomics for scripts/tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import complex_dtype, int_dtype, real_dtype

__all__ = ["randn", "randcn", "randu", "randb", "randi", "Rng", "default_rng", "seed"]


def randn(key, n, *shape) -> jax.Array:
    """Standard normal, float32 (parity: tsd::randn)."""
    return jax.random.normal(key, (n, *shape), dtype=real_dtype)


def randcn(key, n, *shape) -> jax.Array:
    """Circular complex normal with unit total variance (parity: tsd::randcn:
    real and imaginary parts each N(0, 1/2))."""
    k1, k2 = jax.random.split(key)
    s = 1.0 / jnp.sqrt(2.0)
    re = jax.random.normal(k1, (n, *shape), dtype=real_dtype) * s
    im = jax.random.normal(k2, (n, *shape), dtype=real_dtype) * s
    return (re + 1j * im).astype(complex_dtype)


def randu(key, n, *shape, lo: float = -1.0, hi: float = 1.0) -> jax.Array:
    """Uniform in [lo, hi) — the reference's randu(n) is uniform in [-1,1]
    (tsd.hpp:1018)."""
    return jax.random.uniform(key, (n, *shape), dtype=real_dtype, minval=lo, maxval=hi)


def randb(key, n, *shape) -> jax.Array:
    """Random bits 0/1, float32 per the reference's Vecb (parity: tsd::randb)."""
    return jax.random.bernoulli(key, 0.5, (n, *shape))


def randi(key, M: int, n, *shape) -> jax.Array:
    """Uniform integers in [0, M) (parity: tsd::randi)."""
    return jax.random.randint(key, (n, *shape), 0, M, dtype=int_dtype)


class Rng:
    """Stateful convenience wrapper splitting a JAX key on each draw —
    ergonomic equivalent of the reference's ``generateur_aleatoire`` global."""

    def __init__(self, seed: int = 0):
        # lazy: creating a PRNGKey materializes a device array, which would
        # initialize the XLA backend at import time and break
        # jax.distributed.initialize (parallel/launch.py)
        self._seed = seed
        self._key = None

    def next_key(self):
        if self._key is None:
            self._key = jax.random.PRNGKey(self._seed)
        self._key, sub = jax.random.split(self._key)
        return sub

    def randn(self, n, *shape):
        return randn(self.next_key(), n, *shape)

    def randcn(self, n, *shape):
        return randcn(self.next_key(), n, *shape)

    def randu(self, n, *shape, lo=-1.0, hi=1.0):
        return randu(self.next_key(), n, *shape, lo=lo, hi=hi)

    def randb(self, n, *shape):
        return randb(self.next_key(), n, *shape)

    def randi(self, M, n, *shape):
        return randi(self.next_key(), M, n, *shape)


default_rng = Rng(0)


def seed(s: int):
    """Re-seed the global convenience generator."""
    global default_rng
    default_rng = Rng(s)
    return default_rng
