"""Spread spectrum: DSSS chip modulation and FHSS frequency hopping,
plus baseband transposition (channelization).

Parity: core/src/telecom/canalisation/etalement-spectre.cc (FHSS :13-63,
DSSS :93-160), transpo-bb.cc:15-70.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..block import Block
from ..config import complex_dtype, real_dtype
from ..ops.filter_rt import Fir, FirDecim
from ..ops.fir_design import fir_design_windowed
from ..ops.resample import FirUps

__all__ = ["dsss_modulate", "dsss_demodulate", "fhss_modulate",
           "TranspoBBConfig", "TranspoBB"]


def dsss_modulate(x: jax.Array, chips: jax.Array, osf_in: int = 1) -> jax.Array:
    """Direct-sequence spreading: upsample the symbol stream to the chip
    rate and multiply by the repeated chip sequence (parity:
    DSSSModulation, etalement-spectre.cc:93-160)."""
    chips = jnp.asarray(chips, real_dtype)
    nchips = chips.shape[0]
    assert nchips % osf_in == 0, "chips length must be a multiple of osf_in"
    rep = nchips // osf_in
    # rectangular interpolation (sample-and-hold) to the chip rate
    y = jnp.repeat(x, rep, axis=-1)
    n = y.shape[-1]
    seq = jnp.tile(chips, n // nchips + 1)[:n]
    return y * seq.astype(y.dtype)


def dsss_demodulate(y: jax.Array, chips: jax.Array, osf_in: int = 1) -> jax.Array:
    """Despread: multiply by the chip sequence and integrate over each
    symbol period."""
    chips = jnp.asarray(chips, real_dtype)
    nchips = chips.shape[0]
    rep = nchips // osf_in
    n = (y.shape[-1] // nchips) * nchips
    z = y[..., :n] * jnp.tile(chips, n // nchips).astype(y.dtype)
    return z.reshape(*z.shape[:-1], -1, rep).mean(axis=-1)


def fhss_modulate(x: jax.Array, hop_seq: jax.Array, slot_len: int,
                  nfreqs: int) -> jax.Array:
    """Frequency-hopping: each slot of ``slot_len`` samples is mixed with
    the oscillator at frequency seq[i]/nfreqs (parity: FHSSModulation,
    etalement-spectre.cc:13-63; phase-continuous per frequency)."""
    n = (x.shape[-1] // slot_len) * slot_len
    x = x[..., :n]
    nslots = n // slot_len
    hop = jnp.asarray(hop_seq)[jnp.arange(nslots) % hop_seq.shape[0]]
    freqs = hop.astype(real_dtype) / nfreqs
    k = jnp.arange(n, dtype=real_dtype)
    f_per_sample = jnp.repeat(freqs, slot_len)
    lo = jnp.exp(2j * jnp.pi * f_per_sample * k).astype(complex_dtype)
    return x * lo


@dataclasses.dataclass(frozen=True)
class TranspoBBConfig:
    """Parity: TranspoBBConfig, telecom.hpp:649-691."""
    fi: float = 0.25     # intermediate frequency (normalized)
    ntaps: int = 63


class TranspoBB(Block):
    """Baseband transposition: mix down by fi and (for real inputs) filter
    the image (parity: TranspoBB, transpo-bb.cc:15-70)."""

    img_filter: Fir
    cfg: TranspoBBConfig = struct.field(pytree_node=False)
    real_input: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(cls, cfg: TranspoBBConfig, real_input: bool = True) -> "TranspoBB":
        fc = cfg.fi if cfg.fi < 0.25 else 0.5 - cfg.fi
        h = fir_design_windowed(cfg.ntaps, "lp", max(fc, 0.01))
        return cls(img_filter=Fir.create(h), cfg=cfg, real_input=real_input)

    def init(self):
        return (jnp.zeros((), real_dtype),
                self.img_filter.init_for(jnp.zeros((0,), complex_dtype)))

    @property
    def delay(self):
        return self.img_filter.delay if self.real_input else 0.0

    def step(self, state, x: jax.Array):
        ph, fstate = state
        n = x.shape[-1]
        f = self.cfg.fi
        k = jnp.arange(n, dtype=real_dtype)
        lo = jnp.exp(-1j * (ph + 2 * jnp.pi * f * k)).astype(complex_dtype)
        y = x.astype(complex_dtype) * lo
        ph = jnp.mod(ph + 2 * jnp.pi * f * n, 2 * jnp.pi)
        if self.real_input:
            fstate, y = self.img_filter.step(fstate, y)
        return (ph, fstate), y
