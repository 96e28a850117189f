"""Pointer-based clock recovery: scan over SYMBOLS, not samples.

Fills the reference's second clock-recovery slot (ClockRec2 after Mengali,
core/src/telecom/clock-rec.cc:399-626) with a TPU-native formulation: the
`lax.scan` advances a fractional read pointer by ~osf input samples per
step and interpolates the symbol (and the Gardner midpoint) directly from
the input buffer with `dynamic_slice`.  Compared to the per-sample loop
(clock_rec.py) this runs osf-times fewer scan steps — the dominant cost of
sequential loops on TPU is per-step overhead, so this is ~osf x faster at
identical loop dynamics.

Constraints: the whole input block is indexed randomly, so this variant
suits block processing (frames, buffers) rather than unbounded streams;
use ClockRec for sample-streaming parity.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..block import Block
from ..config import complex_dtype, real_dtype
from ..ops.resample import Interpolator, make_interpolator
from .clock_rec import ClockRecConfig, ted_gardner

__all__ = ["ClockRec2"]


class ClockRec2(Block):
    """step(state, x) -> (state, (symbols, valid)) with static output
    length len(x)//osf (symbols per block)."""

    itrp: Interpolator
    cfg: ClockRecConfig = struct.field(pytree_node=False)

    @classmethod
    def create(cls, cfg: ClockRecConfig) -> "ClockRec2":
        return cls(itrp=make_interpolator(cfg.itrp), cfg=cfg)

    @property
    def gain(self) -> float:
        K1 = self.cfg.osf
        return K1 * (1 - np.exp(-1.0 / (self.cfg.tc * K1)))

    @property
    def ratio(self) -> float:
        return 1.0 / self.cfg.osf

    def init(self):
        return dict(
            # fractional read pointer (position of the next symbol center)
            ptr=jnp.asarray(self.cfg.osf / 2.0, real_dtype),
            ymid_ri=jnp.zeros((2,), real_dtype),
            yprev_ri=jnp.zeros((2,), real_dtype),
        )

    def step(self, state, x: jax.Array):
        osf = self.cfg.osf
        K = self.itrp.K
        lut = self.itrp.lut
        nph = self.itrp.nphases
        gain = self.gain
        n = x.shape[-1]
        nsym = n // osf
        # pad so gather windows never clip (pointer stays in [0, n))
        xp = jnp.concatenate([jnp.zeros(K, x.dtype), x,
                              jnp.zeros(K + osf, x.dtype)])

        def interp_at(p):
            ip = jnp.floor(p).astype(jnp.int32)
            tau = p - ip.astype(real_dtype)
            # window covering xp[K + ip - K + 1 .. K + ip] + lookahead:
            # taps(tau) interpolate at position K//2 + tau of the window
            start = ip + 1  # xp offset K cancels the K-window lookback
            win = jax.lax.dynamic_slice(xp, (start,), (K,))
            taps = lut[jnp.clip(jnp.round(tau * nph).astype(jnp.int32),
                                0, nph)]
            return jnp.sum(win * taps.astype(win.dtype))

        def body(st, _):
            p = st["ptr"]
            y = interp_at(p)
            ymid = interp_at(p - osf / 2.0)
            yprev = (st["yprev_ri"][0] + 1j * st["yprev_ri"][1]
                     ).astype(complex_dtype)
            e = ted_gardner(yprev, ymid, y)
            dec = jnp.clip(gain * e, -osf / 4.0, osf / 4.0)
            new = dict(
                ptr=p + osf - dec,
                ymid_ri=jnp.stack([jnp.real(ymid), jnp.imag(ymid)]),
                yprev_ri=jnp.stack([jnp.real(y), jnp.imag(y)]),
            )
            valid = p < n - K
            return new, (y, valid)

        state, (syms, valid) = jax.lax.scan(body, dict(state), None,
                                            length=nsym)
        # carry the pointer into the next block's coordinates
        state["ptr"] = state["ptr"] - n
        return state, (syms, valid)
