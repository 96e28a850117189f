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
    length len(x)//osf + 1 + len(x)//(64*osf): the nominal symbol count
    plus catch-up headroom — an RX symbol clock FASTER than fe/osf
    produces slightly more than n/osf symbols per block, and without
    spare masked slots the carried pointer would fall ever further
    behind until the stale-tail re-anchor silently deleted the backlog
    (a periodic symbol slip).  Consumers already filter by the validity
    mask."""

    itrp: Interpolator
    cfg: ClockRecConfig = struct.field(pytree_node=False)

    @classmethod
    def create(cls, cfg: ClockRecConfig) -> "ClockRec2":
        return cls(itrp=make_interpolator(cfg.itrp), cfg=cfg)

    @property
    def gain(self) -> float:
        return self.cfg.loop_gain

    @property
    def ratio(self) -> float:
        return 1.0 / self.cfg.osf

    @property
    def T(self) -> int:
        """Carried input-tail length: interpolation windows of the symbol
        AND its Gardner midpoint must stay inside [tail | x] for pointers
        as far back as -osf (carry-over after a block boundary)."""
        return self.itrp.K + 2 * self.cfg.osf

    def init(self):
        return dict(
            # fractional read pointer (position of the next symbol center,
            # relative to the current block's first sample; may be
            # slightly negative after a boundary — it then points into
            # the carried tail)
            ptr=jnp.asarray(self.cfg.osf / 2.0, real_dtype),
            # last T input samples: block boundaries are seamless (the
            # old zero-front-pad corrupted the first ~K/osf symbols of
            # every block and permanently dropped the last ~K/osf)
            tail=jnp.zeros((self.itrp.K + 2 * self.cfg.osf,),
                           complex_dtype),
            yprev_ri=jnp.zeros((2,), real_dtype),
        )

    def step(self, state, x: jax.Array):
        osf = self.cfg.osf
        K = self.itrp.K
        T = self.T
        lut = self.itrp.lut
        nph = self.itrp.nphases
        gain = self.gain
        n = x.shape[-1]
        # headroom slots: see class docstring (negative-drift catch-up)
        nsym = n // osf + 1 + n // (64 * osf)
        x = x.astype(complex_dtype)
        # [carried tail | block | small guard pad]; x[t] sits at index T+t
        xp = jnp.concatenate([state["tail"], x,
                              jnp.zeros(K + osf, x.dtype)])

        def interp_at(p):
            ip = jnp.floor(p).astype(jnp.int32)
            tau = p - ip.astype(real_dtype)
            # causal window x[ip-K+1 .. ip]; taps(tau) evaluate at
            # ip - itrp.delay_ + tau... consistent with the symbol spacing
            start = T + ip + 1 - K
            win = jax.lax.dynamic_slice(xp, (start,), (K,))
            # one copy of the LUT phase-quantization convention
            taps = self.itrp.taps(tau)
            return jnp.sum(win * taps.astype(win.dtype))

        def body(st, t):
            p = st["ptr"]
            # a pointer past the block end must WAIT for the next block
            # (its samples haven't arrived): emit an invalid bubble and
            # don't consume.  A pointer below the carried-tail depth
            # (sustained negative drift: RX clock faster than fe/osf)
            # would make the interpolation slice CLAMP and decode stale
            # samples forever — re-anchor it to the nominal grid instead
            # (one invalid symbol, then recovery)
            inlow = p > -(1.0 * osf)
            ready = (p < n) & inlow
            nom = t.astype(real_dtype) * osf
            pc = jnp.where(ready, p, jnp.where(inlow, 0.0, nom))
            y = interp_at(pc)
            ymid = interp_at(pc - osf / 2.0)
            yprev = (st["yprev_ri"][0] + 1j * st["yprev_ri"][1]
                     ).astype(complex_dtype)
            e = ted_gardner(yprev, ymid, y)
            dec = jnp.clip(gain * e, -osf / 4.0, osf / 4.0)
            new = dict(
                ptr=jnp.where(ready, p + osf - dec,
                              jnp.where(inlow, p, nom + osf)),
                yprev_ri=jnp.where(
                    ready, jnp.stack([jnp.real(y), jnp.imag(y)]),
                    st["yprev_ri"]),
            )
            return new, (jnp.where(ready, y, 0.0 * y), ready)

        carry = dict(ptr=state["ptr"], yprev_ri=state["yprev_ri"])
        carry, (syms, valid) = jax.lax.scan(body, carry,
                                            jnp.arange(nsym))
        # pointer and tail carried into the next block's coordinates
        return dict(ptr=carry["ptr"] - n, yprev_ri=carry["yprev_ri"],
                    tail=xp[n: n + T]), (syms, valid)
