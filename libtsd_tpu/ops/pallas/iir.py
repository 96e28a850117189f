"""Pallas TPU kernel: fused IIR cascade (frame state-space form).

Brings the IirFrame formulation (ops/filter_rt.py:454-633) INSIDE a
kernel so a cascade of IIR sections runs with the intermediate signal
resident in VMEM — an IIR stage no longer forces a chain break back
through HBM (VERDICT r3 item 5).  Per grid step (channel c, chunk f):

  1. per section s: u_j = x_frame_j @ W_s  (MXU; input->state update of
     each 128-sample frame),
  2. the k-dimensional state hop s_{j+1} = M_s s_j + u_j across the
     chunk's frames — the ONLY sequential dependence — as an in-kernel
     ``fori_loop`` over VMEM scratch (k <= 4 scalars per step),
  3. y = x_frames @ T_s^T + s_start @ S_s^T  (MXU; exact LTI algebra,
     same operators as IirFrame),
and the section's output feeds the next section without leaving VMEM.
The cross-chunk carry lives in scratch; the final state is written out
so streaming across calls works (same protocol as IirFrame).

Parity: a fused re-design of the reference's per-sample SOS cascade
(ChaineSOIS / filtre_sois, core/src/filtrage/filtre-rt.cc:295-581).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..filter_rt import _iir_frame_mats

__all__ = ["iir_cascade_pallas", "IirCascadePallas"]

_L = 128
_KP = 8      # padded state width (sublane-friendly; k <= _KP)


def _kernel(x_ref, t_ref, s_ref, w_ref, m_ref, c0_ref, y_ref, cout_ref,
            u_scr, sst_scr, carry_scr, *, nsec: int, rows: int,
            nchunks: int):
    f = pl.program_id(1)

    @pl.when(f == 0)
    def _():
        carry_scr[...] = c0_ref[0]

    hp = jax.lax.Precision.HIGHEST
    dot = functools.partial(jnp.dot, precision=hp,
                            preferred_element_type=jnp.float32)
    cur = x_ref[0]                                   # (rows, L)
    for s in range(nsec):
        # (1) input->state updates for every frame (MXU); only the first
        # k of _KP lanes are meaningful (W is zero-padded)
        u_scr[...] = dot(cur, w_ref[s])              # (rows, _KP)

        # (2) sequential k-dim state hop across frames (the irreducible
        # recursion): s_start[j] = M s_start[j-1] + u[j-1]
        M = m_ref[s]                                 # (_KP, _KP) padded

        def body(j, sv):
            sst_scr[pl.ds(j, 1), :] = sv
            uj = u_scr[pl.ds(j, 1), :]
            return jnp.dot(sv, M.T, precision=hp,
                           preferred_element_type=jnp.float32) + uj

        sv = jax.lax.fori_loop(0, rows, body,
                               carry_scr[pl.ds(s, 1), :])
        carry_scr[pl.ds(s, 1), :] = sv               # chunk carry-out

        # (3) in-frame Toeplitz + state->output (MXU)
        cur = dot(cur, t_ref[s]) + dot(sst_scr[...], s_ref[s])
    y_ref[0] = cur

    @pl.when(f == nchunks - 1)
    def _():
        cout_ref[0] = carry_scr[...]


class IirCascadePallas:
    """Host-side wrapper holding the precomputed frame operators.

    sections: sequence of (b, a) float coefficient pairs, applied in
    order.  All sections share the padded state width _KP (k <= _KP).
    """

    def __init__(self, sections: Sequence[Tuple[np.ndarray, np.ndarray]],
                 L: int = _L):
        assert L == _L
        Ts, Ss, Ws, Ms, ks = [], [], [], [], []
        for b, a in sections:
            T, S, W, Apow = _iir_frame_mats(b, a, L)
            k = S.shape[1]
            assert k <= _KP, f"section order {k} > {_KP}"
            ks.append(k)
            Tp = T.T.astype(np.float32)              # dot(x, T.T)
            Sp = np.zeros((_KP, L), np.float32)
            Sp[:k] = S.T
            Wp = np.zeros((L, _KP), np.float32)
            Wp[:, :k] = W[:, ::-1].T                 # frame update flip
            Mp = np.zeros((_KP, _KP), np.float32)
            Mp[:k, :k] = Apow[L]
            Ts.append(Tp)
            Ss.append(Sp)
            Ws.append(Wp)
            Ms.append(Mp)
        self.nsec = len(sections)
        self.k = max(ks)
        self.T = jnp.asarray(np.stack(Ts))
        self.S = jnp.asarray(np.stack(Ss))
        self.W = jnp.asarray(np.stack(Ws))
        self.M = jnp.asarray(np.stack(Ms))

    def init(self, C: int) -> jax.Array:
        return jnp.zeros((C, self.nsec, _KP), jnp.float32)

    def __call__(self, x: jax.Array, state: jax.Array | None = None,
                 tb: int = 64, interpret: bool = False):
        return iir_cascade_pallas(x, self.T, self.S, self.W, self.M,
                                  state, tb=tb, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("tb", "interpret"))
def iir_cascade_pallas(x, T, S, W, M, state=None, tb: int = 64,
                       interpret: bool = False):
    """x: (C, N) float32, N % (tb*128) == 0.  T/S/W/M: stacked section
    operators from IirCascadePallas.  Returns (y, final_state)."""
    if jnp.iscomplexobj(x):
        raise TypeError(
            "iir_cascade_pallas is a REAL-plane kernel: a complex cast "
            "would silently drop the imaginary plane.  For complex IQ "
            "run the re/im planes separately, or use IirFrame (which "
            "splits them internally)")
    C, N = x.shape
    nsec = T.shape[0]
    rows = tb
    chunk = rows * _L
    assert N % chunk == 0, f"N must be a multiple of {chunk}"
    nchunks = N // chunk
    if state is None:
        state = jnp.zeros((C, nsec, _KP), jnp.float32)
    kern = functools.partial(_kernel, nsec=nsec, rows=rows,
                             nchunks=nchunks)
    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    y, cout = pl.pallas_call(
        kern,
        grid=(C, nchunks),
        in_specs=[
            pl.BlockSpec((1, rows, _L), lambda c, f: (c, f, 0),
                         memory_space=pltpu.VMEM),
            const(), const(), const(), const(),
            pl.BlockSpec((1, nsec, _KP), lambda c, f: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, _L), lambda c, f: (c, f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsec, _KP), lambda c, f: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, nchunks * rows, _L), jnp.float32),
            jax.ShapeDtypeStruct((C, nsec, _KP), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, _KP), jnp.float32),    # u
            pltpu.VMEM((rows, _KP), jnp.float32),    # s_start
            pltpu.VMEM((nsec, _KP), jnp.float32),    # carry
        ],
        interpret=interpret,
    )(x.astype(jnp.float32).reshape(C, nchunks * rows, _L),
      T, S, W, M, state)
    return y.reshape(C, N), cout
