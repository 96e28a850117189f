"""Pallas TPU kernel: streaming overlap-save FIR as banded Toeplitz matmuls.

This is the framework's metric kernel (BASELINE.json: 256-tap FIR + 4k FFT
chain at per-chip roofline).  Replaces the reference's per-sample sliding
window loop (core/src/filtrage/filtre-rt.cc:67-110) with an MXU-native
formulation:

    frames X[r] of L=128 samples;  Y[r] = sum_d X[r-d] @ G_d

where G_d are the precomputed L x L banded-Toeplitz tap matrices
(see ops/filter_rt.fir_toeplitz_mats).

Kernel structure: 1-D sequential grid over frame-tiles of T=128 frames.
A VMEM scratch buffer carries the last D-1 frames between grid steps
(TPU grid execution is sequential on a core), so every input sample is
DMA'd from HBM exactly once — HBM traffic = n_in + n_out, the roofline.
Each tile issues D matmuls of (T,128)@(128,128) on the MXU.

The row-concatenated operand [scratch; x_tile] never materializes: row
blocks multiply independently, so each lag d contributes two statically
sliced matmuls (scratch part -> first d rows, x part -> the rest).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import real_dtype
from ..filter_rt import fir_toeplitz_mats

_L = 128   # frame length = lane width
_T = 128   # frames per tile (tile = 16384 samples)

__all__ = ["fir_pallas", "fir_pallas_complex"]


def _fir_kernel(x_ref, g_ref, o_ref, hist_ref):
    """x_ref: (T, L) input tile; g_ref: (D, L, L) taps; o_ref: (T, L) out;
    hist_ref: (D-1, L) VMEM scratch carrying trailing frames of the previous
    tile (zeroed at grid start)."""
    D = g_ref.shape[0]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        hist_ref[...] = jnp.zeros_like(hist_ref)

    x = x_ref[...]
    # HIGHEST precision: f32 inputs on the MXU default to one bf16 pass
    # (~3 significant digits — observed 0.25% error on hardware); the
    # 6-pass decomposition restores ~f32 accuracy for the BASELINE 1e-5
    # tolerance class.
    mm = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
    # d = 0: aligned tile
    acc = mm(x, g_ref[0])
    for d in range(1, D):
        # rows 0..d-1 come from history (previous tile's last frames),
        # rows d..T-1 from this tile shifted by d
        g = g_ref[d]
        top = mm(hist_ref[D - 1 - d:, :][: d, :], g)
        bot = mm(x[: _T - d, :], g)
        acc = acc + jnp.concatenate([top, bot], axis=0)
    o_ref[...] = acc
    if D > 1:
        hist_ref[...] = x[_T - (D - 1):, :]


@functools.partial(jax.jit, static_argnames=("K", "interpret"))
def _fir_pallas_jit(xf: jax.Array, G: jax.Array, K: int,
                    interpret: bool = False) -> jax.Array:
    nf = xf.shape[0]
    D = G.shape[0]
    assert nf % _T == 0
    grid = (nf // _T,)
    return pl.pallas_call(
        _fir_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_T, _L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, _L, _L), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_T, _L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf, _L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((max(D - 1, 1), _L), jnp.float32)],
        interpret=interpret,
    )(xf, G)


def fir_pallas(h, x: jax.Array, interpret: Optional[bool] = None) -> jax.Array:
    """One-shot FIR y[n] = sum_k h[k] x[n-k] (zero initial state), real
    dtype, via the Pallas streaming kernel.  Output length = len(x).

    Falls back to interpret mode automatically off-TPU (for tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if x.ndim != 1:
        # a (C, N) batch would be silently corrupted: the scalar pad
        # pair pads BOTH axes and the tile reshape interleaves channels.
        # Batched filtering is ops.filter_rt.Fir (MXU Toeplitz) — this
        # kernel is the single-stream streaming form
        raise ValueError(
            f"fir_pallas takes a 1-D signal, got shape {x.shape}; use "
            f"ops.filter_rt.Fir / fir_filter for batched (C, N) input "
            f"or vmap this kernel explicitly")
    h = np.asarray(h, np.float64)
    G = jnp.asarray(fir_toeplitz_mats(h), real_dtype)
    n = x.shape[-1]
    tile = _T * _L
    pad = (-n) % tile
    from ...block import safe_pad
    xp = safe_pad(x.astype(real_dtype), 0, pad, axis=0)
    xf = xp.reshape(-1, _L)
    yf = _fir_pallas_jit(xf, G, len(h), interpret)
    return yf.reshape(-1)[:n]


def fir_pallas_complex(h, x: jax.Array,
                       interpret: Optional[bool] = None) -> jax.Array:
    """Complex-signal FIR with real taps: two plane-wise kernel calls."""
    yr = fir_pallas(h, jnp.real(x), interpret)
    yi = fir_pallas(h, jnp.imag(x), interpret)
    return (yr + 1j * yi).astype(jnp.complex64)
