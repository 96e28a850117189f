"""Pallas TPU kernel: fused pattern-detector front end.

Computes, in ONE pass over the input, the two dense signals the
streaming pattern detector needs (models/detector.py; parity:
Detecteur, /root/reference/core/src/fourier/detection.cc:68-515):

  c[t]  = sum_k h[k] x[t-k]          complex pattern correlation
  en[t] = sum_{k<M} |x[t-k]|^2       sliding window energy

as banded-Toeplitz matmuls on the MXU (fir_toeplitz_mats formulation,
ops/pallas/fir.py), with the complex correlation done as a Karatsuba
3-group real convolution and the energy as a fourth group on the
|x|^2 plane computed in-kernel — the energy plane never exists in HBM.

Why: at C=64 x 131k the detector front end measured 12.5 ms/step
(OLA-XLA correlation 7.2 + cumsum moving-average energy 4.0 + score ~1)
— 75 % of the whole frame-receiver step.  The same work as Toeplitz
matmuls is MAC-bound at well under 1 ms.

Design notes:
* Each grid step is INDEPENDENT: the D-1 rows of left context arrive as
  a separate pre-strided input (built by cheap static slices host-side)
  instead of VMEM scratch carried across grid steps.  No program_id, no
  sequential-grid assumption — so ``jax.vmap`` over channels lifts the
  kernel to a batched grid correctly (the frame receiver is vmapped
  per channel).
* Precision tiers: "split" (3-pass bf16 hi/lo per real matmul, ~1e-5
  relative — matches filter_rt._mm_prec) and "bf16" (single pass,
  ~2.5e-3 — ample for a normalized detection score but outside the
  detector goldens' 1.5 % gain gate, so split is the default).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import complex_dtype, real_dtype
from ..filter_rt import fir_toeplitz_mats

_L = 128

__all__ = ["detfront_plan", "DetFront"]


def _kernel(xr_ref, xi_ref, hr_ref, hi_ref,
            gr_ref, gi_ref, gs_ref, ge_ref,
            cr_ref, ci_ref, en_ref, sc_ref, *, split: bool):
    D = gr_ref.shape[0]
    nv = hr_ref.shape[1]                     # D-1 context rows
    T = xr_ref.shape[1]
    rows_r = jnp.concatenate([hr_ref[0], xr_ref[0]], axis=0)
    rows_i = jnp.concatenate([hi_ref[0], xi_ref[0]], axis=0)
    rows_e = rows_r * rows_r + rows_i * rows_i

    if split:
        def conv(rows, g_ref):
            rh = rows.astype(jnp.bfloat16)
            rl = (rows - rh.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = None
            for d in range(D):
                g = g_ref[d]
                gh = g.astype(jnp.bfloat16)
                gl = (g - gh.astype(jnp.float32)).astype(jnp.bfloat16)
                sl = slice(nv - d, nv - d + T)
                t = (jnp.dot(rh[sl], gh, preferred_element_type=jnp.float32)
                     + jnp.dot(rl[sl], gh,
                               preferred_element_type=jnp.float32)
                     + jnp.dot(rh[sl], gl,
                               preferred_element_type=jnp.float32))
                acc = t if acc is None else acc + t
            return acc
    else:
        def conv(rows, g_ref):
            rb = rows.astype(jnp.bfloat16)
            acc = None
            for d in range(D):
                sl = slice(nv - d, nv - d + T)
                t = jnp.dot(rb[sl], g_ref[d].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
            return acc

    # Karatsuba 3-group complex correlation: cr = a1 - a2,
    # ci = a3 - a1 - a2 with a3 = (xr + xi) * (Gr + Gi)
    a1 = conv(rows_r, gr_ref)
    a2 = conv(rows_i, gi_ref)
    a3 = conv(rows_r + rows_i, gs_ref)
    cr = a1 - a2
    ci = a3 - a1 - a2
    en = jnp.maximum(conv(rows_e, ge_ref), 0.0)
    cr_ref[0] = cr
    ci_ref[0] = ci
    en_ref[0] = en
    # raw normalized score in-kernel (saves XLA passes over the c/en
    # planes); the global energy-floor guard + min(.,1) stay outside
    sc_ref[0] = jnp.sqrt((cr * cr + ci * ci)
                         / (en + jnp.float32(1e-20)))


def detfront_plan(n_rows: int, max_T: int = 128) -> int:
    """Rows per grid step.  The caller PADS n_rows up to a multiple of
    the returned T (trailing zero rows are discarded from the outputs),
    so T stays at max_T regardless of the block length — an exact-divisor
    rule would collapse to tiny tiles (T=8 for nrows=1048) and multiply
    the grid-step count ~16x on awkward lengths.  T is ALWAYS max_T:
    this also guarantees nv = D-1 <= 127 < T, so the left-context slice
    starts stay non-negative for any supported pattern length."""
    return max_T


@functools.partial(jax.jit,
                   static_argnames=("interpret", "precision"))
def _detfront_jit(x_main_r, x_main_i, x_hist_r, x_hist_i,
                  Gr, Gi, Gs, Ge, interpret: bool,
                  precision: str):
    nsteps, T, _ = x_main_r.shape
    D = Gr.shape[0]
    nv = D - 1
    tile = lambda: pl.BlockSpec((1, T, _L), lambda f: (f, 0, 0),
                                memory_space=pltpu.VMEM)
    hspec = lambda: pl.BlockSpec((1, nv, _L), lambda f: (f, 0, 0),
                                 memory_space=pltpu.VMEM)
    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    cr, ci, en, sc = pl.pallas_call(
        functools.partial(_kernel, split=(precision == "split")),
        grid=(nsteps,),
        in_specs=[tile(), tile(), hspec(), hspec()] + [const()] * 4,
        out_specs=[tile(), tile(), tile(), tile()],
        out_shape=[jax.ShapeDtypeStruct(x_main_r.shape, jnp.float32)] * 4,
        interpret=interpret,
    )(x_main_r, x_main_i, x_hist_r, x_hist_i, Gr, Gi, Gs, Ge)
    return cr, ci, en, sc


def _taps_mats(pattern_taps: np.ndarray) -> Tuple[np.ndarray, ...]:
    """Host-precomputed tap matrices: complex correlation taps (Gr, Gi,
    Gs=Gr+Gi) and the ones-kernel energy window Ge, all (D, L, L) f32
    with a COMMON D (the correlation taps and the M-long energy window
    have the same length M)."""
    h = np.asarray(pattern_taps, np.complex128)
    M = len(h)
    Gc = fir_toeplitz_mats(h)
    Ge = fir_toeplitz_mats(np.ones(M, np.float64))
    Gr = np.ascontiguousarray(Gc.real).astype(np.float32)
    Gi = np.ascontiguousarray(Gc.imag).astype(np.float32)
    return Gr, Gi, (Gr + Gi).astype(np.float32), Ge.astype(np.float32)


class DetFront(struct.PyTreeNode):
    """Streaming fused correlation + window-energy engine with the same
    state protocol as the Fir block (state = last V input samples,
    complex), drop-in for the detector's (corr, energy) pair.

    The tap matrices are pytree LEAVES (device arrays passed as jit
    arguments — closure-captured device constants break on runtimes
    without readback).  V = (D-1)*128 >= M-1; ``step(state, x)`` needs
    len(x) % 128 == 0.
    """

    Gr: jax.Array
    Gi: jax.Array
    Gs: jax.Array
    Ge: jax.Array
    M: int = struct.field(pytree_node=False)
    D: int = struct.field(pytree_node=False)
    V: int = struct.field(pytree_node=False)
    precision: str = struct.field(pytree_node=False, default="split")

    @classmethod
    def create(cls, pattern_taps, precision: str = "split") -> "DetFront":
        h = np.asarray(pattern_taps)
        Gr, Gi, Gs, Ge = _taps_mats(h)
        D = Gr.shape[0]
        if D - 1 > _L - 1:
            raise ValueError(
                f"pattern too long for the fused detector engine: "
                f"M={len(h)} needs {D - 1} context rows (max {_L - 1}) "
                f"— use the XLA/pallas OLA engines for patterns this "
                f"long")
        return cls(Gr=jnp.asarray(Gr), Gi=jnp.asarray(Gi),
                   Gs=jnp.asarray(Gs), Ge=jnp.asarray(Ge),
                   M=len(h), D=D, V=(D - 1) * _L, precision=precision)

    def init(self):
        return jnp.zeros((self.V,), complex_dtype)

    @property
    def uses_pallas(self) -> bool:
        return True

    @property
    def delay(self) -> float:
        return (self.M - 1) / 2

    def step(self, state, x: jax.Array, interpret: Optional[bool] = None):
        """x: (n,) complex, n % 128 == 0.  Returns
        (new_state, (cr, ci, en, score_raw)) — all real (n,) planes (the
        complex correlation stays as planes so the consumer only builds
        complex values at peak positions, not over the whole block)."""
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        n = x.shape[-1]
        assert n % _L == 0, n
        nv = self.D - 1
        xc = x.astype(complex_dtype)
        xr = jnp.real(xc).astype(jnp.float32).reshape(-1, _L)
        xi = jnp.imag(xc).astype(jnp.float32).reshape(-1, _L)
        nrows = n // _L
        T = detfront_plan(nrows)
        # pad the row count up to a multiple of T with zero rows
        # (outputs beyond n are sliced away below).  Explicit
        # zeros+concat, not jnp.pad: a pad fused with the real()/imag()
        # producer reads uninitialized memory on some TPU runtimes (the
        # block.safe_pad gotcha).
        nsteps = -(-nrows // T)
        padr = nsteps * T - nrows
        if padr:
            z = jnp.zeros((padr, _L), jnp.float32)
            xr = jnp.concatenate([xr, z])
            xi = jnp.concatenate([xi, z])
        x_main_r = xr.reshape(nsteps, T, _L)
        x_main_i = xi.reshape(nsteps, T, _L)
        # left-context rows per step: step 0 reads the carried state, the
        # rest read the preceding tile's last rows — built from SMALL
        # static slices of x (no full-signal [state | x] concat: that
        # copy cost a measurable fraction of the kernel call at C=64).
        # nv < T always (nv <= 127 enforced at create, T = 128 after
        # padding) so the slice starts stay non-negative.
        sr = jnp.real(state).astype(jnp.float32).reshape(nv, _L)
        si = jnp.imag(state).astype(jnp.float32).reshape(nv, _L)
        x_hist_r = jnp.stack([sr] + [
            jax.lax.slice_in_dim(xr, f * T - nv, f * T)
            for f in range(1, nsteps)])
        x_hist_i = jnp.stack([si] + [
            jax.lax.slice_in_dim(xi, f * T - nv, f * T)
            for f in range(1, nsteps)])
        cr, ci, en, sc = _detfront_jit(
            x_main_r, x_main_i, x_hist_r, x_hist_i,
            self.Gr, self.Gi, self.Gs, self.Ge,
            interpret, self.precision)
        new_state = xc[-self.V:] if n >= self.V else jnp.concatenate(
            [state[n:], xc])
        return new_state, (cr.reshape(-1)[:n], ci.reshape(-1)[:n],
                           en.reshape(-1)[:n], sc.reshape(-1)[:n])
