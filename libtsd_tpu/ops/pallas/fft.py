"""Pallas TPU kernel: general power-of-two FFT as MXU matmuls.

Generalization of the fixed 32x128 factorization in periodogram.py to any
N = N1 * 128 with N1 in {2..128} (N = 256..16384): the N-point DFT is
computed as the two-stage Cooley-Tukey factorization

    n = n1*128 + n2,  k = q*N1 + k1
    A[k1, n2] = sum_n1 F_N1[k1, n1] * x[n1, n2]        (sublane matmul)
    B[k1, n2] = A[k1, n2] * exp(-2i pi k1 n2 / N)      (twiddle, VPU)
    X[q*N1+k1] = sum_n2 F_128[q, n2] * B[k1, n2]       (lane matmul)

i.e. two dense matrix multiplications that tile perfectly onto the MXU
(the lane radix is the native 128) plus one elementwise twiddle — the
TPU-native shape of an FFT, vs the reference's scalar radix-2 recursion
(/root/reference/core/src/fourier/fourier.cc:61-200).

Complex data is carried as separate re/im float32 planes (complex64 is
not a Pallas TPU dtype); a complex matmul costs 4 real MXU passes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .periodogram import _dft_mm

__all__ = ["fft_pow2", "ifft_pow2", "dft_factors"]

_N2 = 128


@functools.lru_cache(maxsize=None)
def dft_factors(nfft: int, inverse: bool = False):
    """(F_N1, TW, F_128) re/im float32 factor matrices for an nfft-point
    DFT with nfft = N1*128.  For the inverse transform the factors are
    conjugated (the 1/N scale is applied by the caller)."""
    assert nfft % _N2 == 0 and (nfft & (nfft - 1)) == 0, nfft
    n1 = nfft // _N2
    assert 2 <= n1 <= 128, f"nfft={nfft} out of supported range 256..16384"
    s = +1.0 if inverse else -1.0
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    k1, nn1 = np.meshgrid(np.arange(n1), np.arange(n1), indexing="ij")
    F1 = np.exp(s * 2j * np.pi * k1 * nn1 / n1)
    q, n2 = np.meshgrid(np.arange(_N2), np.arange(_N2), indexing="ij")
    F2 = np.exp(s * 2j * np.pi * q * n2 / _N2)
    kk, mm = np.meshgrid(np.arange(n1), np.arange(_N2), indexing="ij")
    TW = np.exp(s * 2j * np.pi * kk * mm / nfft)
    return (f32(F1.real), f32(F1.imag), f32(TW.real), f32(TW.imag),
            f32(F2.real), f32(F2.imag))


def _kernel(xr_ref, xi_ref, f1r_ref, f1i_ref, f1s_ref, twr_ref, twi_ref,
            f2r_ref, f2i_ref, f2s_ref, yr_ref, yi_ref, *,
            split: bool = False):
    mm = _dft_mm(split)
    Xr, Xi = xr_ref[...], xi_ref[...]           # (TB, N1, 128)
    F1r, F1i = f1r_ref[...], f1i_ref[...]
    tb, n1 = Xr.shape[0], Xr.shape[1]
    # frame packing: when the F1 factor arrives as a (p*n1, p*n1)
    # block-diagonal (see the host wrapper), fold p frames into the
    # sublane dim so stage-A/B matmuls run with full 128-deep extents —
    # unpacked, the (n1,*) matmuls pad to whole 128^3 MXU tiles and up to
    # 15/16 of the MXU issue slots are wasted (n1=8 at nfft=1024)
    nsub = F1r.shape[0]
    p = nsub // n1
    if p > 1:
        Xr = Xr.reshape(tb // p, nsub, _N2)
        Xi = Xi.reshape(tb // p, nsub, _N2)
    TWr, TWi = twr_ref[...], twi_ref[...]
    F2r, F2i = f2r_ref[...], f2i_ref[...]
    if split:
        # Karatsuba 3-mult complex matmuls: both stages are complex x
        # complex here, so the MXU pass count drops 4+4 -> 3+3 (the
        # Fs = Fr + Fi factors are host-precomputed).  "highest" keeps
        # the 4-mult form — fewer rounding terms for the accuracy tier.
        a1 = mm("kn,bnm->bkm", F1r, Xr)
        a2 = mm("kn,bnm->bkm", F1i, Xi)
        a3 = mm("kn,bnm->bkm", f1s_ref[...], Xr + Xi)
        Ar = a1 - a2
        Ai = a3 - a1 - a2
        Br = Ar * TWr - Ai * TWi
        Bi = Ar * TWi + Ai * TWr
        t1 = mm("bkn,qn->bkq", Br, F2r)
        t2 = mm("bkn,qn->bkq", Bi, F2i)
        t3 = mm("bkn,qn->bkq", Br + Bi, f2s_ref[...])
        Yr = t1 - t2
        Yi = t3 - t1 - t2
    else:
        Ar = mm("kn,bnm->bkm", F1r, Xr) - mm("kn,bnm->bkm", F1i, Xi)
        Ai = mm("kn,bnm->bkm", F1r, Xi) + mm("kn,bnm->bkm", F1i, Xr)
        Br = Ar * TWr - Ai * TWi
        Bi = Ar * TWi + Ai * TWr
        Yr = mm("bkn,qn->bkq", Br, F2r) - mm("bkn,qn->bkq", Bi, F2i)
        Yi = mm("bkn,qn->bkq", Br, F2i) + mm("bkn,qn->bkq", Bi, F2r)
    if p > 1:
        Yr = Yr.reshape(tb, n1, _N2)
        Yi = Yi.reshape(tb, n1, _N2)
    yr_ref[...] = Yr
    yi_ref[...] = Yi


def _pick_tb(b: int, nfft: int, p: int = 1) -> int:
    """Frames per grid step (a multiple of the packing factor p): cap the
    working set at ~2 MB of VMEM."""
    tb = max(p, (1 << 19) // (nfft * 4))
    tb -= tb % p
    while b % tb or tb % p:
        tb -= p
    return tb


@functools.partial(jax.jit,
                   static_argnames=("inverse", "interpret", "precision"))
def fft_pow2(xr: jax.Array, xi: jax.Array, inverse: bool = False,
             interpret: bool = False,
             precision: str = "highest") -> tuple[jax.Array, jax.Array]:
    """Batched nfft-point (I)FFT of complex data given as re/im planes.

    xr, xi: (B, nfft) float32 with nfft = N1*128, N1 in {2..128}.
    Returns (yr, yi), same shape, natural bin order; the inverse applies
    the 1/nfft scale.  precision as in periodogram.py ("highest"/"split").
    """
    B, nfft = xr.shape
    n1 = nfft // _N2
    F1r, F1i, TWr, TWi, F2r, F2i = dft_factors(nfft, inverse)
    # largest power-of-two pack count that divides B (the old
    # all-or-nothing rule fell to p=1 — up to 15/16 wasted MXU sublane
    # depth — whenever B wasn't divisible by the FULL pack)
    p = 1
    if n1 < _N2:
        cand = _N2 // n1
        while cand > 1 and B % cand:
            cand //= 2
        p = max(cand, 1)
    if p > 1:
        # pack p frames per MXU tile (shared helper — one copy of the
        # block-diagonal/tile construction)
        from .periodogram import _pack_factors
        F1r, F1i, TWr, TWi = _pack_factors(F1r, F1i, TWr, TWi, pack=p)
    tb = _pick_tb(B, nfft, p)
    F1s = F1r + F1i                  # Karatsuba factors (split tier)
    F2s = F2r + F2i
    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    grid = (B // tb,)
    spec3 = pl.BlockSpec((tb, n1, _N2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_kernel, split=(precision == "split")),
        grid=grid,
        in_specs=[spec3, spec3,
                  const(), const(), const(), const(), const(), const(),
                  const(), const()],
        out_specs=[spec3, spec3],
        out_shape=[jax.ShapeDtypeStruct((B, n1, _N2), jnp.float32)] * 2,
        # mid-sized operands can tempt XLA into staging the whole call in
        # scoped VMEM; raise the kernel limit so that never OOMs
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xr.reshape(B, n1, _N2), xi.reshape(B, n1, _N2),
      jnp.asarray(F1r), jnp.asarray(F1i), jnp.asarray(F1s),
      jnp.asarray(TWr), jnp.asarray(TWi),
      jnp.asarray(F2r), jnp.asarray(F2i), jnp.asarray(F2s))
    # output laid out [k1, q]; bin k = q*N1 + k1
    yr = yr.swapaxes(-1, -2).reshape(B, nfft)
    yi = yi.swapaxes(-1, -2).reshape(B, nfft)
    if inverse:
        yr = yr / nfft
        yi = yi / nfft
    return yr, yi


def ifft_pow2(xr: jax.Array, xi: jax.Array, **kw):
    return fft_pow2(xr, xi, inverse=True, **kw)
