"""Pallas TPU kernel: fused framed periodogram (power-spectrum accumulate).

The second half of the BASELINE metric chain (256-tap FIR + 4k FFT).  The
XLA path materializes the FFT input, several complex intermediates and the
per-frame spectra in HBM — multiple extra passes over the data.  This
kernel computes, per grid step, DFT-4096 of a tile of frames via a 32x128
Cooley-Tukey decomposition (two complex matmul stages on the MXU +
twiddles) and accumulates |X|^2 into a per-channel accumulator that stays
resident in VMEM across the sequential grid (output revisiting) — HBM
traffic is one read of the input and one small write of the spectra.

Factorization (lane-friendly: the 128-point dimension always sits in
lanes, so no sub-128 lane reshapes that Mosaic rejects):
    n = 128*n1 + n2   (n1 in [0,32) sublanes, n2 in [0,128) lanes)
    k = k1 + 32*k2    (k1 in [0,32),          k2 in [0,128))
    A[k1, n2] = sum_n1 x[128 n1 + n2] W32^{k1 n1}     (F32 stage, sublanes)
    B[k1, n2] = A * W4096^{k1 n2}                      (twiddle)
    X[k1+32k2] = sum_n2 B[k1, n2] W128^{k2 n2}         (F128 stage, lanes)
The kernel accumulates P[k1, k2]; the caller transposes to linear bin
order (tiny (32,128) arrays, XLA-side).
"""
from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


__all__ = ["periodogram4096_acc"]

_NFFT = 4096
_N1 = 32          # sublane radix
_N2 = 128         # lane radix
_TB = 16          # frames per grid step (16 * 4096 samples = 256 KB f32)


def _factors():
    a = np.arange(_N1)
    F32 = np.exp(-2j * np.pi * np.outer(a, a) / _N1).astype(np.complex64)
    b = np.arange(_N2)
    F128 = np.exp(-2j * np.pi * np.outer(b, b) / _N2).astype(np.complex64)
    k1 = np.arange(_N1)[:, None]
    n2 = np.arange(_N2)[None, :]
    TW = np.exp(-2j * np.pi * k1 * n2 / _NFFT).astype(np.complex64)
    f32 = lambda z: z.astype(np.float32)
    return (f32(F32.real), f32(F32.imag), f32(F128.real), f32(F128.imag),
            f32(TW.real), f32(TW.imag))


def _pack_factors(F32r, F32i, TWr, TWi, pack: int = 0):
    """Pack ``pack`` frames per MXU tile: block-diagonal stage factor +
    vertically tiled twiddles (default: fill the 128 sublanes).
    Numerically identical to the per-frame form (the off-block zeros
    contribute exactly 0 in every precision mode) but runs the
    stage-A/B matmuls with full sublane extents — unpacked, the (32,*)
    matmuls are padded to whole 128^3 MXU tiles and ~3/4 of the MXU
    issue slots are wasted.  The ONE copy of this construction
    (ops/pallas/chain.py and ops/pallas/fft.py both reuse it)."""
    n1 = F32r.shape[0]
    if pack <= 0:
        pack = _N2 // n1
    z = np.zeros((n1, n1), np.float32)
    blk = lambda M: np.block(
        [[M if i == j else z for j in range(pack)] for i in range(pack)])
    return (blk(F32r), blk(F32i),
            np.tile(TWr, (pack, 1)), np.tile(TWi, (pack, 1)))


def _dft_mm(split: bool):
    """DFT-stage matmul: 6-pass fp32 emulation (HIGHEST) or single-pass
    bf16 inputs with fp32 accumulation (the MXU's native mode).  Explicit
    bfloat16 casts (rather than Precision.DEFAULT) pin the numerics so CPU
    interpret mode and Mosaic agree."""
    if split:
        return lambda s, a, b: jnp.einsum(
            s, a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
    return functools.partial(jnp.einsum,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)


def _kernel(y_ref, f32r_ref, f32i_ref, f128r_ref, f128i_ref, f128s_ref,
            twr_ref, twi_ref, acc_ref, *, split: bool = False):
    f = pl.program_id(1)

    @pl.when(f == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    mm = _dft_mm(split)
    F32r, F32i = f32r_ref[...], f32i_ref[...]
    F128r, F128i = f128r_ref[...], f128i_ref[...]
    TWr, TWi = twr_ref[...], twi_ref[...]

    # (1, TB*32, 128) -> (TB/4, 128, 128): splits the SUBLANE dim only;
    # 4 frames per MXU tile (F32 factor arrives block-diagonal)
    Xm = y_ref[0].reshape(_TB * _N1 // _N2, _N2, _N2)  # [blk,(fr,n1),n2]
    Ar = mm("kn,bnm->bkm", F32r, Xm)
    Ai = mm("kn,bnm->bkm", F32i, Xm)
    Br = Ar * TWr - Ai * TWi
    Bi = Ar * TWi + Ai * TWr
    if split:
        # Karatsuba 3-mult complex matmul (F128s = F128r + F128i, host-
        # precomputed): one fewer MXU pass in stage B; "highest" keeps
        # the 4-mult form for fewer rounding terms.
        t1 = mm("bkn,qn->bkq", Br, F128r)
        t2 = mm("bkn,qn->bkq", Bi, F128i)
        t3 = mm("bkn,qn->bkq", Br + Bi, f128s_ref[...])
        Xr = t1 - t2
        Xi = t3 - t1 - t2
    else:
        Xr = mm("bkn,qn->bkq", Br, F128r) - mm("bkn,qn->bkq", Bi, F128i)
        Xi = mm("bkn,qn->bkq", Br, F128i) + mm("bkn,qn->bkq", Bi, F128r)
    P = jnp.sum(Xr * Xr + Xi * Xi, axis=0)  # [(fr, k1), k2]
    acc_ref[...] += P.reshape(_N2 // _N1, _N1, _N2).sum(axis=0)[None]


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def periodogram4096_acc(y: jax.Array, interpret: bool = False,
                        precision: str = "highest") -> jax.Array:
    """y: (C, N) float32 with N % (TB*4096) == 0 -> (C, 4096) accumulated
    power spectra (sum over N/4096 frames, unnormalized |FFT|^2, natural
    bin order).

    precision: "highest" (6-pass fp32 matmuls) or "split" (bf16 single-pass
    DFT stages, ~6x fewer MXU passes in the DFT; relative error stays
    within the reference's own large-n FFT tolerance of 1e-2,
    /root/reference/core/tests/test-fourier.cc:256)."""
    C, N = y.shape
    assert N % (_TB * _NFFT) == 0, f"N must be a multiple of {_TB * _NFFT}"
    assert precision in ("highest", "split")
    nchunks = N // (_TB * _NFFT)
    F32r, F32i, F128r, F128i, TWr, TWi = _factors()
    F32r, F32i, TWr, TWi = _pack_factors(F32r, F32i, TWr, TWi)
    F128s = F128r + F128i            # Karatsuba stage-B factor
    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    acc = pl.pallas_call(
        functools.partial(_kernel, split=(precision == "split")),
        grid=(C, nchunks),
        in_specs=[
            pl.BlockSpec((1, _TB * _N1, _N2), lambda c, f: (c, f, 0),
                         memory_space=pltpu.VMEM),
            const(), const(), const(), const(), const(), const(), const(),
        ],
        out_specs=pl.BlockSpec((1, _N1, _N2), lambda c, f: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, _N1, _N2), jnp.float32),
        interpret=interpret,
    )(y.reshape(C, nchunks * _TB * _N1, _N2),
      jnp.asarray(F32r), jnp.asarray(F32i), jnp.asarray(F128r),
      jnp.asarray(F128i), jnp.asarray(F128s), jnp.asarray(TWr),
      jnp.asarray(TWi))
    # [k1, k2] -> linear bin order k = k1 + 32*k2  (tiny transpose in XLA)
    return acc.swapaxes(-1, -2).reshape(C, _NFFT)
