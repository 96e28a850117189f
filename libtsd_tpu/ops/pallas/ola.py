"""Pallas TPU kernel: fused overlap-save FFT convolution.

The whole OLA filtering path — window assembly, forward FFT, frequency
multiply, inverse FFT, discard — in ONE kernel: the spectrum never exists
in HBM.  This is the Pallas end-to-end version of ops/filter_rt.OlaFft
(parity: filtre_fft / FiltreFFT, /root/reference/core/src/fourier/
fourier.cc:708-935, which is a host-side loop over FFTW-style calls).

Structure per grid step (channel c, block f):
  1. window = [hist | x_block]  (overlap-save; hist = last V samples of
     the previous window, V >= K-1 rounded up to a lane multiple, carried
     in VMEM scratch; zeros at f==0 = zero initial filter state)
  2. forward N-point DFT via the two-stage matmul factorization of
     pallas/fft.py, operating in the [k1, q] intermediate layout
  3. Y = H * X with H pre-arranged in the same [k1, q] layout
  4. inverse DFT with the conjugated factors (lane matmul -> conjugate
     twiddle -> sublane matmul), which maps [k1, q] straight back to the
     natural (n1, n2) sample layout — no transposes anywhere
  5. emit the last Ne samples (discard the V-sample circular prefix)

Supports complex taps (H is complex regardless) — the MXU path the plain
Toeplitz FIR kernel lacks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import complex_dtype
from .fft import dft_factors
from .periodogram import _dft_mm

__all__ = ["ola_filter", "ola_filter_stream", "ola_stream_planes", "ola_plan"]

_L = 128


def ola_plan(ntaps: int, Nf: int | None = None) -> tuple[int, int, int]:
    """(Nf, Ne, V): FFT size, hop (valid samples per block), overlap.
    V = K-1 rounded up to a lane multiple; Nf defaults to the smallest
    power of two >= max(4096, 16*(K-1)) — a ~16x rule, NOT the classic
    CPU 4x: the matmul DFT costs O(sqrt(Nf)) MACs/point so the overlap
    fraction dominates (see the measured sweep in the comment below)."""
    V = max(_L, ((ntaps - 1 + _L - 1) // _L) * _L)
    if Nf is None:
        # Floor of 4096 with a ~16x rule, not the CPU-classic 4x/1024:
        # the two-stage matmul DFT costs O(sqrt(Nf)) MACs/point (not
        # O(log Nf)) so the overlap fraction dominates.  Measured on v5e
        # at K=256 (split tier, C=256): Nf=1024 3.7, 2048 4.0, 4096 5.18
        # (beats the XLA overlap-add path's 4.3), 8192 5.0 Gsamp/s.
        Nf = 4096
        while Nf < 16 * max(ntaps - 1, 1):
            Nf *= 2
        Nf = min(Nf, 16384)
    assert Nf % _L == 0 and (Nf & (Nf - 1)) == 0, Nf
    if Nf < V + _L:
        raise ValueError(
            f"filter too long for the pallas OLA engine: ntaps={ntaps} "
            f"needs overlap V={V} but the largest FFT size is "
            f"{Nf} (< V + {_L}); use the XLA engine (OlaFft engine='xla') "
            f"for filters this long.")
    return Nf, Nf - V, V


def _kernel(xr_ref, xi_ref, h0r_ref, h0i_ref, hr_ref, hi_ref,
            f1r_ref, f1i_ref, f1s_ref, f1d_ref, twr_ref, twi_ref,
            f2r_ref, f2i_ref, f2s_ref, f2d_ref,
            yr_ref, yi_ref, houtr_ref, houti_ref, histr_ref, histi_ref,
            *, hop_rows: int, split: bool = False):
    f = pl.program_id(1)
    nv = histr_ref.shape[0]                  # V / 128 rows

    @pl.when(f == 0)
    def _():
        # initial input history: zeros for a fresh signal, or the carried
        # tail of the previous streaming step (h0)
        histr_ref[...] = h0r_ref[0]
        histi_ref[...] = h0i_ref[0]

    mm = _dft_mm(split)
    # 1. window assembly, TB windows per grid step stacked along the ROW
    #    axis — with the BLOCK-DIAGONAL stage-1 factors every matmul below
    #    is a full (tb*N1, tb*N1) x (tb*N1, 128) MXU op (a lone window
    #    would use only N1 of 128 sublanes):
    #    rows = [hist | TB*Ne block rows]; window w = rows[w*Ne/128 :][:N1]
    rows_r = jnp.concatenate([histr_ref[...], xr_ref[0, 0]], axis=0)
    rows_i = jnp.concatenate([histi_ref[...], xi_ref[0, 0]], axis=0)
    histr_ref[...] = rows_r[-nv:]
    histi_ref[...] = rows_i[-nv:]
    hop = hop_rows                           # Ne / 128
    tb = xr_ref.shape[2] // hop              # windows per grid step
    n1 = nv + hop                            # Nf / 128
    Xr = jnp.concatenate([rows_r[w * hop: w * hop + n1]
                          for w in range(tb)], axis=0)  # (tb*n1, 128)
    Xi = jnp.concatenate([rows_i[w * hop: w * hop + n1]
                          for w in range(tb)], axis=0)

    # 2. forward DFT -> [k1, q] layout; F1 is kron(I_tb, F_N1), TW/H are
    #    row-tiled per window (prepared host-side)
    F1r, F1i = f1r_ref[...], f1i_ref[...]
    TWr, TWi = twr_ref[...], twi_ref[...]
    F2r, F2i = f2r_ref[...], f2i_ref[...]
    if split:
        # Karatsuba 3-mult complex matmuls throughout (split tier): the
        # four complex matmul groups drop 16 -> 12 MXU passes.  Fs/Fd =
        # F_r +/- F_i are host-precomputed; the conjugated inverse stages
        # use the DIFFERENCE factor (conj flips the cross-term sign).
        # "highest" keeps the 4-mult form (fewer rounding terms).
        F1s, F1d = f1s_ref[...], f1d_ref[...]
        F2s, F2d = f2s_ref[...], f2d_ref[...]
        a1 = mm("kn,nm->km", F1r, Xr)
        a2 = mm("kn,nm->km", F1i, Xi)
        a3 = mm("kn,nm->km", F1s, Xr + Xi)
        Ar = a1 - a2
        Ai = a3 - a1 - a2
        Br = Ar * TWr - Ai * TWi
        Bi = Ar * TWi + Ai * TWr
        s1 = mm("kn,qn->kq", Br, F2r)
        s2 = mm("kn,qn->kq", Bi, F2i)
        s3 = mm("kn,qn->kq", Br + Bi, F2s)
        Sr = s1 - s2
        Si = s3 - s1 - s2
    else:
        Ar = mm("kn,nm->km", F1r, Xr) - mm("kn,nm->km", F1i, Xi)
        Ai = mm("kn,nm->km", F1r, Xi) + mm("kn,nm->km", F1i, Xr)
        Br = Ar * TWr - Ai * TWi
        Bi = Ar * TWi + Ai * TWr
        Sr = mm("kn,qn->kq", Br, F2r) - mm("kn,qn->kq", Bi, F2i)
        Si = mm("kn,qn->kq", Br, F2i) + mm("kn,qn->kq", Bi, F2r)

    # 3. frequency response (already row-tiled in the [k1, q] layout)
    Hr, Hi = hr_ref[...], hi_ref[...]
    Yr = Sr * Hr - Si * Hi
    Yi = Sr * Hi + Si * Hr

    # 4. inverse DFT straight back to the natural (n1, n2) layout: lane
    #    matmul with conj(F2), conj twiddle, block-diag sublane matmul
    #    with conj(F1) (F_N1 is symmetric), 1/N scale
    n = n1 * _L
    if split:
        c1 = mm("kq,nq->kn", Yr, F2r)
        c2 = mm("kq,nq->kn", Yi, F2i)
        c3 = mm("kq,nq->kn", Yr + Yi, F2d)     # F2d = F2r - F2i
        Cr = c1 + c2
        Ci = c3 - c1 + c2
        Dr = Cr * TWr + Ci * TWi
        Di = Ci * TWr - Cr * TWi
        d1 = mm("nk,km->nm", F1r, Dr)
        d2 = mm("nk,km->nm", F1i, Di)
        d3 = mm("nk,km->nm", F1d, Dr + Di)     # F1d = F1r - F1i
        yr = (d1 + d2) / n
        yi = (d3 - d1 + d2) / n
    else:
        Cr = mm("kq,nq->kn", Yr, F2r) + mm("kq,nq->kn", Yi, F2i)
        Ci = mm("kq,nq->kn", Yi, F2r) - mm("kq,nq->kn", Yr, F2i)
        Dr = Cr * TWr + Ci * TWi
        Di = Ci * TWr - Cr * TWi
        yr = (mm("nk,km->nm", F1r, Dr) + mm("nk,km->nm", F1i, Di)) / n
        yi = (mm("nk,km->nm", F1r, Di) - mm("nk,km->nm", F1i, Dr)) / n

    # 5. keep each window's valid tail (overlap-save discard); publish the
    #    carried input history (last write per channel = streaming state)
    y3r = yr.reshape(tb, n1, _L)
    y3i = yi.reshape(tb, n1, _L)
    yr_ref[0, 0] = y3r[:, nv:].reshape(tb * hop, _L)
    yi_ref[0, 0] = y3i[:, nv:].reshape(tb * hop, _L)
    houtr_ref[0] = histr_ref[...]
    houti_ref[0] = histi_ref[...]


def _pick_tbw(nblk: int, Nf: int) -> int:
    """Windows per grid step: enough to make the batched matmuls tall
    (aim ~16 windows, ~2 MB working set), constrained to divide nblk."""
    tb = max(1, min(16, (1 << 21) // (Nf * 8)))
    while nblk % tb:
        tb -= 1
    return tb


@functools.partial(jax.jit,
                   static_argnames=("ntaps", "Nf", "interpret", "precision"))
def _ola_filter_planes(xr, xi, h0r, h0i, Hr, Hi, ntaps: int, Nf: int,
                       interpret: bool, precision: str):
    C, nblk, ne_rows, _ = xr.shape
    Nf_, Ne, V = ola_plan(ntaps, Nf)
    nv = V // _L
    tbw = _pick_tbw(nblk, Nf)
    nsteps = nblk // tbw
    xr = xr.reshape(C, nsteps, tbw * ne_rows, _L)
    xi = xi.reshape(C, nsteps, tbw * ne_rows, _L)
    F1r, F1i, TWr, TWi, F2r, F2i = dft_factors(Nf)
    # block-diagonal stage-1 factors + row-tiled twiddles/response so the
    # per-step matmuls are (tbw*N1, tbw*N1) x (tbw*N1, 128) — full MXU
    eye = np.eye(tbw, dtype=np.float32)
    F1r = np.kron(eye, F1r)
    F1i = np.kron(eye, F1i)
    if precision == "split":
        F1s, F1d = F1r + F1i, F1r - F1i  # Karatsuba factors (split tier)
        F2s, F2d = F2r + F2i, F2r - F2i
    else:
        # "highest" never reads the Karatsuba factors — pass dummies so
        # they don't occupy VMEM (at Nf=16384 the kron'd F1 pair alone is
        # ~34 MB) or HBM->VMEM DMA
        F1s = F1d = F2s = F2d = np.zeros((1, 1), np.float32)
    TWr = np.tile(TWr, (tbw, 1))
    TWi = np.tile(TWi, (tbw, 1))
    Hr = jnp.tile(Hr, (tbw, 1))
    Hi = jnp.tile(Hi, (tbw, 1))
    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, 1, tbw * ne_rows, _L),
                         lambda c, f: (c, f, 0, 0),
                         memory_space=pltpu.VMEM)
    hspec = lambda: pl.BlockSpec((1, nv, _L), lambda c, f: (c, 0, 0),
                                 memory_space=pltpu.VMEM)
    yr, yi, hor, hoi = pl.pallas_call(
        functools.partial(_kernel, hop_rows=ne_rows,
                          split=(precision == "split")),
        grid=(C, nsteps),
        in_specs=[bspec, bspec, hspec(), hspec()] + [const()] * 12,
        out_specs=[bspec, bspec, hspec(), hspec()],
        out_shape=[jax.ShapeDtypeStruct(xr.shape, jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((C, nv, _L), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((nv, _L), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xr, xi, h0r, h0i, Hr, Hi,
      jnp.asarray(F1r), jnp.asarray(F1i), jnp.asarray(F1s),
      jnp.asarray(F1d), jnp.asarray(TWr), jnp.asarray(TWi),
      jnp.asarray(F2r), jnp.asarray(F2i), jnp.asarray(F2s),
      jnp.asarray(F2d))
    return (yr.reshape(C, nblk, ne_rows, _L),
            yi.reshape(C, nblk, ne_rows, _L), hor, hoi)


def _freq_response(h, Nf: int):
    """H in the kernel's [k1, q] layout: H[k], k = q*N1 + k1."""
    H = np.fft.fft(np.asarray(h), Nf).astype(np.complex128)
    H = H.reshape(_L, Nf // _L).T
    return (jnp.asarray(np.ascontiguousarray(H.real), jnp.float32),
            jnp.asarray(np.ascontiguousarray(H.imag), jnp.float32))


def ola_stream_planes(x: jax.Array, state: jax.Array,
                      Hr: jax.Array, Hi: jax.Array, ntaps: int, Nf: int,
                      precision: str = "highest",
                      interpret: bool | None = None):
    """Jit-safe streaming core: complex x (C, N) with N a multiple of the
    hop, complex state (C, V), H already in the [k1, q] layout as traced
    re/im arrays.  Returns complex (y, new_state)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    Nf, Ne, V = ola_plan(ntaps, Nf)
    C, N = x.shape
    assert N % Ne == 0, (N, Ne)
    nblk = N // Ne
    shape4 = (C, nblk, Ne // _L, _L)
    hist3 = (C, V // _L, _L)
    yr, yi, hor, hoi = _ola_filter_planes(
        jnp.real(x).astype(jnp.float32).reshape(shape4),
        jnp.imag(x).astype(jnp.float32).reshape(shape4),
        jnp.real(state).astype(jnp.float32).reshape(hist3),
        jnp.imag(state).astype(jnp.float32).reshape(hist3),
        Hr, Hi, ntaps, Nf, interpret, precision)
    y = (yr + 1j * yi).astype(complex_dtype).reshape(C, N)
    new_state = (hor + 1j * hoi).astype(complex_dtype).reshape(C, V)
    return y, new_state


def ola_filter_stream(x: jax.Array, h, state, Nf: int | None = None,
                      precision: str = "highest",
                      interpret: bool | None = None):
    """Streaming fused overlap-save filtering: x (C, N) with N a multiple
    of the hop Ne (ola_plan), state = (C, V) complex input history (zeros
    initially).  Returns (y, new_state) — exact continuation semantics.

    NOTE: this convenience form recomputes the host-side tap FFT and
    re-uploads H(f) on EVERY call — fine for one-shot use, wasteful in a
    per-block serving loop.  For streaming, compute Hr/Hi once and call
    :func:`ola_stream_planes` per block, as ``OlaFft.step`` does."""
    h = np.asarray(h)
    K = len(h)
    Nf, Ne, V = ola_plan(K, Nf)
    out_complex = jnp.iscomplexobj(x) or np.iscomplexobj(h)
    Hr, Hi = _freq_response(h, Nf)
    y, new_state = ola_stream_planes(x.astype(complex_dtype),
                                     state.astype(complex_dtype),
                                     Hr, Hi, K, Nf, precision, interpret)
    if not out_complex:
        y = jnp.real(y)
    return y, new_state


def ola_filter(x: jax.Array, h, Nf: int | None = None,
               precision: str = "highest",
               interpret: bool | None = None) -> jax.Array:
    """Causal FIR filtering of (C, N) or (N,) signals through the fused
    overlap-save kernel; same semantics as filter_rt.fir_filter (zero
    initial state), real or COMPLEX taps.  N is padded internally to a
    multiple of the hop and sliced back."""
    h = np.asarray(h)
    K = len(h)
    Nf, Ne, V = ola_plan(K, Nf)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    C, N = x.shape
    pad = (-N) % Ne
    from ...block import safe_pad
    xp = safe_pad(x, 0, pad, axis=-1)
    state = jnp.zeros((C, V), complex_dtype)
    y, _ = ola_filter_stream(xp, h, state, Nf=Nf, precision=precision,
                             interpret=interpret)
    y = y[:, :N]
    return y[0] if squeeze else y
