"""Pallas TPU kernel: fully fused FIR + framed periodogram.

The complete BASELINE metric chain (256-tap FIR then 4096-point power
spectra, accumulated) in ONE kernel: the FIR output never exists in HBM.

Per grid step (channel c, chunk f):
  1. FIR on a tile of TB*32 frames of 128 samples via the banded-Toeplitz
     matmuls Y[r] = sum_d X[r-d] @ G_d (see ops/filter_rt.py), with the
     previous chunk's trailing frames carried in VMEM scratch (the grid is
     sequential per channel; scratch resets at each channel's first chunk —
     zero initial filter state per channel, matching fir_filter semantics).
  2. DFT-4096 of the filtered frames via the lane-friendly 32x128
     Cooley-Tukey factorization (see periodogram.py).
  3. |X|^2 accumulated into a per-channel (32,128) accumulator that stays
     resident in VMEM across chunks (output revisiting).

HBM traffic: one read of x + one tiny write of spectra — the floor.  Note
that minimal HBM traffic does NOT make the kernel HBM-bound: measured on
v5e it runs at ~6-13% of the HBM roofline and ~40% of its MXU-issue
roofline across precision tiers, bound by Mosaic's in-order MXU<->VPU
dependency chain (the units' costs add instead of overlapping).  See
docs/ROOFLINE.md for the full measured analysis, the marginal-cost model,
and the three negative restructuring experiments.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .periodogram import _dft_mm, _factors, _N1, _N2, _NFFT, _pack_factors

__all__ = ["fir_periodogram4096"]

_L = 128


def _kernel(*refs, prec: str = "highest", pipe: int = 1,
            fir_passes: int = 3,
            halo_axis: str | None = None,
            mesh_axes: Tuple[str, ...] = ()):
    if halo_axis is None:
        (x_ref, g_ref, hist0_ref, f32r_ref, f32i_ref, f128r_ref, f128i_ref,
         f128s_ref, twr_ref, twi_ref, acc_ref, hist_ref) = refs
    else:
        (x_ref, g_ref, hist0_ref, tail_ref, f32r_ref, f32i_ref, f128r_ref,
         f128i_ref, f128s_ref, twr_ref, twi_ref, acc_ref, hist_ref,
         histrecv_ref, send_sem, recv_sem) = refs
    split = prec in ("split", "bf16", "int8", "int16")
    c = pl.program_id(0)
    f = pl.program_id(1)
    D = g_ref.shape[0]

    if halo_axis is not None:
        # Fused halo exchange (SURVEY §5.8 / step 6): at the very first
        # grid step each time shard pushes its own input tail — the next
        # shard's initial FIR state — straight into the right neighbor's
        # VMEM with ONE remote DMA riding ICI; no XLA ppermute pass over
        # the input.  The barrier semaphore guarantees the neighbor's
        # kernel instance has started before the DMA lands (the standard
        # collective_id handshake).
        @pl.when(jnp.logical_and(c == 0, f == 0))
        def _():
            my = jax.lax.axis_index(halo_axis)
            n = jax.lax.axis_size(halo_axis)
            right = jax.lax.rem(my + 1, n)
            left = jax.lax.rem(my + n - 1, n)

            def coords(t):
                # full mesh coordinates: own index on every other axis
                return tuple(t if a == halo_axis else jax.lax.axis_index(a)
                             for a in mesh_axes)

            bsem = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(
                bsem, device_id=coords(right),
                device_id_type=pltpu.DeviceIdType.MESH)
            pltpu.semaphore_signal(
                bsem, device_id=coords(left),
                device_id_type=pltpu.DeviceIdType.MESH)
            pltpu.semaphore_wait(bsem, 2)
            copy = pltpu.make_async_remote_copy(
                src_ref=tail_ref, dst_ref=histrecv_ref,
                send_sem=send_sem, recv_sem=recv_sem,
                device_id=coords(right),
                device_id_type=pltpu.DeviceIdType.MESH)
            copy.start()
            copy.wait()

            @pl.when(my == 0)
            def _():
                # leftmost shard: fresh stream — the ring delivered the
                # last shard's tail here; replace it with the caller's
                # initial state (zeros for a fresh signal)
                histrecv_ref[...] = hist0_ref[...]

    @pl.when(f == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        # initial FIR state: zeros for a fresh signal, or the left
        # neighbor's tail when the time axis is sharded (parallel/halo.py
        # ppermute form, or the fused remote-DMA form above)
        if halo_axis is None:
            hist_ref[...] = hist0_ref[0]
        else:
            hist_ref[...] = histrecv_ref[c]

    hp = jax.lax.Precision.HIGHEST
    mm = _dft_mm(split)
    dot = functools.partial(jnp.dot, precision=hp,
                            preferred_element_type=jnp.float32)

    xraw = x_ref[0]                          # (ROWS, 128), input dtype
    rows = xraw.shape[0]
    f32 = jnp.float32
    # ---- stage 1: FIR as Toeplitz matmuls with carried history ----
    # ONE input-side concat builds the extended window [hist | x]; each
    # tap-block reads a sublane-shifted SLICE of it (measured ~10% faster
    # than shifting the f32 RESULTS with a concat per tap-block — the
    # window is input-dtype and copied once, the results are always f32).
    # Precision tiers:
    # "split": FIR via a manual 3-pass bf16 hi/lo decomposition
    # (a@b ~ ah@bh + al@bh + ah@bl, dropping the ~2^-18 al@bl term) —
    # near-fp32 accuracy at half the MXU passes of HIGHEST; the DFT
    # stages run single-pass bf16 (see _dft_mm).
    # "bf16": the INPUT ARRAY is bfloat16 (half the HBM traffic of f32 —
    # this kernel is memory-bound, so ~2x); FIR is a single bf16 pass.
    # "int8": the INPUT ARRAY is int8 ADC samples (1/4 the HBM traffic of
    # f32); int8 -> bf16 is exact (|x| <= 127 needs 7 mantissa bits), so
    # accuracy matches the bf16 tier while reading 4x fewer bytes.
    # "int16": lossless ADC ingest at 2 B/sample — int16 -> f32 is exact
    # and the bf16 hi/lo split represents both halves exactly (hi: top 8
    # mantissa bits; lo: |x - hi| <= 2^7, an integer, exact in bf16), so
    # accuracy equals the f32 "split" tier at half the HBM bytes.
    if D > 1:
        xx = jnp.concatenate([hist_ref[...], xraw], axis=0)
        hist_ref[...] = xraw[rows - (D - 1):, :]
        off = D - 1
    else:
        xx = xraw
        off = 0

    if prec in ("bf16", "int8"):
        xb = xx.astype(jnp.bfloat16)

        def fdot(sl, g):
            return jnp.dot(xb[sl], g.astype(jnp.bfloat16),
                           preferred_element_type=f32)
    elif prec in ("split", "int16"):
        xf = xx.astype(f32)
        xh = xf.astype(jnp.bfloat16)
        xl = (xf - xh.astype(f32)).astype(jnp.bfloat16)

        if fir_passes == 2:
            # 2-pass variant: y = x @ round_bf16(G) computed EXACTLY for
            # int16 input (xh + xl == x, both halves exact in bf16; for
            # f32 input the 2^-16 residual of the hi/lo split is the only
            # input error).  The tap matrices are bf16-rounded (~2^-9
            # relative coefficient rounding, i.e. a bf16-coefficient FIR
            # — standard DSP coefficient quantization); drops 1/3 of the
            # FIR MXU passes, the kernel's largest MXU term.
            def fdot(sl, g):
                gh = g.astype(jnp.bfloat16)
                return (jnp.dot(xh[sl], gh, preferred_element_type=f32)
                        + jnp.dot(xl[sl], gh, preferred_element_type=f32))
        else:
            def fdot(sl, g):
                gh = g.astype(jnp.bfloat16)
                gl = (g - gh.astype(f32)).astype(jnp.bfloat16)
                return (jnp.dot(xh[sl], gh, preferred_element_type=f32)
                        + jnp.dot(xl[sl], gh, preferred_element_type=f32)
                        + jnp.dot(xh[sl], gl, preferred_element_type=f32))
    else:
        fdot = lambda sl, g: dot(xx[sl].astype(f32), g)

    # ---- stage 2 helpers: DFT-4096 + power, per row-slab ----
    # When the F32 factor arrives as a (128,128) block-diagonal (4 frames
    # per MXU tile, see the host wrapper), every DFT matmul runs with a
    # full 128-deep contraction/sublane extent — without the packing, the
    # (32,*) stage-A/B matmuls are padded to whole 128^3 MXU tiles and the
    # kernel wastes ~3/4 of its MXU issue slots.
    F32r, F32i = f32r_ref[...], f32i_ref[...]
    F128r, F128i = f128r_ref[...], f128i_ref[...]
    TWr, TWi = twr_ref[...], twi_ref[...]
    packed = F32r.shape[0] == _N2
    nsub = _N2 if packed else _N1

    def fir(lo, nr):                               # MXU
        y = fdot(slice(off + lo, off + lo + nr), g_ref[0])
        for d in range(1, D):
            y = y + fdot(slice(off + lo - d, off + lo - d + nr), g_ref[d])
        return y

    def stage_a(acc_y):                            # MXU (real input)
        Xm = acc_y.reshape(acc_y.shape[0] // nsub, nsub, _N2)
        return (mm("kn,bnm->bkm", F32r, Xm), mm("kn,bnm->bkm", F32i, Xm))

    def twiddle(Ar, Ai):                           # VPU
        return Ar * TWr - Ai * TWi, Ar * TWi + Ai * TWr

    def stage_b(Br, Bi):                           # MXU
        if split:
            # Karatsuba 3-mult complex matmul: stage B drops from 4 MXU
            # passes to 3 (F128s = F128r + F128i precomputed host-side);
            # measured +4-6% whole-kernel across split/bf16/int8 tiers.
            # The "highest" tier keeps 4-mult (fewer rounding terms).
            t1 = mm("bkn,qn->bkq", Br, F128r)
            t2 = mm("bkn,qn->bkq", Bi, F128i)
            t3 = mm("bkn,qn->bkq", Br + Bi, f128s_ref[...])
            return t1 - t2, t3 - t1 - t2
        return (mm("bkn,qn->bkq", Br, F128r) - mm("bkn,qn->bkq", Bi, F128i),
                mm("bkn,qn->bkq", Br, F128i) + mm("bkn,qn->bkq", Bi, F128r))

    def power(Xr, Xi):                             # VPU
        P = jnp.sum(Xr * Xr + Xi * Xi, axis=0)
        if packed:
            P = P.reshape(_N2 // _N1, _N1, _N2).sum(axis=0)
        return P

    if pipe == 1:
        A = stage_a(fir(0, rows))
        P = power(*stage_b(*twiddle(*A)))
    else:
        # Software pipeline over `pipe` independent row slabs: the trace
        # alternates MXU stages of slab h+1 with VPU stages of slab h, so
        # Mosaic's in-order issue can overlap the units (the full-batch
        # trace serializes on the MXU->VPU->MXU dependency chain; stage
        # ablation shows only ~30% natural overlap).
        nr = rows // pipe
        A = [None] * pipe                     # stage-A outputs in flight
        B = [None] * pipe                     # post-twiddle in flight
        X = [None] * pipe                     # stage-B outputs in flight
        P = None
        for h in range(pipe + 1):
            if h < pipe:
                A[h] = stage_a(fir(h * nr, nr))          # MXU slab h
            if 0 <= h - 1 < pipe:
                X[h - 1] = stage_b(*B[h - 1])            # MXU slab h-1
            if h < pipe:
                B[h] = twiddle(*A[h])                    # VPU slab h
            if 0 <= h - 1 < pipe:
                Ph = power(*X[h - 1])                    # VPU slab h-1
                P = Ph if P is None else P + Ph
    acc_ref[...] += P[None]


@functools.partial(jax.jit,
                    static_argnames=("interpret", "precision", "tb", "pipe",
                                     "fir_passes", "halo_axis", "mesh_axes"))
def fir_periodogram4096(x: jax.Array, G: jax.Array,
                        hist0: jax.Array | None = None,
                        interpret: bool = False,
                        precision: str = "highest",
                        tb: int = 16, pipe: int = 1,
                        fir_passes: int = 3,
                        halo_axis: str | None = None,
                        mesh_axes: Tuple[str, ...] = ()) -> jax.Array:
    """x: (C, N) float32 (N % 65536 == 0); G: (D, 128, 128) Toeplitz tap
    matrices (fir_toeplitz_mats).  Returns (C, 4096) accumulated power
    spectra of the FIR-filtered signal (zero initial state per channel).

    hist0: optional (C, max(D-1,1), 128) initial FIR history per channel
    (the last (D-1)*128 input samples preceding x) — used by the sharded
    time-parallel wrapper (parallel/halo.py) to hand each time shard its
    left neighbor's tail.  None = zero initial state.

    precision: "highest" runs every matmul as 6-pass fp32 emulation;
    "split" runs the FIR as a 3-pass bf16 hi/lo decomposition (~1e-5
    relative, near-fp32) and the DFT stages as native single-pass bf16
    matmuls — within the reference's own 1e-2 large-n FFT tolerance
    (/root/reference/core/tests/test-fourier.cc:256) at a fraction of the
    MXU passes (see tests/test_pallas.py accuracy tests); "bf16" ingests
    the input as bfloat16 (half the HBM bytes of the memory-bound kernel);
    "int8" ingests raw int8 ADC samples (quarter the bytes; int8->bf16 is
    exact so compute accuracy equals the bf16 tier); "int16" ingests raw
    int16 ADC samples losslessly at half the bytes (split-tier
    accuracy).

    pipe: number of independent row slabs software-pipelined inside each
    grid step (1 = single full-batch trace).  pipe=2 interleaves the MXU
    stages of one slab with the VPU stages of the other so the units can
    overlap; numerically identical per slab (only the final accumulate
    associates additions differently).

    fir_passes (split/int16 tiers only): 3 (default) = the full hi/lo
    decomposition (near-fp32 taps); 2 = bf16-rounded tap matrices with the
    input still carried exactly (int16: bit-exact x @ round_bf16(G); f32:
    2^-16 input residual) — drops the kernel's single largest MXU term
    (FIR is 768 of 1408 MACs/sample) for ~2^-9 coefficient rounding, the
    standard fixed-point-DSP trade the reference itself makes in its CIC
    integer runtime (cic.cc:12-101).

    halo_axis/mesh_axes: when called inside shard_map with the signal's
    time axis sharded, halo_axis names that mesh axis and mesh_axes lists
    ALL mesh axis names in order; the kernel then performs the overlap
    halo exchange ITSELF with one `make_async_remote_copy` over ICI (x is
    the local shard; hist0 is consumed only by the leftmost shard).  The
    ppermute form (parallel/halo.py + hist0) remains the default engine;
    see parallel/chain.py `halo=`."""
    C, N = x.shape
    rows = tb * _N1
    chunk = rows * _L
    assert N % chunk == 0, f"N must be a multiple of {chunk}"
    assert precision in ("highest", "split", "bf16", "int8", "int16")
    if precision in ("int8", "int16"):
        # SDR ADC ingest: caller hands raw integer samples (outputs are in
        # lsb^2 units — scale spectra by (lsb volts)^2 on the host).
        xdt = jnp.dtype(precision)
        assert x.dtype == xdt, f"precision='{precision}' expects {xdt} input"
    else:
        xdt = jnp.bfloat16 if precision == "bf16" else jnp.float32
        x = x.astype(xdt)
    nchunks = N // chunk
    nsub_rows = 4 * _N1 if tb % 4 == 0 else _N1   # rows per DFT slab unit
    assert pipe == 1 or rows % (pipe * nsub_rows) == 0, (pipe, rows)
    D = G.shape[0]
    H = max(D - 1, 1)
    if hist0 is None:
        hist0 = jnp.zeros((C, H, _L), xdt)
    assert hist0.shape == (C, H, _L), hist0.shape
    F32r, F32i, F128r, F128i, TWr, TWi = _factors()
    if tb % 4 == 0:
        # pack 4 frames per MXU tile (shared helper — one copy of the
        # block-diagonal/tile construction)
        F32r, F32i, TWr, TWi = _pack_factors(F32r, F32i, TWr, TWi)
    F128s = F128r + F128i            # Karatsuba stage-B factor
    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    consts = (jnp.asarray(F32r), jnp.asarray(F32i),
              jnp.asarray(F128r), jnp.asarray(F128i), jnp.asarray(F128s),
              jnp.asarray(TWr), jnp.asarray(TWi))
    if halo_axis is None:
        acc = pl.pallas_call(
            functools.partial(_kernel, prec=precision, pipe=pipe,
                              fir_passes=fir_passes),
            grid=(C, nchunks),
            in_specs=[
                pl.BlockSpec((1, rows, _L), lambda c, f: (c, f, 0),
                             memory_space=pltpu.VMEM),
                const(),
                pl.BlockSpec((1, H, _L), lambda c, f: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                const(), const(), const(), const(), const(), const(),
                const(),
            ],
            out_specs=pl.BlockSpec((1, _N1, _N2), lambda c, f: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, _N1, _N2), jnp.float32),
            scratch_shapes=[pltpu.VMEM((H, _L), xdt)],
            interpret=interpret,
        )(x.reshape(C, nchunks * rows, _L),
          G.astype(jnp.float32), hist0.astype(xdt), *consts)
    else:
        # fused-halo form: this shard's own input tail rides a remote DMA
        # to the right neighbor inside the kernel (see _kernel prologue)
        assert mesh_axes and halo_axis in mesh_axes, (halo_axis, mesh_axes)
        tail = x[:, N - H * _L:].reshape(C, H, _L)
        acc = pl.pallas_call(
            functools.partial(_kernel, prec=precision, pipe=pipe,
                              fir_passes=fir_passes,
                              halo_axis=halo_axis, mesh_axes=mesh_axes),
            grid=(C, nchunks),
            in_specs=[
                pl.BlockSpec((1, rows, _L), lambda c, f: (c, f, 0),
                             memory_space=pltpu.VMEM),
                const(), const(), const(),
                const(), const(), const(), const(), const(), const(),
                const(),
            ],
            out_specs=pl.BlockSpec((1, _N1, _N2), lambda c, f: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, _N1, _N2), jnp.float32),
            scratch_shapes=[pltpu.VMEM((H, _L), xdt),
                            pltpu.VMEM((C, H, _L), xdt),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(collective_id=11),
            # bool True -> the Pallas TPU interpret machinery (simulates
            # the inter-device DMAs/semaphores on CPU); callers may pass
            # an InterpretParams directly (e.g. detect_races=True)
            interpret=(interpret if not isinstance(interpret, bool)
                       else (pltpu.InterpretParams() if interpret
                             else False)),
        )(x.reshape(C, nchunks * rows, _L),
          G.astype(jnp.float32), hist0.astype(xdt), tail, *consts)
    return acc.swapaxes(-1, -2).reshape(C, _NFFT)
