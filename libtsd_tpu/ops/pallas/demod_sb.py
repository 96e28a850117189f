"""Pallas TPU kernel: batched sub-block decision-directed demodulator.

The XLA sub-block demod (models/demod_sb.py::_step_batched) saturates
~1.2 Gsamp/s aggregate at C=4096 on a v5e: its lax.scan body round-trips
the per-channel loop state and the dense (C, S, Fv) window algebra through
HBM every sub-block, and XLA's fusion of the take+einsum pattern tops out
well below the VPU's rate.  This kernel runs the SAME loop equations with

  * channels in the LANE dimension (a 128-channel tile per grid step) —
    every per-channel quantity is a (1, 128) vector and all the dense
    sub-block algebra vectorizes across lanes at VPU width;
  * the loop state (pointer, carrier phase, gain, loop filter, Gardner
    history — 8 scalars/channel) resident in VMEM scratch across the
    sequential sub-block grid dimension: ZERO HBM state round-trips;
  * the matched-filter frames streamed in by the BlockSpec grid pipeline
    (double-buffered DMA), one (F, 128) tile per sub-block;
  * fractional-delay taps evaluated in closed form per channel (cspline/
    linear/Lagrange/windowed-sinc — same LUT-phase quantization as the
    Interpolator, so values match the LUT path bit-for-bit in f32);
  * the per-channel integer window offset applied by the same one-hot
    tap-mixing trick as the XLA path (iota compare + K multiply-adds);
  * decisions via an unrolled min-scan over the M constellation points,
    and the DD phase error via the polynomial atan2 (Mosaic has no atan2
    primitive — ops/pallas/fm.py).

Loop math parity: models/demod_sb.py docstring; reference anchor
DemodGen2 (core/src/telecom/demod-dec.cc:193-625) with RecHorloge's
per-sample interpolation replaced by the shared-tau sub-block form.
Numerics are validated against the XLA scan path in interpret mode
(tests/test_demod_sb.py) — same formulas, same f32 order where it
matters (the only re-association is the mean/sum reductions).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fm import _atan2_poly

__all__ = ["demod_sb_pallas", "demod_sb_pallas_fused", "fused_layout"]

_CT = 128   # channels per grid tile (lane width)


def _taps_rows(kind: str, tau, nph: int, K: int):
    """Closed-form fractional-delay taps as (K, CT) rows from tau (1, CT).

    Same formulas and LUT-phase quantization as ops/resample.py's
    builders (cspline_coefs / linear_coefs / lagrange_coefs /
    sinc_interp_coefs with their make_interpolator defaults), evaluated
    with VPU ops only — no per-channel gather."""
    t = jnp.round(jnp.clip(tau, 0.0, 1.0) * nph) / nph   # (1, CT)
    if kind == "cspline":
        h0 = (1 + 2 * t) * (t - 1) ** 2
        h1 = t * (t - 1) ** 2
        h2 = t * t * (3 - 2 * t)
        h3 = t * t * (t - 1)
        rows = [-h1 / 2, h0 - h3 / 2, h2 + h1 / 2, h3 / 2]
    elif kind == "linear":
        rows = [1 - t, t]
    elif kind == "lagrange":
        d = K - 1
        tt = t + (d - 1.0) / 2
        rows = []
        for i in range(d + 1):
            hh = jnp.ones_like(tt)
            for j in range(d + 1):
                if i != j:
                    hh = hh * (tt - j) / (i - j)
            rows.append(hh)
    elif kind == "sinc":
        nc, fcut = K, 0.5
        rows = []
        for i in range(nc):
            k = i - nc // 2 - t
            x = 2 * fcut * k
            px = jnp.pi * x
            s = jnp.where(jnp.abs(px) < 1e-6, 1.0 - px * px / 6.0,
                          jnp.sin(px) / jnp.where(px == 0, 1.0, px))
            hh = 2 * fcut * s
            # tau-shifted Hann window (sinc_interp_coefs, fen="hn")
            a, b = 0.5, 0.25
            tw = (np.linspace(-(nc // 2), (nc - 1) // 2, nc)[i] - t) \
                * (2 * np.pi / nc)
            rows.append(hh * (a + 2 * b * jnp.cos(tw)))
        ssum = rows[0]
        for r in rows[1:]:
            ssum = ssum + r
        inv = 1.0 / jnp.where(jnp.abs(ssum) > 1e-12, ssum, 1.0)
        rows = [r * inv for r in rows]
    else:  # pragma: no cover
        raise ValueError(kind)
    return jnp.concatenate(rows, axis=0)                 # (K, CT)


def _pick_tb(nsb: int) -> int:
    """Sub-blocks per grid step: the largest power-of-2 divisor of nsb
    up to 8 (amortizes per-grid-step overhead; shared by the plain
    kernel, fused_layout and the fused kernel so their grids can never
    disagree)."""
    tb = 1
    while tb < 8 and nsb % (tb * 2) == 0:
        tb *= 2
    return tb


def _kernel(fr_r_ref, fr_i_ref, st_in_ref, symr_ref, symi_ref,
            ysr_ref, ysi_ref, sidx_ref, valid_ref, stout_ref, st_ref, *,
            itrp: str, K: int, nph: int, osf: int, S: int, M: int,
            n: int, nsb: int, tb: int, tgain: float, aga: float,
            gamma: float, rho: float, carrier: bool, clock: bool,
            agc: bool, qam_square: int = 0):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        st_ref[...] = st_in_ref[0]

    # tb sub-blocks per grid step (amortizes per-step overhead); the
    # sequential loop-state dependency runs through VMEM scratch
    f32 = jnp.float32
    for tb_i in range(tb):
        # frames may arrive bf16 (half the HBM bytes of the kernel's
        # largest stream; the loops' EVM floor ~0.08 dwarfs the 2^-8
        # rounding)
        _subblock(fr_r_ref[tb_i].astype(f32), fr_i_ref[tb_i].astype(f32),
                  symr_ref, symi_ref,
                  ysr_ref, ysi_ref, sidx_ref, valid_ref, st_ref,
                  t * tb + tb_i, tb_i, itrp=itrp, K=K, nph=nph, osf=osf,
                  S=S, M=M, n=n, tgain=tgain, aga=aga, gamma=gamma,
                  rho=rho, carrier=carrier, clock=clock, agc=agc,
                  qam_square=qam_square)

    @pl.when(t == (nsb // tb) - 1)
    def _():
        stout_ref[0] = st_ref[...]


def _subblock(fr_r, fr_i, symr_ref, symi_ref,
              ysr_ref, ysi_ref, sidx_ref, valid_ref, st_ref,
              sb_idx, tb_i, *, itrp: str, K: int, nph: int, osf: int,
              S: int, M: int, n: int, tgain: float, aga: float,
              gamma: float, rho: float, carrier: bool, clock: bool,
              agc: bool, qam_square: int = 0):
    f32 = jnp.float32
    h = osf // 2
    ML, MH = S * osf, 2 * osf
    Fv = ML + MH + K

    ptr = st_ref[0:1, :]
    theta = st_ref[1:2, :]
    gain = st_ref[2:3, :]
    lf_th = st_ref[3:4, :]
    lf_mu = st_ref[4:5, :]
    lf_last = st_ref[5:6, :]
    ypr = st_ref[6:7, :]
    ypi = st_ref[7:8, :]

    nom = (sb_idx * (S * osf)).astype(f32)
    ready = (ptr + (S - 1) * osf) < n                       # (1, CT)
    pc = jnp.where(ready, ptr, nom + osf / 2.0)
    ip = jnp.floor(pc)
    tau = pc - ip
    o_raw = ip - nom + ML
    o = jnp.clip(o_raw, 0, ML + MH).astype(jnp.int32)
    inrange = (o_raw >= 0) & (o_raw <= ML + MH)

    taps = _taps_rows(itrp, tau, nph, K)                    # (K, CT)

    # per-lane shift of the frame by the integer window offset o:
    # sh[u, c] = frame[u + o_c, c], built from log2 conditional UNIFORM
    # shifts (each a static slice + lane select).  This replaces the
    # dense one-hot window dot (S*Fv MACs per array = 76 MACs/sample —
    # 19x the K useful taps) with ~7 selects + K true FMAs; numerically
    # identical (the dropped terms were exact zeros).
    sh_r, sh_i = fr_r, fr_i
    F = fr_r.shape[0]
    nbits = max((ML + MH).bit_length(), 1)
    for d in range(nbits):
        shv = 1 << d
        sel = ((o >> d) & 1) == 1                           # (1, CT)
        mv_r = jnp.concatenate(
            [sh_r[shv:, :], jnp.zeros((shv, _CT), f32)], axis=0)
        mv_i = jnp.concatenate(
            [sh_i[shv:, :], jnp.zeros((shv, _CT), f32)], axis=0)
        sh_r = jnp.where(sel, mv_r, sh_r)
        sh_i = jnp.where(sel, mv_i, sh_i)

    # windows, all S symbols at once per tap k: rows j*osf (+h) + k —
    # contiguous slice + sublane-split reshape instead of a strided
    # slice (stride-osf sublane slices relayout poorly)
    def rows_at(sh, off):
        blk = sh[off:off + S * osf, :].reshape(S, osf, _CT)
        return blk[:, 0, :]                                 # (S, CT)

    yraw_r = jnp.zeros((S, _CT), f32)
    yraw_i = jnp.zeros((S, _CT), f32)
    mraw_r = jnp.zeros((S, _CT), f32)
    mraw_i = jnp.zeros((S, _CT), f32)
    for k in range(K):
        tk = taps[k:k + 1, :]
        mraw_r = mraw_r + tk * rows_at(sh_r, k)
        mraw_i = mraw_i + tk * rows_at(sh_i, k)
        yraw_r = yraw_r + tk * rows_at(sh_r, h + k)
        yraw_i = yraw_i + tk * rows_at(sh_i, h + k)

    # carrier phase ramped inside the sub-block: theta_j = theta + j*mu/S
    # Mosaic: iota must be integer-typed; cast after
    jvec = jax.lax.broadcasted_iota(jnp.int32, (S, _CT), 0).astype(f32)
    theta_j = theta + jvec * (lf_mu / S)
    cr = jnp.cos(theta_j)
    sr = jnp.sin(theta_j)
    # y = y_raw * exp(-i theta) * g
    y_r = (yraw_r * cr + yraw_i * sr) * gain
    y_i = (yraw_i * cr - yraw_r * sr) * gain
    m_r = (mraw_r * cr + mraw_i * sr) * gain
    m_i = (mraw_i * cr - mraw_r * sr) * gain

    if qam_square:
        # square-QAM nearest neighbor = independent per-axis quantization
        # on the uniform +-1 level grid (identical to the min-scan up to
        # exact-tie rounding) — replaces M tile-passes with 2 rounds
        M2 = qam_square
        stepi = (M2 - 1) / 2.0
        ir = jnp.clip(jnp.round((y_r + 1.0) * stepi), 0, M2 - 1)
        ii = jnp.clip(jnp.round((y_i + 1.0) * stepi), 0, M2 - 1)
        ye_r = ir * (2.0 / (M2 - 1)) - 1.0
        ye_i = ii * (2.0 / (M2 - 1)) - 1.0
        sidx = (ir + M2 * ii).astype(jnp.int32)   # column-major grid
    else:
        # decisions: unrolled min-scan over the M constellation points
        mind = jnp.full((S, _CT), 1e30, f32)
        ye_r = jnp.zeros((S, _CT), f32)
        ye_i = jnp.zeros((S, _CT), f32)
        sidx = jnp.zeros((S, _CT), jnp.int32)
        for m in range(M):
            smr = symr_ref[0, m]
            smi = symi_ref[0, m]
            d2 = (y_r - smr) ** 2 + (y_i - smi) ** 2
            better = d2 < mind
            mind = jnp.where(better, d2, mind)
            ye_r = jnp.where(better, smr, ye_r)
            ye_i = jnp.where(better, smi, ye_i)
            sidx = jnp.where(better, m, sidx)

    # Gardner TED over the sub-block (previous symbol carried)
    yp_r = jnp.concatenate([ypr, y_r[:S - 1, :]], axis=0)
    yp_i = jnp.concatenate([ypi, y_i[:S - 1, :]], axis=0)
    e_t = (y_r - yp_r) * m_r + (y_i - yp_i) * m_i
    dec = jnp.clip(tgain * jnp.sum(e_t, axis=0, keepdims=True),
                   -osf / 2.0, osf / 2.0)

    # decision-directed phase error, polynomial atan2
    z_r = y_r * ye_r + y_i * ye_i
    z_i = y_i * ye_r - y_r * ye_i
    nz = (y_r * y_r + y_i * y_i) > 0
    e_ph = jnp.where(nz, _atan2_poly(z_i, z_r), 0.0)
    e_mean = jnp.mean(e_ph, axis=0, keepdims=True)

    # 2nd-order loop filter update (LoopFilter2.step)
    lf_th2 = lf_th + lf_mu
    lf_mu2 = lf_mu + gamma * ((1 + rho) * e_mean - lf_last)
    theta2 = lf_th2

    if agc:
        ymag = jnp.sqrt(y_r * y_r + y_i * y_i)
        yemag = jnp.sqrt(ye_r * ye_r + ye_i * ye_i)
        eg = ymag / jnp.maximum(yemag, 1e-9)
        gain2 = (1 - aga) * gain + aga * jnp.mean(
            1.0 / jnp.maximum(eg, 1e-9), axis=0, keepdims=True)
    else:
        gain2 = gain

    upd = ready & inrange
    ptr_adv = ptr + S * osf - (jnp.where(inrange, dec, 0.0)
                               if clock else 0.0)
    ptr_adv = jnp.where(inrange, ptr_adv, nom + S * osf + osf / 2.0)

    st_ref[0:1, :] = jnp.where(ready, ptr_adv, ptr)
    if carrier:
        st_ref[1:2, :] = jnp.where(upd, theta2, theta)
        st_ref[3:4, :] = jnp.where(upd, lf_th2, lf_th)
        st_ref[4:5, :] = jnp.where(upd, lf_mu2, lf_mu)
        st_ref[5:6, :] = jnp.where(upd, e_mean, lf_last)
    st_ref[2:3, :] = jnp.where(upd, gain2, gain)
    st_ref[6:7, :] = jnp.where(upd, y_r[S - 1:S, :], ypr)
    st_ref[7:8, :] = jnp.where(upd, y_i[S - 1:S, :], ypi)

    ok = upd                                                # (1, CT)
    ysr_ref[tb_i] = jnp.where(ok, y_r, 0.0)
    ysi_ref[tb_i] = jnp.where(ok, y_i, 0.0)
    sidx_ref[tb_i] = jnp.where(ok, sidx, 0)
    valid_ref[tb_i] = jnp.where(ok, jnp.ones((S, _CT), jnp.int32), 0)


@functools.partial(
    jax.jit, static_argnames=("itrp", "K", "nph", "osf", "S", "n",
                              "tgain", "aga", "gamma", "rho", "carrier",
                              "clock", "agc", "qam_square", "interpret"))
def demod_sb_pallas(frames_r: jax.Array, frames_i: jax.Array,
                    state8: jax.Array, sym_r: jax.Array, sym_i: jax.Array,
                    *, itrp: str, K: int, nph: int, osf: int, S: int,
                    n: int, tgain: float, aga: float, gamma: float,
                    rho: float, carrier: bool, clock: bool, agc: bool,
                    qam_square: int = 0, interpret: bool = False
                    ) -> Tuple[jax.Array, jax.Array, jax.Array,
                               jax.Array, jax.Array]:
    """frames_{r,i}: (nsb, F, C) matched-filter frame planes (channels
    LAST); state8: (8, C) packed loop state rows [ptr, theta, gain,
    lf_theta, lf_mu, lf_last, yprev_r, yprev_i]; sym_{r,i}: (M,)
    constellation planes.  C must be a multiple of 128.

    Returns (ysym_r, ysym_i, sidx, valid, state8_out) with the y/sidx/
    valid arrays shaped (nsb, S, C)."""
    nsb, F, C = frames_r.shape
    assert C % _CT == 0, C
    M = sym_r.shape[0]
    ntiles = C // _CT
    # sub-blocks per grid step (see _pick_tb)
    tb = _pick_tb(nsb)
    grid = (ntiles, nsb // tb)
    sym2_r = jnp.broadcast_to(sym_r[None, :, None], (1, M, _CT))
    sym2_i = jnp.broadcast_to(sym_i[None, :, None], (1, M, _CT))
    kern = functools.partial(
        _kernel, itrp=itrp, K=K, nph=nph, osf=osf, S=S, M=M, n=n,
        nsb=nsb, tb=tb, tgain=tgain, aga=aga, gamma=gamma, rho=rho,
        carrier=carrier, clock=clock, agc=agc, qam_square=qam_square)
    fspec = pl.BlockSpec((tb, F, _CT), lambda c, t: (t, 0, c),
                         memory_space=pltpu.VMEM)
    ospec = lambda: pl.BlockSpec((tb, S, _CT), lambda c, t: (t, 0, c),
                                 memory_space=pltpu.VMEM)
    ysr, ysi, sidx, valid, stout = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            fspec, fspec,
            pl.BlockSpec((1, 8, _CT), lambda c, t: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(ospec(), ospec(), ospec(), ospec(),
                   pl.BlockSpec((1, 8, _CT), lambda c, t: (0, 0, c),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((nsb, S, C), jnp.float32),
                   jax.ShapeDtypeStruct((nsb, S, C), jnp.float32),
                   jax.ShapeDtypeStruct((nsb, S, C), jnp.int32),
                   jax.ShapeDtypeStruct((nsb, S, C), jnp.int32),
                   jax.ShapeDtypeStruct((1, 8, C), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((8, _CT), jnp.float32)],
        interpret=interpret,
    )(frames_r, frames_i, state8.reshape(1, 8, C), sym2_r, sym2_i)
    return ysr, ysi, sidx, valid, stout.reshape(8, C)


# --------------------------------------------------------------------------
# Fully fused MF + demod kernel
# --------------------------------------------------------------------------
#
# Partial-step timing at C=4096 (TODO.md round-4 notes) showed the XLA
# prologue — matched filter, AGC normalize, transpose, frame
# materialization — costs ~70% of the batched step even at bf16 MF.  This
# variant moves the WHOLE chain into the kernel:
#
#   * the input signal planes arrive channel-LAST ((rows, C), one XLA
#     transpose of the raw input — the only XLA pass left);
#   * each grid step DMAs one 128-aligned input superframe per channel
#     tile (double-buffered slots, manual make_async_copy — BlockSpec
#     cannot express the overlapping windows);
#   * the matched filter runs in-kernel as transposed banded-Toeplitz
#     MXU matmuls over 128-row sample frames (samples in SUBLANES,
#     channels in lanes: z_f = sum_d Gmf_d^T @ X_{f+1-d}), bf16 single
#     pass — the MF output lives ONLY in VMEM;
#   * the AGC pre-normalizer becomes a STREAMING per-channel power EMA
#     (updated per superframe, applied one superframe late; a fresh
#     stream starts at scale 1 and the decision-directed gain loop
#     absorbs the residual) — the XLA path's same-block normalize would
#     need a second pass over the signal;
#   * the sub-block demod then consumes VMEM-resident MF rows directly.

_APW = 0.25    # power-EMA update per superframe


def fused_layout(osf: int, S: int, K: int, n: int) -> dict:
    """Input-plane layout contract shared by the fused kernel and its
    wrapper: array row r holds input sample x_g = r - XOFF (x_g = 0
    is the first sample of this block; negative x_g is carried
    history), so grid step t superframes start exactly at row
    t*tb*S*osf."""
    hop = S * osf
    nsb = n // hop
    tb = _pick_tb(nsb)
    HOPT = tb * hop
    ML, MH = S * osf, 2 * osf
    F = (ML + MH + K) + (S - 1) * osf + osf // 2
    Z00 = -(ML + (K - 1) + osf // 2)
    Z0a0 = 128 * (Z00 // 128)
    off = Z00 - Z0a0
    SFZ = HOPT + (F - hop)
    nfz = -(-(off + SFZ) // 128)
    nT = nsb // tb
    return dict(tb=tb, hopt=HOPT, nfz=nfz, off=off,
                XOFF=128 - Z0a0,
                rows_total=(nT - 1) * HOPT + 128 * (nfz + 1))


def _fused_kernel(xr_hbm, xi_hbm, st_in_ref, symr_ref, symi_ref,
                  gmf0_ref, gmf1_ref,
                  ysr_ref, ysi_ref, sidx_ref, valid_ref, stout_ref,
                  xbr_ref, xbi_ref, zbr_ref, zbi_ref, st_ref, sems, *,
                  itrp: str, K: int, nph: int, osf: int, S: int, M: int,
                  n: int, nsb: int, tb: int, nfz: int, off: int,
                  rms_ref: float, tgain: float, aga: float, gamma: float,
                  rho: float, carrier: bool, clock: bool, agc: bool,
                  qam_square: int = 0):
    c = pl.program_id(0)
    t = pl.program_id(1)
    f32 = jnp.float32
    hop = S * osf
    HOPT = tb * hop
    XB = 128 * (nfz + 1)
    nT = nsb // tb

    def dma(slot, ti):
        cpr = pltpu.make_async_copy(
            xr_hbm.at[pl.ds(ti * HOPT, XB), pl.ds(c * _CT, _CT)],
            xbr_ref.at[slot], sems.at[slot, 0])
        cpi = pltpu.make_async_copy(
            xi_hbm.at[pl.ds(ti * HOPT, XB), pl.ds(c * _CT, _CT)],
            xbi_ref.at[slot], sems.at[slot, 1])
        return cpr, cpi

    @pl.when(t == 0)
    def _():
        st_ref[...] = st_in_ref[0]
        r, i = dma(0, 0)
        r.start()
        i.start()

    slot = jax.lax.rem(t, 2)
    r, i = dma(slot, t)
    r.wait()
    i.wait()

    @pl.when(t + 1 < nT)
    def _():
        nslot = jax.lax.rem(t + 1, 2)
        r2, i2 = dma(nslot, t + 1)
        r2.start()
        i2.start()

    # ---- in-kernel matched filter: z_f = Gmf0^T @ X_{f+1} + Gmf1^T @ X_f
    g0 = gmf0_ref[...].astype(jnp.bfloat16)
    g1 = gmf1_ref[...].astype(jnp.bfloat16)
    # streaming AGC pre-scale from the PREVIOUS superframes' power EMA
    # (static `agc` gate: with AGC off the raw MF amplitude must pass
    # through untouched, as on the XLA path)
    if agc:
        p_ema = st_ref[8:9, :]
        s = jnp.where(p_ema > 0, rms_ref * jax.lax.rsqrt(
            jnp.maximum(p_ema, 1e-20)), 1.0)
    else:
        s = jnp.ones((1, _CT), f32)
    for f in range(nfz):
        xf1_r = xbr_ref[slot, pl.ds(128 * (f + 1), 128), :].astype(
            jnp.bfloat16)
        xf0_r = xbr_ref[slot, pl.ds(128 * f, 128), :].astype(jnp.bfloat16)
        xf1_i = xbi_ref[slot, pl.ds(128 * (f + 1), 128), :].astype(
            jnp.bfloat16)
        xf0_i = xbi_ref[slot, pl.ds(128 * f, 128), :].astype(jnp.bfloat16)
        mm = functools.partial(jnp.dot, preferred_element_type=f32)
        zbr_ref[pl.ds(128 * f, 128), :] = (mm(g0, xf1_r)
                                           + mm(g1, xf0_r)) * s
        zbi_ref[pl.ds(128 * f, 128), :] = (mm(g0, xf1_i)
                                           + mm(g1, xf0_i)) * s

    # ---- demod sub-blocks straight from the VMEM MF rows
    F = (S * osf + 2 * osf + K) + (S - 1) * osf + osf // 2
    for tb_i in range(tb):
        a = off + tb_i * hop
        _subblock(zbr_ref[a:a + F, :], zbi_ref[a:a + F, :],
                  symr_ref, symi_ref,
                  ysr_ref, ysi_ref, sidx_ref, valid_ref, st_ref,
                  t * tb + tb_i, tb_i, itrp=itrp, K=K, nph=nph, osf=osf,
                  S=S, M=M, n=n, tgain=tgain, aga=aga, gamma=gamma,
                  rho=rho, carrier=carrier, clock=clock, agc=agc,
                  qam_square=qam_square)

    # ---- power EMA update (post-use: the scale above used the previous
    # state, so a fresh stream's first superframe runs at scale 1)
    if agc:
        zr = zbr_ref[pl.ds(off, HOPT), :]
        zi = zbi_ref[pl.ds(off, HOPT), :]
        # undo the applied scale so the EMA tracks the RAW MF power
        pw = jnp.mean(zr * zr + zi * zi, axis=0,
                      keepdims=True) / (s * s)
        st_ref[8:9, :] = jnp.where(p_ema > 0,
                                   (1 - _APW) * p_ema + _APW * pw, pw)

    @pl.when(t == nT - 1)
    def _():
        stout_ref[0] = st_ref[...]


@functools.partial(
    jax.jit, static_argnames=("itrp", "K", "nph", "osf", "S", "n",
                              "rms_ref", "tgain", "aga", "gamma", "rho",
                              "carrier", "clock", "agc", "qam_square",
                              "interpret"))
def demod_sb_pallas_fused(xT_r: jax.Array, xT_i: jax.Array,
                          state9: jax.Array, sym_r: jax.Array,
                          sym_i: jax.Array, g0: jax.Array,
                          g1: jax.Array, *,
                          itrp: str, K: int, nph: int, osf: int, S: int,
                          n: int, rms_ref: float, tgain: float,
                          aga: float, gamma: float, rho: float,
                          carrier: bool, clock: bool, agc: bool,
                          qam_square: int = 0, interpret: bool = False):
    """Fused MF+demod.  xT_{r,i}: (rows_total, C) input planes laid out by
    the wrapper (models/demod_sb.py::_step_batched_fused) so that grid
    step t's superframe starts exactly at row t*tb*S*osf; state9: (9, C)
    rows [ptr, theta, gain, lf_theta, lf_mu, lf_last, yprev_r, yprev_i,
    p_ema]; h_mf: (Kmf,) matched-filter taps (Kmf <= 129).

    Returns (ysym_r, ysym_i, sidx, valid, state9_out)."""
    rows_total, C = xT_r.shape
    assert C % _CT == 0, C
    M = sym_r.shape[0]
    ntiles = C // _CT
    hop = S * osf
    nsb = n // hop
    tb = _pick_tb(nsb)
    HOPT = tb * hop
    assert HOPT % 128 == 0, (
        "fused demod needs tb*S*osf % 128 == 0; use the non-fused engine")
    lay = fused_layout(osf, S, K, n)
    assert lay["tb"] == tb
    nfz, off = lay["nfz"], lay["off"]
    assert rows_total == lay["rows_total"], (rows_total, lay)
    nT = nsb // tb

    grid = (ntiles, nT)
    sym2_r = jnp.broadcast_to(sym_r[None, :, None], (1, M, _CT))
    sym2_i = jnp.broadcast_to(sym_i[None, :, None], (1, M, _CT))
    kern = functools.partial(
        _fused_kernel, itrp=itrp, K=K, nph=nph, osf=osf, S=S, M=M, n=n,
        nsb=nsb, tb=tb, nfz=nfz, off=off, rms_ref=rms_ref, tgain=tgain,
        aga=aga, gamma=gamma, rho=rho, carrier=carrier, clock=clock,
        agc=agc, qam_square=qam_square)
    ospec = lambda: pl.BlockSpec((tb, S, _CT), lambda c, t: (t, 0, c),
                                 memory_space=pltpu.VMEM)
    anyspec = lambda: pl.BlockSpec(memory_space=pl.ANY)
    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    XB = 128 * (nfz + 1)
    ysr, ysi, sidx, valid, stout = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            anyspec(), anyspec(),
            pl.BlockSpec((1, 9, _CT), lambda c, t: (0, 0, c),
                         memory_space=pltpu.VMEM),
            const(), const(), const(), const(),
        ],
        out_specs=(ospec(), ospec(), ospec(), ospec(),
                   pl.BlockSpec((1, 9, _CT), lambda c, t: (0, 0, c),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((nsb, S, C), jnp.float32),
                   jax.ShapeDtypeStruct((nsb, S, C), jnp.float32),
                   jax.ShapeDtypeStruct((nsb, S, C), jnp.int32),
                   jax.ShapeDtypeStruct((nsb, S, C), jnp.int32),
                   jax.ShapeDtypeStruct((1, 9, C), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((2, XB, _CT), jnp.float32),
                        pltpu.VMEM((2, XB, _CT), jnp.float32),
                        pltpu.VMEM((128 * nfz, _CT), jnp.float32),
                        pltpu.VMEM((128 * nfz, _CT), jnp.float32),
                        pltpu.VMEM((9, _CT), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, 2))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=(interpret if not isinstance(interpret, bool)
                   else (pltpu.InterpretParams() if interpret else False)),
    )(xT_r, xT_i, state9.reshape(1, 9, C), sym2_r, sym2_i, g0, g1)
    return ysr, ysi, sidx, valid, stout.reshape(9, C)
