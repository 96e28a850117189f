"""Pattern detector: streaming normalized cross-correlator with peak
extraction -> Detection records.  Core of frame synchronization.

Parity: Detecteur / DetecteurImpl, core/src/fourier/detection.cc:26-517,
core/include/tsd/fourier.hpp:546-683.

TPU design (SURVEY hard-part #3): the correlation is computed densely via
the OLA-FFT engine; peak extraction uses per-M-segment max + neighborhood
suppression and emits a FIXED number of candidate peaks per block with a
validity mask — no data-dependent shapes, the host stays out of the loop.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..block import Block
from ..config import complex_dtype, real_dtype
from ..ops.filter_rt import Fir, MovingAverage, OlaFft

__all__ = ["DetectorConfig", "Detection", "Detector", "detect_pattern"]


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Parity: DetecteurConfig, fourier.hpp:576-640."""
    threshold: float = 0.7       # seuil, in [0, 1]
    max_peaks: int = 4           # per block (static)
    Ne: int = 0                  # OLA input block (0 = auto)
    mode: str = "ola"            # "ola" (FFT) | "rif" (direct MXU FIR)
                                 # (parity: MODE_OLA / MODE_RIF)
    engine: str = "xla"          # correlation engine: "xla" | "pallas"
                                 # (fused overlap-save MXU kernel) |
                                 # "fused" (Pallas Toeplitz kernel
                                 # computing correlation AND window
                                 # energy in one pass — the fast path:
                                 # the XLA front end measured 12.5 ms at
                                 # C=64 x 131k vs ~1 ms fused)
    precision: str = "highest"   # pallas/fused engine tier ("split" =
                                 # bf16 hi/lo, ~1e-5; "bf16" single
                                 # pass ~2.5e-3 — ample for a normalized
                                 # detection score, fastest)


class Detection(struct.PyTreeNode):
    """Parity: Detection, fourier.hpp:546-574.  Arrays of shape
    (max_peaks,) with ``valid`` mask."""
    position: jax.Array        # start of pattern in the block (int)
    position_frac: jax.Array   # sub-sample refinement (float, add to pos)
    score: jax.Array           # normalized correlation in [0,1]
    gain: jax.Array            # estimated channel amplitude
    theta: jax.Array           # estimated carrier phase (rad)
    snr_db: jax.Array          # SNR estimate from the score
    valid: jax.Array           # bool mask


class Detector(Block):
    """step(state, x) -> (state, (Detection, corr_score_track)).

    Positions are relative to the current input block x (may be negative:
    peak started in the carried tail of the previous block).
    """

    corr: "OlaFft | Fir"
    energy: MovingAverage
    pattern_norm: float = struct.field(pytree_node=False)
    M: int = struct.field(pytree_node=False)
    cfg: DetectorConfig = struct.field(pytree_node=False)

    @classmethod
    def create(cls, pattern, cfg: DetectorConfig = DetectorConfig()) -> "Detector":
        p = np.asarray(pattern, np.complex128)
        M = len(p)
        norm = float(np.linalg.norm(p))
        pn = p / norm
        # correlation as FIR with taps conj(reversed normalized pattern)
        # (parity: detection.cc:178-188); run through the OLA engine
        taps = np.conj(pn[::-1])
        if cfg.mode == "rif" and cfg.engine == "fused":
            raise ValueError(
                "DetectorConfig(mode='rif', engine='fused') conflicts: "
                "the fused engine IS a direct-form Toeplitz kernel — use "
                "mode='ola' (default) with engine='fused'")
        if cfg.engine == "fused" and cfg.Ne and cfg.Ne % 128:
            raise ValueError(
                f"engine='fused' needs Ne to be a multiple of 128 "
                f"(lane width), got {cfg.Ne}")
        if cfg.mode == "rif":
            # direct-form correlation on the MXU Toeplitz FIR — the better
            # choice for short patterns (parity: MODE_RIF,
            # detection.cc:68-96)
            corr = Fir.create(taps)
        elif cfg.engine == "fused":
            from ..ops.pallas.detfront import DetFront
            if cfg.precision in ("split", "bf16"):
                prec = cfg.precision
            else:
                # the fused kernel has no fp32-emulation tier; 'highest'
                # (also the dataclass default) runs the ~1e-5 split tier.
                # Say so when the user asked for something else by name —
                # a tight-tolerance consumer should use engine='xla'.
                prec = "split"
                if cfg.precision != "highest":
                    from ..utils.log import msg_warn
                    msg_warn(
                        f"DetectorConfig(engine='fused'): precision "
                        f"{cfg.precision!r} is not available on the "
                        f"fused kernel — running 'split' (~1e-5); use "
                        f"engine='xla' for full fp32")
            corr = DetFront.create(taps, precision=prec)
        else:
            corr = OlaFft.create(taps, Ne=cfg.Ne if cfg.Ne else None,
                                 engine=cfg.engine, precision=cfg.precision)
        return cls(corr=corr, energy=MovingAverage(K=M),
                   pattern_norm=norm, M=M, cfg=cfg)

    @property
    def _fused(self) -> bool:
        from ..ops.pallas.detfront import DetFront
        return isinstance(self.corr, DetFront)

    @property
    def Ne(self) -> int:
        """Streaming block granularity (1 in RIF mode; the fused kernel
        honors a configured Ne — multiple of 128 — and defaults to
        1024)."""
        if isinstance(self.corr, OlaFft):
            return self.corr.Ne
        if self._fused:
            return self.cfg.Ne if self.cfg.Ne else 1024
        return 1

    @property
    def uses_pallas(self) -> bool:
        # the correlation engine may be the Pallas OLA kernel
        return self.corr.uses_pallas

    def init(self):
        return dict(
            corr=self.corr.init(),
            # fused engine: the energy window is computed in-kernel from
            # the carried complex input tail — no separate |x|^2 state
            en=jnp.zeros((0 if self._fused else self.M - 1,), real_dtype),
            # carried tail of correlation/energy for boundary peaks
            tail_c=jnp.zeros((self.M,), complex_dtype),
            tail_e=jnp.zeros((self.M,), real_dtype),
            # each block's LAST segment candidate is decided next block,
            # when its right neighborhood is known (peaks within distance
            # M straddling the block edge must suppress each other)
            seg_prev=dict(
                m=jnp.asarray(-1.0, real_dtype),      # segment max score
                pe=jnp.asarray(0, jnp.int32),         # window-end pos
                ok_left=jnp.asarray(True),            # left-side verdict
                # peak refinement row [c1r, c1i, s0, s1, s2]
                ref5=jnp.zeros((5,), real_dtype),
            ),
        )

    def step(self, state, x: jax.Array):
        M = self.M
        n = x.shape[-1]
        if self._fused:
            # ONE Pallas pass: correlation planes + summed window energy
            # + raw normalized score; the complex correlation is never
            # materialized over the block (planes are gathered at peak
            # positions only)
            cstate, (cr, ci, en, sc) = self.corr.step(
                state["corr"], x.astype(complex_dtype))
            estate = state["en"]
            tail_c = state["tail_c"]
            tr, ti = jnp.real(tail_c), jnp.imag(tail_c)
            cxr = jnp.concatenate([tr, cr])
            cxi = jnp.concatenate([ti, ci])
            ex = jnp.concatenate([state["tail_e"], en])
            sc_tail = jnp.sqrt((tr * tr + ti * ti)
                               / (state["tail_e"] + 1e-20))
            score = jnp.concatenate([sc_tail, sc])
        else:
            cstate, c = self.corr.step(state["corr"],
                                       x.astype(complex_dtype))
            estate, en = self.energy.step(state["en"], jnp.abs(x) ** 2)
            en = en * M  # MovingAverage divides by K; we need the sum
            # extended buffers: [prev tail | this block]
            cx = jnp.concatenate([state["tail_c"], c])
            ex = jnp.concatenate([state["tail_e"], en])
            cxr, cxi = jnp.real(cx), jnp.imag(cx)
            score = jnp.abs(cx) / jnp.sqrt(ex * 1.0 + 1e-20)
        # guard against near-zero-energy regions (e.g. zero padding), where
        # FFT roundoff residue in corr would otherwise explode the
        # normalized score; a true detection needs real window energy
        # RELATIVE floor (scale-invariant): a true detection needs real
        # window energy; the +1e-30 absolute term catches the all-zero
        # buffer, where FFT roundoff residue in corr would otherwise
        # explode the normalized score
        en_floor = 1e-6 * jnp.mean(ex) + 1e-30
        score = jnp.where(ex < en_floor, 0.0, score)
        score = jnp.minimum(score, 1.0)

        # consider peaks with extended index in [M/2, M/2 + n)
        lo = M // 2
        nseg = (n + M - 1) // M
        det, seg_prev = self._extract_peaks(cxr, cxi, score, lo, n, nseg,
                                            state["seg_prev"])

        new_state = dict(corr=cstate, en=estate,
                         tail_c=(cxr[-M:] + 1j * cxi[-M:]
                                 ).astype(complex_dtype),
                         tail_e=ex[-M:],
                         seg_prev=seg_prev)
        # score track aligned to WINDOW-END positions: track[i] is the
        # normalized score of the correlation window ending at block
        # sample i (matching Detection.position + M - 1); extended index
        # of block position p's window end is p + M
        return new_state, (det, score[M:M + n])

    def _extract_peaks(self, cxr, cxi, score, lo, n, nseg, prev):
        M = self.M
        P = self.cfg.max_peaks
        region = jax.lax.dynamic_slice_in_dim(score, lo, n)
        # segment-wise max (erosion, parity: detection.cc:264-270).
        # safe_pad, not jnp.pad: region's producer is a nontrivial fused
        # computation and the axon runtime's pad miscompile would put
        # uninitialized garbage into the LAST segment's max — which
        # feeds the block-edge deferral logic (latent for n % M != 0
        # patterns, e.g. the 66-bit 8-PSK header's M=88)
        from ..block import safe_pad
        pad = nseg * M - n
        seg = safe_pad(region, 0, pad).reshape(nseg, M)
        seg_max = jnp.max(seg, axis=1)
        seg_argr = jnp.argmax(seg, axis=1) + jnp.arange(nseg) * M
        # per-segment refinement data from the correlation planes, packed
        # as ONE (5, nseg) matrix [c1r; c1i; s0; s1; s2].  NOTE: this
        # fused form (7 ops vs the previous ~16 scalar-per-array concats/
        # gathers) measured perf-NEUTRAL on hardware (C=64 x 131k: 11.1
        # vs 10.8 ms/step, inside run noise) — XLA was already fusing the
        # small ops; the step's residual cost is the gathers + top-k/sort
        # + extraction, not trace-level op count.  Kept for clarity.
        exi = seg_argr + lo
        s_idx = jnp.stack([jnp.maximum(exi - 1, 0), exi,
                           jnp.minimum(exi + 1, score.shape[0] - 1)])
        refin = jnp.concatenate([cxr[exi][None], cxi[exi][None],
                                 score[s_idx]])
        # window-end BLOCK position of each segment's peak (extended index
        # e maps to block position e - M: the tail holds M positions)
        pe = (seg_argr + lo - M).astype(jnp.int32)

        # Decided elements this block: [prev block's deferred last
        # segment | current segments 0..nseg-2].  The current LAST
        # segment's right neighborhood extends into the next block, so
        # its decision is deferred — peaks within distance M straddling
        # the block edge then always see each other.  The decided rows
        # AND their left/right neighborhoods are all slices of ONE
        # extended array [left-sentinel | prev | current]:
        #   ext[1:-1] = decided, ext[:-2] = left, ext[2:] = right.
        m_ext = jnp.concatenate([jnp.full(1, -1.0, real_dtype),
                                 prev["m"][None], seg_max])
        pe_ext = jnp.concatenate([jnp.full(1, -(10 ** 9), jnp.int32),
                                  prev["pe"][None], pe])
        em, left_m, right_m = m_ext[1:-1], m_ext[:-2], m_ext[2:]
        epe, left_pe, right_pe = pe_ext[1:-1], pe_ext[:-2], pe_ext[2:]
        erefin = jnp.concatenate([prev["ref5"][:, None], refin[:, :-1]],
                                 axis=1)
        ok = em > self.cfg.threshold
        okl = ~((left_m > em) & (epe - left_pe < M))
        okl = jnp.concatenate([prev["ok_left"][None], okl[1:]])
        ok &= okl
        ok &= ~((right_m >= em) & (right_pe - epe < M))
        # top-P by score among survivors; pad so short blocks (nseg < P)
        # still yield the documented (max_peaks,) shapes
        masked = jnp.where(ok, em, -1.0)
        if nseg < P:
            z = P - nseg
            masked = jnp.concatenate([masked, jnp.full(z, -1.0)])
            epe = jnp.concatenate([epe, jnp.zeros(z, epe.dtype)])
            erefin = jnp.concatenate(
                [erefin, jnp.zeros((5, z), erefin.dtype)], axis=1)
        # top-P by score (lax.top_k is O(n*P) selection, not a full
        # O(n log n) argsort over every segment), then reorder in TIME
        # (the reference reports detections in occurrence order; score
        # order would scramble multi-frame blocks for serving consumers)
        # — invalid slots sort to the end.  Ties: top_k is
        # stable-by-index like argsort(-masked).
        _, order = jax.lax.top_k(masked, P)
        val = masked[order] > 0
        tkey = jnp.where(val, epe[order], jnp.iinfo(jnp.int32).max)
        reorder = jnp.argsort(tkey)
        order = order[reorder]
        val = val[reorder]
        # ONE stacked gather for the five per-peak refinement rows
        g5 = erefin[:, order]
        c1or, c1oi, s0o, s1o, s2o = g5[0], g5[1], g5[2], g5[3], g5[4]

        # sub-sample refinement + gain/theta from the complex correlation
        denom = s0o - 2 * s1o + s2o
        frac = jnp.where(jnp.abs(denom) > 1e-12,
                         0.5 * (s0o - s2o) / denom, 0.0)
        frac = jnp.clip(frac, -0.5, 0.5)
        # if window = g*e^{i theta}*pattern: corr = g*e^{i theta}*||pattern||
        gain = jnp.sqrt(c1or * c1or + c1oi * c1oi) / self.pattern_norm
        theta = jnp.arctan2(c1oi, c1or)
        s1c = jnp.clip(s1o, 0.0, 0.999999)
        snr = s1c ** 2 / (1 - s1c ** 2)
        snr_db = 10.0 * jnp.log10(snr + 1e-12)
        # the peak marks the window END; the pattern START is end - (M-1)
        pos = epe[order] - (M - 1)
        det = Detection(position=pos,
                        position_frac=frac.astype(real_dtype),
                        score=s1o.astype(real_dtype),
                        gain=gain.astype(real_dtype),
                        theta=theta.astype(real_dtype),
                        snr_db=snr_db.astype(real_dtype),
                        valid=val)
        # defer the last current segment (positions re-based by -n for
        # the next block); its left verdict is decided NOW
        ok_left_new = ~((em[-1] > seg_max[-1]) & (pe[-1] - epe[-1] < M))
        seg_prev_new = dict(
            m=seg_max[-1], pe=pe[-1] - n, ok_left=ok_left_new,
            ref5=refin[:, -1].astype(real_dtype))
        return det, seg_prev_new


def detect_pattern(x: jax.Array, pattern,
                   cfg: DetectorConfig = DetectorConfig()):
    """One-shot detection over a whole buffer; returns (Detection, score).

    Pads the buffer with 2M trailing zeros internally: the streaming peak
    regions tile [-M/2, n-M/2) per block and the final segment's decision
    is deferred to the next block — without the pad a pattern ending near
    the buffer end would wait for a block that never comes."""
    det = Detector.create(pattern, cfg)
    from ..block import pad_to_multiple, safe_pad
    n = x.shape[-1]
    xp = pad_to_multiple(safe_pad(x, 0, 2 * det.M, axis=-1),
                         det.Ne, axis=x.ndim - 1)
    _, (d, score) = det.step(det.init(), xp)
    return d, score[:n]


def detect_with_callback(x: jax.Array, pattern, callback,
                         cfg: DetectorConfig = DetectorConfig()):
    """Host-side detection driver invoking ``callback(Detection-like
    dict)`` once per valid detection, in position order (parity: the
    gere_detection callback product surface, detection.cc:357-364 /
    fourier.hpp:605).  Returns the raw (Detection, score) as well."""
    det, score = detect_pattern(x, pattern, cfg)
    import numpy as np_
    order = np_.argsort(np_.asarray(det.position))
    for i in order:
        if bool(np_.asarray(det.valid)[i]):
            callback(dict(
                position=int(np_.asarray(det.position)[i]),
                position_frac=float(np_.asarray(det.position_frac)[i]),
                score=float(np_.asarray(det.score)[i]),
                gain=float(np_.asarray(det.gain)[i]),
                theta=float(np_.asarray(det.theta)[i]),
                snr_db=float(np_.asarray(det.snr_db)[i])))
    return det, score
