"""Frame transmitter and receiver.

Parity: Émetteur (core/src/telecom/emetteur.cc:14-125) and Récepteur
(core/src/telecom/recepteur.cc:31-785) — the reference's flagship composite
(SURVEY §3.4).

TPU design: the receiver computes header correlation densely (Detector),
then extracts a FIXED-length frame at each detected position with
`dynamic_slice` and masking — no data-dependent shapes (SURVEY hard-part
#3).  Header-derived RF parameters (gain, phase, fractional delay) correct
the frame before matched filtering; symbol timing comes from the header
position, so the steady-state path needs no timing loop; a decision PLL
tracks residual phase.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..block import Block
from ..config import complex_dtype, from_ri, real_dtype, to_ri
from ..ops.filter_rt import Fir
from .carrier_rec import Cpll, CpllConfig
from .detector import Detection, Detector, DetectorConfig
from .modulator import ModConfig, Modulator
from .waveform import Waveform, symbol_indices_to_bits

__all__ = ["FrameFormat", "Transmitter", "Receiver", "FrameRx"]


@dataclasses.dataclass(frozen=True)
class FrameFormat:
    """Parity: TrameFormat, telecom.hpp:1181-1220."""
    modulation: ModConfig = None
    header_bits: tuple = ()        # sync word (entête)
    payload_bits: int = 256        # nbits payload per frame


class Transmitter(Block):
    """header + payload -> modulated frame samples (parity: Émetteur,
    emetteur.cc:14-125)."""

    mod: Modulator
    fmt: FrameFormat = struct.field(pytree_node=False)

    @classmethod
    def create(cls, fmt: FrameFormat) -> "Transmitter":
        fmt_static = dataclasses.replace(
            fmt, modulation=dataclasses.replace(fmt.modulation, wf=None))
        return cls(mod=Modulator.create(fmt.modulation), fmt=fmt_static)

    def init(self):
        return self.mod.init()

    @property
    def delay(self):
        return self.mod.delay

    def step(self, state, payload_bits: jax.Array):
        hdr = jnp.asarray(self.fmt.header_bits, jnp.int8)
        bits = jnp.concatenate([hdr, payload_bits.astype(jnp.int8)])
        return self.mod.step(state, bits)

    def transmit(self, payload_bits: jax.Array) -> jax.Array:
        """One-shot: frame samples including modulator flush."""
        st = self.init()
        st, y1 = self.step(st, payload_bits)
        _, y2 = self.mod.flush(st)
        return jnp.concatenate([y1, y2])


class FrameRx(struct.PyTreeNode):
    """One received frame (parity: RécepteurTrame, telecom.hpp:1256-1272)."""
    bits: jax.Array        # decoded payload bits
    symbols: jax.Array     # payload symbols after correction
    detection: Detection   # the header detection (single entry slices)
    EbN0_db: jax.Array
    valid: jax.Array


class Receiver(Block):
    """Streaming frame receiver (parity: Récepteur/RécepteurImpl,
    recepteur.cc:31-785).

    step(state, x) processes one block and returns up to
    ``detector.cfg.max_peaks`` frames with validity flags.  Each input block
    must be at least frame_len samples; the carried tail guarantees frames
    straddling the boundary are caught on the next block.
    """

    det: Detector
    mf: Fir
    pll: Cpll
    wf: Waveform
    fmt: FrameFormat = struct.field(pytree_node=False)
    header_samples_ri: jax.Array
    nsym_header: int = struct.field(pytree_node=False)
    nsym_payload: int = struct.field(pytree_node=False)
    frame_len: int = struct.field(pytree_node=False)
    mod_delay: float = struct.field(pytree_node=False)

    @classmethod
    def create(cls, fmt: FrameFormat,
               det_cfg: DetectorConfig = DetectorConfig()) -> "Receiver":
        wf = fmt.modulation.wf
        osf = fmt.modulation.osf
        # header reference waveform (shaped)
        hdr_bits = jnp.asarray(fmt.header_bits, jnp.int8)
        mod = Modulator.create(fmt.modulation)
        # jit the factory-time modulation with the modulator passed as a
        # pytree ARGUMENT (closure capture would embed device constants,
        # which some TPU runtimes cannot read back); eager op-by-op
        # execution is also unsupported there, and complex64 device->host
        # transfers are UNIMPLEMENTED — move real/imag planes separately
        def _hdr(m, b):
            w = m.modulate(b)[0]
            return jnp.stack([jnp.real(w), jnp.imag(w)])
        planes = np.asarray(jax.jit(_hdr)(mod, hdr_bits))
        hdr_wave = planes[0] + 1j * planes[1]
        nsym_header = len(fmt.header_bits) // wf.info.k
        nsym_payload = fmt.payload_bits // wf.info.k
        d = int(round(mod.delay))
        hdr_ref = hdr_wave[d:d + nsym_header * osf]
        mf = wf.shaping.matched_filter(fmt.modulation.ncoefs, osf)
        frame_len = (nsym_header + nsym_payload) * osf + 2 * int(mf.delay) + osf
        det = Detector.create(np.asarray(hdr_ref), det_cfg)
        pll = Cpll(cfg=CpllConfig(ped="dec", M=wf.info.M, order=2, BL=0.02),
                   wf=wf)
        fmt_static = dataclasses.replace(
            fmt, modulation=dataclasses.replace(fmt.modulation, wf=None))
        return cls(det=det, mf=mf, pll=pll, wf=wf, fmt=fmt_static,
                   header_samples_ri=to_ri(hdr_ref),
                   nsym_header=nsym_header,
                   nsym_payload=nsym_payload, frame_len=frame_len,
                   mod_delay=mod.delay)

    def init(self):
        return dict(
            det=self.det.init(),
            # carried raw samples so frames straddling block edges survive:
            # keep frame_len + M history
            hist=jnp.zeros((self.frame_len + self.det.M,), complex_dtype),
        )

    def step(self, state, x: jax.Array):
        cfg = self.fmt
        osf = cfg.modulation.osf
        k = self.wf.info.k
        H = state["hist"].shape[0]
        dstate, (dets, score) = self.det.step(state["det"], x)
        # extraction buffer: [history | x]
        buf = jnp.concatenate([state["hist"], x])

        def extract(pos, frac, gain, theta, valid):
            # pos is relative to current block; in buf it's at pos + H
            start = jnp.clip(pos + H, 0, buf.shape[0] - self.frame_len)
            fr = jax.lax.dynamic_slice_in_dim(buf, start, self.frame_len)
            # RF corrections from the header detection
            fr = fr * jnp.exp(-1j * theta).astype(complex_dtype) / \
                jnp.maximum(gain, 1e-6)
            # matched filter
            _, z = self.mf.step(self.mf.init_for(fr), fr)
            # symbols at header-derived timing: first symbol center at
            # mf.delay (pattern starts at 0 in fr)
            d0 = int(self.mf.delay)
            sym_idx = d0 + osf * jnp.arange(self.nsym_header
                                            + self.nsym_payload)
            syms = z[sym_idx]
            # residual fine phase from the known header symbols
            hdr_syms = syms[: self.nsym_header]
            # decision PLL over the whole frame
            _, syms_c = self.pll.step(self.pll.init(), syms)
            pay = syms_c[self.nsym_header:]
            idx = self.wf.closest(pay)
            bits = symbol_indices_to_bits(idx, k)
            # Eb/N0 estimate from header error vector
            ref = self.wf.make_symbols(
                jnp.asarray(self.fmt.header_bits, jnp.int8))
            evm2 = jnp.mean(jnp.abs(syms_c[: self.nsym_header] - ref) ** 2)
            sig = jnp.mean(jnp.abs(ref) ** 2)
            esn0 = sig / jnp.maximum(evm2, 1e-12)
            ebn0_db = 10 * jnp.log10(esn0 / k * osf / osf + 1e-12)
            return bits, pay, ebn0_db

        bits, pays, ebn0s = jax.vmap(extract)(
            dets.position, dets.position_frac, dets.gain, dets.theta,
            dets.valid)

        new_hist = buf[-(H):]
        frames = FrameRx(bits=bits, symbols=pays, detection=dets,
                         EbN0_db=ebn0s, valid=dets.valid)
        return dict(det=dstate, hist=new_hist), frames

    def receive(self, x: jax.Array) -> FrameRx:
        """One-shot receive over a buffer."""
        from ..block import pad_to_multiple
        xp = pad_to_multiple(x, self.det.corr.Ne, axis=0)
        _, frames = self.step(self.init(), xp)
        return frames
