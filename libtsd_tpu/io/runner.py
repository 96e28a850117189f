"""Streaming executor: source -> jitted device chain -> host sink.

The production serving loop the reference runs implicitly inside its
Sink/tampon callbacks (/root/reference/core/src/tsd.cc:303-386, receiver
loop recepteur.cc:404-650), built TPU-native:

* the host side re-blocks arbitrary-size source reads into the fixed
  block length the jitted step was compiled for (native ring buffer);
* complex samples cross the host<->device boundary as (2, N) float32
  re/im PLANES (some TPU runtimes cannot transfer complex64 at all —
  see config.to_ri); the complex view exists only inside jit;
* dispatch is ASYNCHRONOUS with a bounded in-flight queue: while block
  k's result is being read back, block k+1 is already enqueued on the
  device, so host transfer and device compute overlap (double
  buffering) without any thread machinery;
* per-block wall time is tracked in a Monitor (samples/s, ≙ the
  reference's MoniteurCpu stage counters).
"""
from __future__ import annotations

from collections import deque
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from ..config import from_ri, to_ri
from ..utils.monitor import Monitor
from .streamio import Rebuffer, deinterleave

__all__ = ["StreamRunner"]


class StreamRunner:
    """Drive a Block over an unbounded sample stream.

    block:      any ``state, y = block.step(state, x)`` pytree block
                (Fir, OlaFft, Chain, Receiver front ends, ...).
    block_len:  samples per device step (static shape; for OlaFft-like
                blocks use a multiple of ``block.Ne``).
    sink:       callback receiving each output block as a NumPy array
                (None = outputs are collected and returned by ``run``).
    complex_in: whether the source samples are complex (moved as planes).
    depth:      max in-flight device steps (2 = classic double buffer).
    """

    def __init__(self, block, block_len: int,
                 sink: Optional[Callable[[np.ndarray], None]] = None,
                 complex_in: bool = True, depth: int = 2):
        self.block = block
        self.block_len = int(block_len)
        self.sink = sink
        self.complex_in = bool(complex_in)
        self.depth = int(depth)
        if self.depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self.monitor = Monitor("stream_runner")

        def _body(blk, state, x):
            state, y = blk.step(state, x)
            # the output may be a single signal array OR a pytree (e.g. a
            # frame Receiver emits a FrameRx of bits/symbols/detections).
            # Record AT TRACE TIME which leaves are complex, so _emit
            # re-assembles exactly (and only) converted leaves — a genuine
            # real (2, N) output must NOT be fused into a bogus complex
            # signal by shape guessing.  Complex leaves cross the device
            # boundary as re/im planes (config.to_ri).
            leaves, tdef = jax.tree.flatten(y)
            flags = tuple(bool(jax.numpy.iscomplexobj(l)) for l in leaves)
            self._y_tree = (tdef, flags)
            return state, tuple(to_ri(l) if f else l
                                for l, f in zip(leaves, flags))

        def step(blk, state, x_planes):
            x = from_ri(x_planes) if self.complex_in else x_planes
            return _body(blk, state, x)

        def init_step(blk, x_planes):
            # the initial state is created INSIDE jit: init_for on a host
            # complex array would need a complex host->device transfer,
            # which some TPU runtimes cannot do at all
            x = from_ri(x_planes) if self.complex_in else x_planes
            return _body(blk, blk.init_for(x), x)

        self._step = jax.jit(step)
        self._init_step = jax.jit(init_step)
        # re-blocking is composed from the shared Rebuffer (one copy of
        # the cap-slice/stall logic); its callback dispatches device steps
        self._rebuf = Rebuffer(self.block_len, self._submit,
                               complex_iq=self.complex_in,
                               capacity=max(8 * self.block_len, 1 << 16))
        self._state = None
        self._pending: deque = deque()
        self._out: list = []
        self._y_tree = None         # (treedef, complex flags), set at trace
        self._nsub = 0              # blocks dispatched

    # ------------------------------------------------------------- core

    def _host_to_planes(self, xb: np.ndarray):
        if self.complex_in:
            # native-accelerated split into the (2, N) transfer planes
            return jax.device_put(deinterleave(xb))
        return jax.device_put(np.asarray(xb, np.float32))

    def _emit(self, y_dev):
        tdef, flags = self._y_tree
        leaves = [np.asarray(l) for l in y_dev]  # sync THIS block only
        leaves = [(l[0] + 1j * l[1]) if f else l
                  for l, f in zip(leaves, flags)]
        y = jax.tree.unflatten(tdef, leaves)
        if self.sink is not None:
            self.sink(y)
        else:
            self._out.append(y)

    def _submit(self, xb: np.ndarray):
        # NOTE: dispatch is async — a per-block timer here would measure
        # dispatch latency, not device compute.  Honest throughput is
        # wall-clock over the whole stream: run() wraps the loop in the
        # monitor; push()-driven callers can do the same.
        xd = self._host_to_planes(xb)
        if self._state is None:
            self._state, y = self._init_step(self.block, xd)
        else:
            self._state, y = self._step(self.block, self._state, xd)
        self._nsub += 1
        self._pending.append(y)
        while len(self._pending) >= self.depth:
            self._emit(self._pending.popleft())

    # -------------------------------------------------------------- API

    def push(self, x: np.ndarray) -> None:
        """Feed arbitrary-length samples; full blocks are dispatched
        (Rebuffer semantics: loops until accepted, never truncates)."""
        self._rebuf.push(np.ascontiguousarray(x))

    def drain(self) -> None:
        """Wait for all in-flight device steps and emit their outputs."""
        while self._pending:
            self._emit(self._pending.popleft())

    @property
    def residual(self) -> int:
        """Samples held back (< block_len) awaiting the next push."""
        return self._rebuf.rb.available

    def flush(self) -> int:
        """Zero-pad the held-back residue to one full block, dispatch
        it, and drain.  Returns the number of REAL samples in that final
        block (0 if the stream ended block-aligned).  The tail of the
        final output block corresponds to the zero padding — callers that
        care slice by this count."""
        n = self._rebuf.rb.available
        if n:
            pad = self.block_len - n
            z = np.zeros(pad, np.complex64 if self.complex_in
                         else np.float32)
            self.push(z)
        self.drain()
        return n

    # ------------------------------------------------- checkpoint/resume

    def _state_like(self):
        """Structure/shape template of the device state, without running
        anything (eval_shape) — lets restore() validate a checkpoint on a
        fresh runner that has not dispatched a block yet."""
        shp = (2, self.block_len) if self.complex_in else (self.block_len,)
        xs = jax.ShapeDtypeStruct(shp, np.float32)

        def one(blk, xp):
            x = from_ri(xp) if self.complex_in else xp
            s, _ = blk.step(blk.init_for(x), x)
            return s

        return jax.eval_shape(one, self.block, xs)

    def checkpoint(self, path: str) -> None:
        """Serialize the FULL mid-stream serving state to ``path`` (.npz,
        shared protocol: utils.checkpoint.save_stream_state): the block's
        device state pytree plus the host ring residue and the dispatch
        counter.  Pending async steps are drained first, so the
        checkpoint is a consistent cut: everything before it has been
        emitted, nothing after it has been consumed.  Resuming via
        :meth:`restore` continues bit-identically to the uninterrupted
        run (SURVEY §5.4; the reference cannot do this — its filter state
        is hidden inside C++ objects, recepteur.cc)."""
        from ..utils.checkpoint import save_stream_state
        self.drain()
        if self._state is None:
            raise RuntimeError("nothing dispatched yet — push first or "
                               "checkpoint after restore+push")
        save_stream_state(path, self._state, self._rebuf.snapshot(),
                          {"nsub": self._nsub})

    def restore(self, path: str) -> None:
        """Load a :meth:`checkpoint` into this runner (same block +
        block_len).  The device state is validated against the block's
        state structure (treedef + leaf shapes) and re-assembled on
        device; the ring residue is re-queued.  Any stream this runner
        was previously carrying is ABANDONED: in-flight outputs are
        discarded (not emitted) and collected outputs are cleared, so a
        subsequent run()/drain() yields only the resumed stream."""
        from ..utils.checkpoint import load_stream_state
        like = self._state if self._state is not None else self._state_like()
        state, residue, ctr = load_stream_state(path, like)
        self._state = state
        self._rebuf = Rebuffer(self.block_len, self._submit,
                               complex_iq=self.complex_in,
                               capacity=max(8 * self.block_len, 1 << 16))
        if len(residue):
            self._rebuf.rb.push(residue)
        self._nsub = ctr["nsub"]
        self._pending.clear()
        self._out.clear()

    def run(self, source: Iterable[np.ndarray],
            flush: bool = False) -> Optional[np.ndarray]:
        """Consume an iterable of sample arrays (e.g. an IqFileReader).
        Returns the concatenated output when no sink was given.  The
        monitor records wall-clock over the whole drained stream — the
        honest throughput under async double buffering.

        A finite stream whose length is not a multiple of ``block_len``
        leaves a tail in the ring: pass ``flush=True`` to zero-pad and
        process it (see :meth:`flush` for the padding caveat), or read
        ``.residual`` afterwards — it is never silently discarded
        between runs."""
        n0 = self._nsub
        self.monitor.start()
        for chunk in source:
            self.push(chunk)
        if flush:
            self.flush()
        self.drain()
        self.monitor.stop(samples=(self._nsub - n0) * self.block_len)
        if self.sink is None and self._out:
            out = self._out
            self._out = []
            if all(isinstance(o, np.ndarray) for o in out):
                return np.concatenate(out, axis=-1)
            return out          # pytree outputs (e.g. FrameRx per block)
        return None
