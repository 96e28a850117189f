"""Overlap-save halo exchange over the time axis (ICI collectives).

The reference's "long-context" mechanism is streaming block processing with
carried filter state (SURVEY §5.7: tampon_création + FiltreFFT overlap
blocks).  Sharded over a TPU mesh, the carried state becomes a *halo*: each
time shard needs the last (K-1) input samples of its left neighbor.  One
`lax.ppermute` moves all halos right simultaneously over ICI; the first
shard receives zeros (ppermute's default for unaddressed targets), which is
exactly the zero initial filter state.

Delay/halo bookkeeping uses the Block protocol's explicit state: a halo IS
the block's streaming state, so `block.step(halo, local_x)` gives bit-exact
agreement with the unsharded streaming run — cascades with different group
delays compose correctly because each block carries its own state size
(SURVEY "hard parts" #2).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..block import Block

__all__ = ["halo_exchange_left", "sharded_fir", "sharded_chain"]


def halo_exchange_left(x: jax.Array, halo: int, axis_name: str = "time") -> jax.Array:
    """Inside shard_map: return this shard's left halo — the last ``halo``
    samples (along the last axis) of the left neighbor's shard; zeros on the
    first shard."""
    assert halo <= x.shape[-1], (
        f"halo ({halo}) exceeds the local shard length ({x.shape[-1]}); "
        f"use fewer/larger time shards")
    n_shards = lax.axis_size(axis_name)
    if halo == 0:
        # stateless block: x[..., -0:] would be the WHOLE shard
        return x[..., :0]
    tail = x[..., -halo:]
    if n_shards == 1:
        return jnp.zeros_like(tail)
    perm = [(i, i + 1) for i in range(n_shards - 1)]
    return lax.ppermute(tail, axis_name, perm)


def sharded_fir(mesh: Mesh, block: Block, x: jax.Array,
                state_len: int) -> jax.Array:
    """Run a stateful streaming block over a (chan, time)-sharded signal.

    x: (channels, n) array (or sharded already).  Each time shard receives
    its left neighbor's tail as initial state; output matches the unsharded
    streaming run exactly.

    ``state_len`` is the number of carried samples: K-1 for a K-tap FIR,
    or V (= ola_plan's overlap) for the Pallas overlap-save OlaFft engine,
    whose streaming state is exactly the last-V input samples.
    """

    def local(xs):
        halo = halo_exchange_left(xs, state_len)
        _, y = block.step(halo, xs)
        return y

    # check_vma is disabled ONLY for Pallas-containing blocks (pallas_call
    # does not yet declare varying-mesh-axes metadata); pure-XLA blocks keep
    # shard_map's full sharding checker.
    fn = shard_map(local, mesh=mesh,
                   in_specs=P("chan", "time"),
                   out_specs=P("chan", "time"),
                   check_vma=not block.uses_pallas)
    return fn(x)


def sharded_chain(mesh: Mesh, blocks_and_state_lens, x: jax.Array) -> jax.Array:
    """Cascade several sample-carrying blocks under one shard_map, with one
    halo exchange per stage (halo sizes differ per stage — explicit
    bookkeeping, SURVEY hard-part #2)."""

    def local(xs):
        for block, slen in blocks_and_state_lens:
            halo = halo_exchange_left(xs, slen)
            _, xs = block.step(halo, xs)
        return xs

    # check_vma is disabled only when a chain member contains pallas_call
    # (e.g. the Pallas OLA engine); all-XLA chains keep the checker.
    any_pallas = any(b.uses_pallas for b, _ in blocks_and_state_lens)
    fn = shard_map(local, mesh=mesh,
                   in_specs=P("chan", "time"),
                   out_specs=P("chan", "time"), check_vma=not any_pallas)
    return fn(x)
