"""Sharded fused metric chain: the Pallas FIR+periodogram kernel run
SPMD over the ("chan", "time") mesh.

Composition of the two flagship pieces (SURVEY §2.11 / §5.8 north star):

* channels are data-parallel over the "chan" axis (no steady-state
  collectives);
* long signals are sequence-parallel over the "time" axis: each time
  shard hands its *input tail* — the (D-1)*128 samples the FIR needs as
  initial state — to its right neighbor over ICI with one `ppermute`
  (halo_exchange_left), and the kernel starts from that history instead
  of zeros (ops/pallas/chain.py hist0).  The first shard receives zeros
  = fresh filter state, so the sharded run equals the unsharded run
  exactly (up to fp32 re-association of the per-shard spectrum sums);
* the per-shard partial spectra (each shard accumulates |FFT4096|^2 over
  its own frames) are combined with one `psum` over "time" — a single
  (C_local, 4096) reduction riding ICI.

This layer is NEW DESIGN — the reference is single-threaded C++ with no
distribution (SURVEY §2.11); there are no reference lines by construction.
"""
from __future__ import annotations

import jax
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.pallas.chain import fir_periodogram4096
from .halo import halo_exchange_left

__all__ = ["sharded_fir_periodogram4096"]


def sharded_fir_periodogram4096(mesh: Mesh, x: jax.Array, G: jax.Array,
                                precision: str = "split",
                                interpret: bool = False,
                                halo: str = "ppermute",
                                tb: int = 16) -> jax.Array:
    """Distributed fused FIR+periodogram over a ("chan", "time") mesh.

    x: (C, N) float32, sharded (or shardable) as P("chan", "time");
    N / time_shards must be a multiple of 65536 (the kernel chunk).
    G: (D, 128, 128) Toeplitz tap matrices, replicated.

    halo: "ppermute" exchanges the (D-1)*128-sample input tails with one
    XLA collective before the kernel; "fused" performs the exchange
    INSIDE the Pallas kernel with `make_async_remote_copy` over ICI
    (comm fused with compute — no XLA permute pass over the input;
    validated on the virtual mesh via the Pallas TPU interpret machinery
    with race detection, tests/test_parallel.py).

    Returns (C, 4096) accumulated power spectra of the FIR-filtered
    signal — identical to `fir_periodogram4096(x, G)` on one device —
    laid out P("chan", None) (replicated over "time").
    """
    assert halo in ("ppermute", "fused"), halo
    D = G.shape[0]
    H = max(D - 1, 1)

    def local(xs, g):
        if halo == "fused":
            part = fir_periodogram4096(
                xs, g, interpret=interpret, precision=precision, tb=tb,
                halo_axis="time", mesh_axes=tuple(mesh.axis_names))
        else:
            # left neighbor's input tail = this shard's initial FIR state
            halo_t = halo_exchange_left(xs, H * 128, "time")
            hist0 = halo_t.reshape(xs.shape[0], H, 128)
            part = fir_periodogram4096(xs, g, hist0=hist0,
                                       interpret=interpret,
                                       precision=precision, tb=tb)
        return lax.psum(part, "time")

    # check_vma=False: pallas_call does not yet declare varying-mesh-axes
    # metadata, so shard_map's vma checker cannot see through it
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("chan", "time"), P()),
                   out_specs=P("chan", None), check_vma=False)
    return fn(x, G)
