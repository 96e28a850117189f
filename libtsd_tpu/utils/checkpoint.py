"""Checkpoint / resume for streaming pipeline state.

The reference has NO checkpointing: its filter state is hidden inside C++
objects and never serializable (SURVEY §5.4 flags this as an improvement
slot).  Here every block's state is an explicit pytree of arrays, so
checkpointing is structural: flatten to named arrays, save as .npz, restore
into the same treedef.
"""
from __future__ import annotations

import io
import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_state", "load_state", "state_bytes", "state_from_bytes"]


def _flatten(state) -> dict:
    leaves, treedef = jax.tree.flatten(state)
    out = {}
    for i, l in enumerate(leaves):
        if jax.numpy.iscomplexobj(l):
            # move complex leaves as re/im PLANES: a raw complex
            # device<->host transfer is UNIMPLEMENTED on some TPU
            # runtimes (see config.to_ri)
            from ..config import to_ri
            out[f"leaf_{i}__ri"] = np.asarray(jax.jit(to_ri)(l))
        else:
            out[f"leaf_{i}"] = np.asarray(l)
    out["__treedef__"] = np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8)
    return out


def save_state(path: str, state: Any):
    """Save a pytree state to ``path`` (.npz)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **_flatten(state))


def load_state(path: str, like: Any) -> Any:
    """Restore a state saved with :func:`save_state`.  ``like`` provides the
    tree structure (e.g. ``block.init()``)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz",
                   allow_pickle=False)
    return state_from_npz(data, like)


def state_from_npz(data, like: Any) -> Any:
    leaves, treedef = jax.tree.flatten(like)
    # structural check: a 'like' with coincidentally matching leaf shapes
    # but different structure would otherwise silently mis-assign state
    if "__treedef__" in data:
        saved = bytes(data["__treedef__"]).decode()
        if saved != repr(treedef):
            raise ValueError(
                "checkpoint tree structure does not match 'like':\n"
                f"  saved: {saved}\n  like:  {treedef!r}")
    new_leaves = []
    for i, l in enumerate(leaves):
        if f"leaf_{i}__ri" in data:
            from ..config import from_ri
            planes = jax.numpy.asarray(data[f"leaf_{i}__ri"])
            arr = jax.jit(from_ri)(planes)
            assert arr.shape == tuple(np.shape(l)), \
                f"leaf {i}: shape {arr.shape} != expected {np.shape(l)}"
            new_leaves.append(arr)
            continue
        arr = data[f"leaf_{i}"]
        assert arr.shape == tuple(np.shape(l)), \
            f"leaf {i}: shape {arr.shape} != expected {np.shape(l)}"
        new_leaves.append(jax.numpy.asarray(arr))
    return jax.tree.unflatten(treedef, new_leaves)


def state_bytes(state: Any) -> bytes:
    """Serialize a state pytree to bytes (for network transport)."""
    buf = io.BytesIO()
    np.savez(buf, **_flatten(state))
    return buf.getvalue()


def state_from_bytes(b: bytes, like: Any) -> Any:
    data = np.load(io.BytesIO(b), allow_pickle=False)
    return state_from_npz(data, like)
