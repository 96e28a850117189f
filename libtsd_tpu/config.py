"""Global configuration and dtype policy for libtsd-tpu.

TPU-first dtype policy: float32 / complex64 are the primary compute dtypes
(the reference uses float/cfloat throughout, e.g. Vecf/Veccf aliases in
core/include/tsd/tableau.hpp:1414-1445).  Design-time numerics (filter design,
analog prototypes, elliptic functions) run in float64 on host — they execute
once, outside jit (parity: core/src/filtrage/rii.cc runs in double).

On the MXU there is no native complex arithmetic; complex kernels operate on
(real, imag) planes (see ops/pallas/).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

real_dtype = jnp.float32
complex_dtype = jnp.complex64
int_dtype = jnp.int32
bool_dtype = jnp.bool_

# Design-time (host, one-shot) dtypes
design_real = "float64"
design_complex = "complex128"


def to_ri(x) -> "jnp.ndarray":
    """Pack a complex array into a real (2, ...) float32 array.

    Some TPU runtimes cannot transfer complex64 between host and device at
    all (UNIMPLEMENTED) — complex values may only exist as traced
    intermediates inside jit.  Pytree LEAVES that are logically complex are
    therefore stored in this (re, im)-planes form and unpacked with
    :func:`from_ri` inside the computation.
    """
    import jax.numpy as jnp
    import numpy as np
    if isinstance(x, np.ndarray) or np.isscalar(x):
        x = np.asarray(x)
        return jnp.asarray(np.stack([x.real.astype(np.float32),
                                     x.imag.astype(np.float32)]))
    return jnp.stack([jnp.real(x), jnp.imag(x)]).astype(real_dtype)


def from_ri(a) -> "jnp.ndarray":
    """Unpack (2, ...) float32 planes into complex64 (trace-safe)."""
    return (a[0] + 1j * a[1]).astype(complex_dtype)


@dataclasses.dataclass(frozen=True)
class Config:
    """Framework-level knobs (pytree-static, frozen — mirrors the reference's
    typed-config-struct idiom, SURVEY §5.6)."""

    # Prefer Pallas kernels over pure-XLA implementations when both exist.
    use_pallas: bool = True
    # Default block size for overlap-save streaming FFT filtering.
    default_block: int = 4096


_config = Config()


def get_config() -> Config:
    return _config


def set_config(**kw) -> Config:
    global _config
    _config = dataclasses.replace(_config, **kw)
    return _config
