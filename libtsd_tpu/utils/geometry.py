"""Geometry: quaternions, Cardan (Euler) angles, rotation matrices.

Parity: core/include/tsd/geometrie.hpp:30-165, core/src/geometrie.cc.
JAX-native so attitude math composes with jit/grad (used by the IMU model).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import real_dtype

__all__ = [
    "quat_mult", "quat_conj", "quat_normalize", "quat_rotate",
    "quat_to_rotmat", "rotmat_to_quat", "quat_from_axis_angle",
    "cardan_to_rotmat", "rotmat_to_cardan", "quat_from_cardan",
]


def quat_mult(q: jax.Array, r: jax.Array) -> jax.Array:
    """Hamilton product, [w, x, y, z] convention (parity: Quaternion::op*,
    geometrie.cc)."""
    w1, x1, y1, z1 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by unit quaternion q."""
    qv = jnp.concatenate([jnp.zeros(v.shape[:-1] + (1,), v.dtype), v],
                         axis=-1)
    return quat_mult(quat_mult(q, qv), quat_conj(q))[..., 1:]


def quat_from_axis_angle(axis, angle) -> jax.Array:
    axis = jnp.asarray(axis, real_dtype)
    axis = axis / jnp.linalg.norm(axis)
    half = jnp.asarray(angle, real_dtype) / 2
    return jnp.concatenate([jnp.cos(half)[None], jnp.sin(half) * axis])


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit quaternion -> 3x3 rotation matrix (parity:
    Quaternion::rot_mat)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], real_dtype)


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> unit quaternion (Shepperd's method, stable)."""
    R = jnp.asarray(R, real_dtype)
    t = jnp.trace(R)
    w = jnp.sqrt(jnp.maximum(1 + t, 1e-12)) / 2
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return quat_normalize(jnp.stack([w, x, y, z]))


def cardan_to_rotmat(phi, theta, psi) -> jax.Array:
    """Cardan (roll phi, pitch theta, yaw psi) -> rotation matrix,
    R = Rz(psi) Ry(theta) Rx(phi) (parity: Cardan, geometrie.hpp)."""
    cf, sf = jnp.cos(phi), jnp.sin(phi)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cp, sp = jnp.cos(psi), jnp.sin(psi)
    Rx = jnp.asarray([[1, 0, 0], [0, cf, -sf], [0, sf, cf]], real_dtype)
    Ry = jnp.asarray([[ct, 0, st], [0, 1, 0], [-st, 0, ct]], real_dtype)
    Rz = jnp.asarray([[cp, -sp, 0], [sp, cp, 0], [0, 0, 1]], real_dtype)
    return Rz @ Ry @ Rx


def rotmat_to_cardan(R: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Rotation matrix -> (roll, pitch, yaw)."""
    theta = -jnp.arcsin(jnp.clip(R[2, 0], -1.0, 1.0))
    phi = jnp.arctan2(R[2, 1], R[2, 2])
    psi = jnp.arctan2(R[1, 0], R[0, 0])
    return phi, theta, psi


def quat_from_cardan(phi, theta, psi) -> jax.Array:
    return rotmat_to_quat(cardan_to_rotmat(phi, theta, psi))
