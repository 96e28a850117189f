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
    "quat_to_cardan",
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
    """3x3 rotation matrix -> unit quaternion (Shepperd's method — ALL
    four branches, selected by the largest of (trace, R00, R11, R22): the
    trace-only form collapses 180-degree rotations to the identity and
    loses half the significant digits near them)."""
    R = jnp.asarray(R, real_dtype)
    t = jnp.trace(R)

    def via_w():
        w = jnp.sqrt(jnp.maximum(1 + t, 1e-30)) / 2
        return jnp.stack([w, (R[2, 1] - R[1, 2]) / (4 * w),
                          (R[0, 2] - R[2, 0]) / (4 * w),
                          (R[1, 0] - R[0, 1]) / (4 * w)])

    def via_x():
        x = jnp.sqrt(jnp.maximum(1 + R[0, 0] - R[1, 1] - R[2, 2],
                                 1e-30)) / 2
        return jnp.stack([(R[2, 1] - R[1, 2]) / (4 * x), x,
                          (R[0, 1] + R[1, 0]) / (4 * x),
                          (R[0, 2] + R[2, 0]) / (4 * x)])

    def via_y():
        y = jnp.sqrt(jnp.maximum(1 - R[0, 0] + R[1, 1] - R[2, 2],
                                 1e-30)) / 2
        return jnp.stack([(R[0, 2] - R[2, 0]) / (4 * y),
                          (R[0, 1] + R[1, 0]) / (4 * y), y,
                          (R[1, 2] + R[2, 1]) / (4 * y)])

    def via_z():
        z = jnp.sqrt(jnp.maximum(1 - R[0, 0] - R[1, 1] + R[2, 2],
                                 1e-30)) / 2
        return jnp.stack([(R[1, 0] - R[0, 1]) / (4 * z),
                          (R[0, 2] + R[2, 0]) / (4 * z),
                          (R[1, 2] + R[2, 1]) / (4 * z), z])

    cand = jnp.stack([t, R[0, 0], R[1, 1], R[2, 2]])
    idx = jnp.argmax(cand)
    q = jax.lax.switch(idx, [via_w, via_x, via_y, via_z])
    # canonical sign: w >= 0
    q = jnp.where(q[0] < 0, -q, q)
    return quat_normalize(q)


def cardan_to_rotmat(phi, theta, psi) -> jax.Array:
    """Cardan (roll phi, pitch theta, yaw psi) -> rotation matrix,
    R = R1(phi) R2(theta) R3(psi) in the PASSIVE (coordinate-transform)
    convention of Diebel, "Representing Attitude" (2006) — each Ri is the
    transpose of the active axis rotation, so R maps world coordinates to
    body coordinates (parity: Cardan::mat_rotation, geometrie.cc:228-232,
    with rotmat_3d_R1/R2/R3 from geometrie.hpp:109-141; golden-diffed
    against the reference binary in tests/test_golden_ref3.py)."""
    cf, sf = jnp.cos(phi), jnp.sin(phi)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cp, sp = jnp.cos(psi), jnp.sin(psi)
    R1 = jnp.asarray([[1, 0, 0], [0, cf, sf], [0, -sf, cf]], real_dtype)
    R2 = jnp.asarray([[ct, 0, -st], [0, 1, 0], [st, 0, ct]], real_dtype)
    R3 = jnp.asarray([[cp, sp, 0], [-sp, cp, 0], [0, 0, 1]], real_dtype)
    return R1 @ R2 @ R3


def rotmat_to_cardan(R: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Rotation matrix (passive convention, see cardan_to_rotmat) ->
    (roll, pitch, yaw) (parity: Cardan::Cardan(Matrix3f),
    geometrie.cc:166-171)."""
    theta = -jnp.arcsin(jnp.clip(R[0, 2], -1.0, 1.0))
    phi = jnp.arctan2(R[1, 2], R[2, 2])
    psi = jnp.arctan2(R[0, 1], R[0, 0])
    return phi, theta, psi


def quat_from_cardan(phi, theta, psi) -> jax.Array:
    return rotmat_to_quat(cardan_to_rotmat(phi, theta, psi))


def quat_to_cardan(q: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Quaternion -> Cardan angles via Diebel eq. (290), exactly as the
    reference (parity: Cardan::Cardan(Quaternion), geometrie.cc:173-182).

    REFERENCE INCONSISTENCY reproduced on purpose: eq. (290) extracts the
    angles from the ACTIVE rotation matrix of q, while Cardan::mat_rotation
    builds the PASSIVE matrix — so the reference's own
    Cardan -> mat -> Quaternion -> Cardan roundtrip does NOT return the
    original angles (golden g3_cardan_rt pins the actual output).  Our
    matrix-path pair (cardan_to_rotmat / rotmat_to_cardan) IS a consistent
    inverse pair; use it when a true roundtrip is needed."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    phi = jnp.arctan2(2 * y * z + 2 * w * x, z * z - y * y - x * x + w * w)
    theta = -jnp.arcsin(jnp.clip(2 * x * z - 2 * w * y, -1.0, 1.0))
    psi = jnp.arctan2(2 * x * y + 2 * w * z, x * x + w * w - z * z - y * y)
    return phi, theta, psi
