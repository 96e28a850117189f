"""IMU attitude model: quaternion state-space with gyro propagation and
accelerometer/magnetometer observations, for EKF fusion.

Parity: core/src/kalman/modele-imu.cc:113-382 (quaternion attitude +
gyro/accel/mag).  Jacobians come free via jax.jacfwd in ekf_filter.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import real_dtype
from ..utils.geometry import quat_mult, quat_normalize, quat_rotate, quat_conj

__all__ = ["ImuModel", "imu_simulate", "imu_ekf"]


@dataclasses.dataclass(frozen=True)
class ImuModel:
    """State = unit quaternion (world->body).  Inputs: gyro rates (rad/s);
    observations: gravity + magnetic field in body frame."""
    dt: float = 0.01
    gyro_noise: float = 1e-3
    accel_noise: float = 0.05
    mag_noise: float = 0.05
    g_world: tuple = (0.0, 0.0, 1.0)
    b_world: tuple = (1.0, 0.0, 0.0)

    def f(self, q: jax.Array, omega: jax.Array) -> jax.Array:
        """Propagate attitude by gyro rates over dt (quaternion
        integration, parity: modele-imu.cc propagation)."""
        w = omega * self.dt / 2.0
        dq = jnp.concatenate([jnp.ones(1, real_dtype) * jnp.sqrt(
            jnp.maximum(1 - jnp.sum(w * w), 1e-9)), w])
        return quat_normalize(quat_mult(q, dq))

    def g(self, q: jax.Array) -> jax.Array:
        """Observation: gravity and magnetic field rotated into the body
        frame (parity: modele-imu.cc observation)."""
        gw = jnp.asarray(self.g_world, real_dtype)
        bw = jnp.asarray(self.b_world, real_dtype)
        qc = quat_conj(q)
        gb = quat_rotate(qc, gw)
        bb = quat_rotate(qc, bw)
        return jnp.concatenate([gb, bb])


def imu_simulate(model: ImuModel, key, n: int,
                 omega_fn=None) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Simulate a trajectory; returns (quaternions, gyro_meas, obs)."""
    if omega_fn is None:
        def omega_fn(i):
            return jnp.asarray([0.5 * jnp.sin(0.01 * i),
                                0.3 * jnp.cos(0.013 * i),
                                0.2], real_dtype)
    k1, k2, k3 = jax.random.split(key, 3)
    gn = model.gyro_noise * jax.random.normal(k1, (n, 3), real_dtype)
    an = model.accel_noise * jax.random.normal(k2, (n, 6), real_dtype)

    def body(q, inp):
        i, gnoise, onoise = inp
        om = omega_fn(i)
        q = model.f(q, om)
        return q, (q, om + gnoise, model.g(q) + onoise)

    q0 = jnp.asarray([1.0, 0, 0, 0], real_dtype)
    _, (qs, gyro, obs) = jax.lax.scan(
        body, q0, (jnp.arange(n), gn, an))
    return qs, gyro, obs


def imu_ekf(model: ImuModel, gyro: jax.Array, obs: jax.Array,
            q0=None) -> jax.Array:
    """EKF attitude estimation from gyro + accel/mag observations.
    Returns filtered quaternions (n, 4)."""
    n = gyro.shape[0]
    q0 = jnp.asarray([1.0, 0, 0, 0], real_dtype) if q0 is None else q0
    Q = (model.gyro_noise * model.dt) ** 2 * jnp.eye(4, dtype=real_dtype) \
        + 1e-12 * jnp.eye(4, dtype=real_dtype)
    R = jnp.diag(jnp.concatenate([
        jnp.full(3, model.accel_noise ** 2),
        jnp.full(3, model.mag_noise ** 2)])).astype(real_dtype)
    Jg = jax.jacfwd(model.g)

    def body(carry, inp):
        q, P = carry
        om, y = inp
        # predict
        Jf = jax.jacfwd(lambda qq: model.f(qq, om))(q)
        qp = model.f(q, om)
        Pp = Jf @ P @ Jf.T + Q
        # update
        G = Jg(qp)
        S = G @ Pp @ G.T + R
        K = jnp.linalg.solve(S.T, (Pp @ G.T).T).T
        qn = qp + K @ (y - model.g(qp))
        qn = quat_normalize(qn)
        Pn = (jnp.eye(4, dtype=real_dtype) - K @ G) @ Pp
        return (qn, Pn), qn

    P0 = 0.1 * jnp.eye(4, dtype=real_dtype)
    _, qs = jax.lax.scan(body, (q0, P0), (gyro, obs))
    return qs
