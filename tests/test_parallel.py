"""Multi-chip sharding tests on the virtual 8-device CPU mesh (conftest
forces JAX_PLATFORMS=cpu with xla_force_host_platform_device_count=8)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libtsd_tpu.ops import filter_rt as FR
from libtsd_tpu.ops import fir_design as FD
from libtsd_tpu.parallel import make_mesh, channel_sharding, sharded_fir, sharded_chain
from libtsd_tpu.utils.testing import check_max_error

rng = np.random.default_rng(11)


def test_mesh_shapes():
    m = make_mesh(chan=2, time=4)
    assert m.shape == {"chan": 2, "time": 4}
    m2 = make_mesh(time=2)
    assert m2.shape == {"chan": 4, "time": 2}


def test_sharded_fir_matches_unsharded():
    mesh = make_mesh(chan=2, time=4)
    h = FD.fir_lowpass(65, 0.1)
    fir = FR.Fir.create(h)
    C, N = 4, 1024
    x = jnp.asarray(rng.standard_normal((C, N)), jnp.float32)
    xs = jax.device_put(x, channel_sharding(mesh))
    y_sharded = sharded_fir(mesh, fir, xs, state_len=64)
    y_ref = FR.fir_filter(h, x)
    check_max_error(np.asarray(y_sharded), np.asarray(y_ref), 1e-4)


def test_sharded_fir_time_only():
    mesh = make_mesh(chan=1, time=8)
    h = FD.fir_lowpass(33, 0.2)
    fir = FR.Fir.create(h)
    x = jnp.asarray(rng.standard_normal((2, 2048)), jnp.float32)
    xs = jax.device_put(x, channel_sharding(mesh))
    y = sharded_fir(mesh, fir, xs, state_len=32)
    y_ref = FR.fir_filter(h, x)
    check_max_error(np.asarray(y), np.asarray(y_ref), 1e-4)


def test_sharded_chain_two_stages():
    mesh = make_mesh(chan=2, time=4)
    h1 = FD.fir_lowpass(33, 0.2)
    h2 = FD.fir_lowpass(17, 0.3)
    b1, b2 = FR.Fir.create(h1), FR.Fir.create(h2)
    x = jnp.asarray(rng.standard_normal((2, 1024)), jnp.float32)
    xs = jax.device_put(x, channel_sharding(mesh))
    y = sharded_chain(mesh, [(b1, 32), (b2, 16)], xs)
    y_ref = FR.fir_filter(h2, FR.fir_filter(h1, x))
    check_max_error(np.asarray(y), np.asarray(y_ref), 1e-4)


def test_sharded_jit_compiles():
    mesh = make_mesh(chan=4, time=2)
    h = FD.fir_lowpass(33, 0.15)
    fir = FR.Fir.create(h)

    @jax.jit
    def step(v):
        return sharded_fir(mesh, fir, v, state_len=32)

    x = jax.device_put(
        jnp.asarray(rng.standard_normal((8, 512)), jnp.float32),
        channel_sharding(mesh))
    y = step(x)
    assert y.shape == (8, 512)
    # output sharding preserved
    assert y.sharding.spec == channel_sharding(mesh).spec
