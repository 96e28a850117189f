"""Pallas kernel tests (interpret mode on CPU; the same kernels compile to
Mosaic on TPU — verified on hardware in BENCH runs)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libtsd_tpu.ops.pallas.fir import fir_pallas
from libtsd_tpu.ops.pallas.periodogram import periodogram4096_acc
from libtsd_tpu.ops.pallas.chain import fir_periodogram4096
from libtsd_tpu.ops.filter_rt import fir_toeplitz_mats, fir_filter
from libtsd_tpu.ops.fir_design import fir_lowpass

rng = np.random.default_rng(0)


def test_fir_pallas_matches_convolve():
    h = rng.standard_normal(256)
    x = rng.standard_normal(40000).astype(np.float32)
    y = np.asarray(fir_pallas(h, jnp.asarray(x), interpret=True))
    exp = np.convolve(x, h)[:40000]
    assert np.max(np.abs(y - exp)) < 1e-4 * np.abs(exp).max()


def test_fir_pallas_short_filter():
    h = np.ones(3) / 3
    x = np.arange(300, dtype=np.float32)
    y = np.asarray(fir_pallas(h, jnp.asarray(x), interpret=True))
    exp = np.convolve(x, h)[:300]
    assert np.max(np.abs(y - exp)) < 1e-4


def test_periodogram_kernel():
    y = jnp.asarray(rng.standard_normal((2, 16 * 4096)), jnp.float32)
    acc = np.asarray(periodogram4096_acc(y, interpret=True))
    yn = np.asarray(y)
    ref = np.zeros((2, 4096))
    for c in range(2):
        for f in range(16):
            ref[c] += np.abs(np.fft.fft(yn[c, f * 4096:(f + 1) * 4096])) ** 2
    assert np.max(np.abs(acc - ref)) / ref.max() < 1e-5


def test_fused_chain_kernel():
    h = fir_lowpass(256, 0.2)
    G = jnp.asarray(fir_toeplitz_mats(np.asarray(h, np.float64)),
                    jnp.float32)
    C, N = 2, 2 * 65536
    x = jnp.asarray(rng.standard_normal((C, N)), jnp.float32)
    acc = np.asarray(fir_periodogram4096(x, G, interpret=True))
    y = np.asarray(fir_filter(h, x))
    ref = np.zeros((C, 4096))
    for c in range(C):
        for f in range(N // 4096):
            ref[c] += np.abs(np.fft.fft(y[c, f * 4096:(f + 1) * 4096])) ** 2
    assert np.max(np.abs(acc - ref)) / ref.max() < 1e-5


def test_fused_chain_split_precision_accuracy():
    """Split precision (bf16 DFT stages, fp32 FIR) must stay within the
    reference's own large-n FFT tolerance of 1e-2 relative error
    (/root/reference/core/tests/test-fourier.cc:256).  The bf16 casts are
    explicit inside the kernel, so interpret mode exercises the exact
    TPU numerics."""
    h = fir_lowpass(256, 0.2)
    G = jnp.asarray(fir_toeplitz_mats(np.asarray(h, np.float64)),
                    jnp.float32)
    C, N = 2, 2 * 65536
    x = jnp.asarray(rng.standard_normal((C, N)), jnp.float32)
    acc = np.asarray(
        fir_periodogram4096(x, G, interpret=True, precision="split"))
    y = np.asarray(fir_filter(h, x), np.float64)
    ref = np.zeros((C, 4096))
    for c in range(C):
        for f in range(N // 4096):
            ref[c] += np.abs(np.fft.fft(y[c, f * 4096:(f + 1) * 4096])) ** 2
    rel = np.max(np.abs(acc - ref)) / ref.max()
    assert rel < 1e-2, rel


def test_periodogram_split_precision_accuracy():
    y = jnp.asarray(rng.standard_normal((1, 16 * 4096)), jnp.float32)
    acc = np.asarray(periodogram4096_acc(y, interpret=True,
                                         precision="split"))
    yn = np.asarray(y, np.float64)
    ref = np.zeros((1, 4096))
    for f in range(16):
        ref[0] += np.abs(np.fft.fft(yn[0, f * 4096:(f + 1) * 4096])) ** 2
    assert np.max(np.abs(acc - ref)) / ref.max() < 1e-2


def test_fused_chain_multi_chunk_state():
    """FIR history must carry across chunks within a channel."""
    h = fir_lowpass(200, 0.15)
    G = jnp.asarray(fir_toeplitz_mats(np.asarray(h, np.float64)),
                    jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 3 * 65536)), jnp.float32)
    acc = np.asarray(fir_periodogram4096(x, G, interpret=True))
    y = np.asarray(fir_filter(h, x))
    ref = np.zeros((1, 4096))
    for f in range(3 * 16):
        ref[0] += np.abs(np.fft.fft(y[0, f * 4096:(f + 1) * 4096])) ** 2
    assert np.max(np.abs(acc - ref)) / ref.max() < 1e-5
