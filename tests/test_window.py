"""Window tests vs scipy (independent golden reference) and closed forms.

Mirrors the reference's strategy of validating against independent
reimplementations (SURVEY §4)."""
import numpy as np
import pytest
import scipy.signal.windows as sw

from libtsd_tpu.ops import window as W


@pytest.mark.parametrize("n", [16, 64, 128])
def test_hann_symmetric_even(n):
    # for even n the reference's symmetric grid spans [-1/2, 1/2] inclusive
    # -> identical to scipy sym=True
    w = W.window("hann", n, sym=True)
    ws = sw.hann(n, sym=True)
    assert np.max(np.abs(w - ws)) < 1e-12


@pytest.mark.parametrize("n", [15, 63, 127])
def test_hann_symmetric_odd(n):
    # for odd n the reference grid is t = (k - n//2)/n (spacing 1/n, endpoints
    # short of +-1/2) — check the closed form directly (fen_inter,
    # core/src/fenetres.cc:17-58)
    w = W.window("hann", n, sym=True)
    k = np.arange(n)
    t = (k - n // 2) / n
    expected = 0.5 + 0.5 * np.cos(2 * np.pi * t)
    assert np.max(np.abs(w - expected)) < 1e-12


@pytest.mark.parametrize("n", [16, 64, 128])
def test_hann_periodic(n):
    w = W.window("hann", n, sym=False)
    ws = sw.hann(n, sym=False)
    # periodic grid is shifted (reference centers at -n/2..(n-1)/2) — compare
    # as sets via sorted values and check endpoint zero count
    assert np.max(np.abs(np.sort(w) - np.sort(ws))) < 1e-9


@pytest.mark.parametrize("n", [16, 128])
def test_hamming(n):
    w = W.window("hamming", n, sym=True)
    ws = sw.general_hamming(n, 0.54, sym=True)
    assert np.max(np.abs(w - ws)) < 1e-12


@pytest.mark.parametrize("n", [16, 64])
def test_blackman(n):
    w = W.window("blackman", n, sym=True)
    ws = sw.blackman(n, sym=True)
    assert np.max(np.abs(w - ws)) < 1e-9


def test_triangle():
    w = W.window("triangle", 9, sym=True)
    assert abs(w[4] - 1.0) < 1e-12
    assert np.max(np.abs(w - w[::-1])) < 1e-12


@pytest.mark.parametrize("n,beta", [(32, 0.5), (64, 2.0)])
def test_kaiser(n, beta):
    # reference's beta is in units of pi; even n matches scipy sym=True
    w = W.kaiser_window(n, beta, sym=True)
    ws = sw.kaiser(n, beta * np.pi, sym=True)
    assert np.max(np.abs(w - ws)) < 1e-9


def test_kaiser_param():
    beta, n = W.kaiser_param(60.0, 0.05)
    # Kaiser formula: beta = 0.1102*(60-8.7) = 5.653; n odd
    assert abs(beta * np.pi - 0.1102 * (60 - 8.7)) < 1e-6
    assert n % 2 == 1
    assert n >= 30  # (60-7.95)/(2.285*2*pi*0.05) ~ 72


@pytest.mark.parametrize("n", [33, 51])
def test_chebyshev(n):
    w = W.chebyshev_window(n, 80.0)
    ws = sw.chebwin(n, 80.0, sym=True)
    assert np.max(np.abs(w - ws)) < 1e-6


def test_chebyshev_attenuation():
    # side-lobe level of the Chebyshev window must be ~ -60 dB for 60 dB spec
    n = 64
    w = W.chebyshev_window(n, 60.0)
    H = np.abs(np.fft.fft(w, 4096))
    H /= H.max()
    # find sidelobe region (beyond main lobe)
    main = int(4096 / n * 2.5)
    sidelobe_db = 20 * np.log10(H[main:2048].max())
    assert sidelobe_db < -55


def test_slepian():
    n, B = 65, 0.1
    w = W.slepian_window(n, B)
    # DPSS property: dominant eigenvector of sinc kernel; compare to scipy
    ws = sw.dpss(n, B * n / 2.0)
    w1, w2 = w / np.linalg.norm(w), ws / np.linalg.norm(ws)
    if np.dot(w1, w2) < 0:
        w2 = -w2
    assert np.max(np.abs(w1 - w2)) < 1e-3
