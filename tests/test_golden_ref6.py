"""Reference-binary diff, round 4c: the streaming constant-Q transform.

BEHAVIORAL golden, not a sample-level one: our `cqt_stream` redesigns the
reference's CQT::Impl for static shapes (the reference consumes
variable-size chunks per step — `nb_data_attendu` is data-dependent,
cqt.cc:286-291 — which is exactly the dynamic-shape pattern SURVEY §7
rules out on TPU; we double the FFT buffer and hop by N/2 instead).  The
kernel truncation grids therefore differ and magnitudes agree only in
shape, so the golden pins what is exactly shared (the geometric bin
grid) and the time/frequency localization behavior on a two-tone signal
analyzed by the actual binary (refbuild/golden_gen6.cc).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def g(name):
    return np.load(os.path.join(GOLD, name + ".npy"))


def test_cqt_stream_matches_reference_behavior():
    from libtsd_tpu.ops.cqt import (cqt_stream_kernel, cqt_stream,
                                    cqt_interpolate)
    x = g("g6_cqt_x")
    dims = g("g6_cqt_dims").astype(int)
    B = g("g6_cqt_A").reshape(dims[0], dims[1])
    freqs_ref = g("g6_cqt_freqs")

    K = cqt_stream_kernel(0.02, 0.2, 2 ** 0.25, Q=34.0, kprec=0.99,
                          window="hm")
    # (1) the geometric frequency grid is EXACT (same fmin * gamma^k law)
    assert len(K.freqs) == dims[1]
    assert np.abs(K.freqs - freqs_ref).max() < 1e-6

    t, m, v = cqt_stream(jnp.asarray(x, jnp.float32), K)
    _, _, A = cqt_interpolate(t, m, v, K, 256)

    # (2) localization: the 0.05 tone sits at bin 5 (0.02 * 2^(5/4)) for
    # BOTH analyses, in (almost) every time frame
    nr = min(A.shape[0], B.shape[0])
    a, b = A[4:nr - 4], B[4:nr - 4]
    assert np.mean(np.argmax(a, axis=1) == 5) > 0.85
    assert np.mean(np.argmax(b, axis=1) == 5) > 0.8

    # (3) the weaker 0.12 tone (bin ~10) is a local maximum of both
    # time-averaged profiles
    pa = a.mean(0)
    pb = b.mean(0)
    assert pa[10] > pa[9] * 1.2 and pa[10] > pa[11] * 1.2
    assert pb[10] > pb[9] * 1.2 and pb[10] > pb[11] * 1.2

    # (4) overall profile shape tracks the binary (normalized cosine;
    # the kernel-truncation grids differ by design, see module docstring)
    pa = pa / np.linalg.norm(pa)
    pb = pb / np.linalg.norm(pb)
    assert float(pa @ pb) > 0.8
