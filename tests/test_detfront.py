"""Fused Pallas detector front end (ops/pallas/detfront.py,
DetectorConfig(engine="fused")) — equivalence and streaming-state
properties vs the default XLA engines, interpret mode on CPU.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libtsd_tpu.models.detector import Detector, DetectorConfig


def _sig(n, rng, pat, places):
    x = 0.05 * (rng.standard_normal(n)
                + 1j * rng.standard_normal(n)).astype(np.complex64)
    for pos, g, th in places:
        x[pos:pos + len(pat)] += (g * np.exp(1j * th) * pat
                                  ).astype(np.complex64)
    return x


@pytest.mark.parametrize("M", [128, 256, 88])
def test_fused_matches_xla_engine(M):
    """Same detections, scores within kernel precision, for pattern
    lengths spanning D=2, D=3 and a non-lane-aligned M."""
    rng = np.random.default_rng(M)
    pat = (rng.standard_normal(M)
           + 1j * rng.standard_normal(M)).astype(np.complex64)
    x = _sig(8192, rng, pat, [(1200, 0.9, 0.5), (5000, 1.1, -0.8)])
    from libtsd_tpu.models.detector import detect_pattern
    d1, s1 = detect_pattern(jnp.asarray(x), pat,
                            DetectorConfig(threshold=0.5))
    d2, s2 = detect_pattern(jnp.asarray(x), pat,
                            DetectorConfig(threshold=0.5,
                                           engine="fused"))
    assert np.array_equal(np.asarray(d1.valid), np.asarray(d2.valid))
    assert np.array_equal(np.asarray(d1.position),
                          np.asarray(d2.position))
    assert np.abs(np.asarray(s1) - np.asarray(s2)).max() < 5e-4
    assert np.abs(np.asarray(d1.gain) - np.asarray(d2.gain)).max() < 1e-3
    assert np.abs(np.asarray(d1.theta)
                  - np.asarray(d2.theta)).max() < 1e-3


def test_fused_streaming_split_invariance():
    """Feeding the same signal in different Ne-multiple block splits
    yields identical detections (the carried complex input tail is the
    whole streaming state of the fused front)."""
    rng = np.random.default_rng(7)
    M = 256
    pat = (rng.standard_normal(M)
           + 1j * rng.standard_normal(M)).astype(np.complex64)
    n = 12288
    x = _sig(n, rng, pat, [(1000, 1.0, 0.3), (5100, 0.8, -0.4),
                           (9800, 1.2, 1.0)])
    det = Detector.create(pat, DetectorConfig(threshold=0.5,
                                              engine="fused"))
    Ne = det.Ne

    def run(block):
        st = det.init()
        out = []
        for off in range(0, n, block):
            st, (d, _) = det.step(st, jnp.asarray(x[off:off + block]))
            pos = np.asarray(d.position) + off
            val = np.asarray(d.valid)
            out += [int(p) for p, v in zip(pos, val) if v]
        return sorted(out)

    a = run(n)          # one shot
    b = run(2 * Ne)     # small blocks
    c = run(4 * Ne)
    assert a == b == c, (a, b, c)
    assert len(a) == 3


def test_fused_configured_ne_honored():
    rng = np.random.default_rng(1)
    pat = (rng.standard_normal(128)
           + 1j * rng.standard_normal(128)).astype(np.complex64)
    det = Detector.create(pat, DetectorConfig(engine="fused", Ne=2048))
    assert det.Ne == 2048
    with pytest.raises(ValueError):
        Detector.create(pat, DetectorConfig(engine="fused", Ne=1000))
    with pytest.raises(ValueError):
        Detector.create(pat, DetectorConfig(engine="fused", mode="rif"))
