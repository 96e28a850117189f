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


def test_fused_bf16_tier_equivalence():
    """The single-pass bf16 tier ('fastest' per the config comment):
    same detections, scores within its ~2.5e-3 tolerance."""
    from libtsd_tpu.models.detector import detect_pattern
    rng = np.random.default_rng(3)
    M = 256
    pat = (rng.standard_normal(M)
           + 1j * rng.standard_normal(M)).astype(np.complex64)
    x = _sig(8192, rng, pat, [(1200, 0.9, 0.5), (5000, 1.1, -0.8)])
    d1, s1 = detect_pattern(jnp.asarray(x), pat,
                            DetectorConfig(threshold=0.5))
    d2, s2 = detect_pattern(jnp.asarray(x), pat,
                            DetectorConfig(threshold=0.5, engine="fused",
                                           precision="bf16"))
    assert np.array_equal(np.asarray(d1.valid), np.asarray(d2.valid))
    assert np.array_equal(np.asarray(d1.position),
                          np.asarray(d2.position))
    assert np.abs(np.asarray(s1) - np.asarray(s2)).max() < 2e-2
    assert np.abs(np.asarray(d1.gain) - np.asarray(d2.gain)).max() < 1e-2


def test_fused_vmap_over_channels_matches_single():
    """vmap over channels (the frame receiver's batched form) lifts the
    kernel to a batched grid with per-channel results identical to
    running each channel alone."""
    rng = np.random.default_rng(4)
    M = 128
    pat = (rng.standard_normal(M)
           + 1j * rng.standard_normal(M)).astype(np.complex64)
    C, n = 3, 4096
    xs = np.stack([_sig(n, rng, pat, [(500 + 700 * c, 1.0, 0.2 * c)])
                   for c in range(C)])
    det = Detector.create(pat, DetectorConfig(threshold=0.5,
                                              engine="fused"))
    sts = jax.vmap(lambda _: det.init())(jnp.arange(C))
    _, (db, scb) = jax.vmap(det.step)(sts, jnp.asarray(xs))
    for c in range(C):
        _, (d1, sc1) = det.step(det.init(), jnp.asarray(xs[c]))
        assert np.array_equal(np.asarray(d1.valid),
                              np.asarray(db.valid)[c])
        assert np.array_equal(np.asarray(d1.position),
                              np.asarray(db.position)[c])
        np.testing.assert_allclose(np.asarray(sc1),
                                   np.asarray(scb)[c], atol=1e-6)


def test_fused_long_pattern_and_awkward_length():
    """M=1280 (D=11 context rows) on a block whose row count has no
    divisor near 128 (nrows=131 x 8 + 6 -> padded tiles): the plan pads
    instead of collapsing tile size, and long patterns stay correct
    (regression: nv > T crashed the pre-padding slice construction)."""
    from libtsd_tpu.models.detector import detect_pattern
    rng = np.random.default_rng(5)
    M = 1280
    pat = (rng.standard_normal(M)
           + 1j * rng.standard_normal(M)).astype(np.complex64)
    n = 131 * 128 + 768          # nrows = 137, prime-ish
    x = _sig(n, rng, pat, [(2000, 1.0, 0.4), (9000, 0.7, -0.2)])
    d1, s1 = detect_pattern(jnp.asarray(x), pat,
                            DetectorConfig(threshold=0.5))
    d2, s2 = detect_pattern(jnp.asarray(x), pat,
                            DetectorConfig(threshold=0.5,
                                           engine="fused"))
    assert np.array_equal(np.asarray(d1.valid), np.asarray(d2.valid))
    assert np.array_equal(np.asarray(d1.position),
                          np.asarray(d2.position))
    assert np.abs(np.asarray(s1) - np.asarray(s2)).max() < 1e-3


def test_fused_pattern_too_long_rejected():
    rng = np.random.default_rng(6)
    pat = (rng.standard_normal(130 * 128)
           + 1j * rng.standard_normal(130 * 128)).astype(np.complex64)
    with pytest.raises(ValueError):
        Detector.create(pat, DetectorConfig(engine="fused"))
