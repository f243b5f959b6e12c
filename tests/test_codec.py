"""Gorilla/DoD codec bit-exact roundtrip tests (FIXTURES.md F5)."""

import numpy as np
import pytest

from cesium_ray.oracle.codec import crc32, decode_chunk, encode_chunk


def _roundtrip(ts, vals):
    payload = encode_chunk(ts, vals)
    t2, v2 = decode_chunk(payload, len(ts))
    np.testing.assert_array_equal(t2, np.asarray(ts, dtype=np.int64))
    np.testing.assert_array_equal(
        v2.view(np.uint64), np.asarray(vals, dtype=np.float64).view(np.uint64)
    )
    return payload


def test_random_roundtrip():
    rng = np.random.default_rng(0)
    ts = np.cumsum(rng.integers(1, 10**8, 2000)).astype(np.int64)
    vals = rng.normal(0, 100, 2000)
    _roundtrip(ts, vals)


def test_adversarial_floats():
    ts = np.arange(0, 9 * 60_000_000, 60_000_000, dtype=np.int64)
    vals = np.array([np.nan, -0.0, 0.0, np.inf, -np.inf, 5e-324, 1.7e308, -1.5, np.nan])
    _roundtrip(ts, vals)


def test_constant_values_compress_well():
    ts = np.arange(0, 4096 * 1_000_000, 1_000_000, dtype=np.int64)  # regular 1s cadence
    vals = np.full(4096, 42.5)
    payload = _roundtrip(ts, vals)
    raw = 16 * 4096
    assert raw / len(payload) > 20  # Gorilla shines on constants + regular cadence


def test_irregular_microsecond_timestamps():
    rng = np.random.default_rng(1)
    ts = np.cumsum(rng.exponential(45e6, 500)).astype(np.int64) + 10**15
    vals = rng.lognormal(3, 1, 500)
    _roundtrip(ts, vals)


def test_negative_and_zero_deltas():
    ts = np.array([100, 100, 99, 150, 150, 10**12], dtype=np.int64)
    vals = np.array([1.0, 1.0, 2.0, 2.0, 3.0, 3.0])
    _roundtrip(ts, vals)


def test_single_point_and_empty():
    _roundtrip(np.array([123456789], dtype=np.int64), np.array([np.pi]))
    assert encode_chunk(np.array([], dtype=np.int64), np.array([])) == b""
    t, v = decode_chunk(b"", 0)
    assert len(t) == 0 and len(v) == 0


def test_fast_decode_matches_scalar():
    """The production decoder (byte-window scan + vectorized field
    gather) must agree bit-for-bit with the scalar reference on every
    value class, including the giant-jump 69-bit DoD bucket."""
    from cesium_ray.oracle.codec import _decode_chunk_scalar

    rng = np.random.default_rng(11)
    for kind in range(5):
        n = int(rng.integers(1, 500))
        deltas = rng.choice(
            [0, 1, 7, 60_000_000, -3, 2**34, 13], size=n,
            p=[.1, .2, .2, .2, .1, .05, .15])
        ts = np.cumsum(deltas).astype(np.int64) + 10**15
        if kind == 0:
            vals = rng.normal(size=n)
        elif kind == 1:
            vals = np.round(rng.normal(size=n) * 100) / 100
        elif kind == 2:
            vals = np.full(n, 3.25)
            vals[rng.random(n) < .1] = np.nan
        elif kind == 3:
            vals = rng.choice(
                [0.0, -0.0, np.inf, -np.inf, np.nan, 5e-324, 1.0], size=n)
        else:
            vals = rng.integers(0, 3, size=n).astype(np.float64)
        payload = encode_chunk(ts, vals)
        t1, v1 = _decode_chunk_scalar(payload, n)
        t2, v2 = decode_chunk(payload, n)
        np.testing.assert_array_equal(t1, t2)
        np.testing.assert_array_equal(v1.view(np.uint64), v2.view(np.uint64))


def test_crc():
    p = encode_chunk(np.array([1, 2], dtype=np.int64), np.array([1.0, 2.0]))
    assert crc32(p) == crc32(p)
    assert crc32(p) != crc32(p + b"x")

# ---------------------------------------------------------------- v2

from cesium_ray.oracle.codec import decode_chunk_v2, encode_chunk_v2


def _roundtrip_v2(ts, vals):
    payload = encode_chunk_v2(ts, vals)
    t2, v2 = decode_chunk_v2(payload, len(ts))
    np.testing.assert_array_equal(t2, np.asarray(ts, dtype=np.int64))
    np.testing.assert_array_equal(
        v2.view(np.uint64),
        np.asarray(vals, dtype=np.float64).view(np.uint64))
    return payload


@pytest.mark.parametrize("kind", range(6))
def test_v2_roundtrip_classes(kind):
    """v2 (columnar control) bit-exact on every value class the v1
    suite covers, incl. NaN/±0/±inf/denormals and giant DoD jumps."""
    rng = np.random.default_rng(100 + kind)
    n = int(rng.integers(1, 800))
    deltas = rng.choice(
        [0, 1, 7, 60_000_000, -3, 2**34, 2**45, 13], size=n,
        p=[.1, .2, .2, .2, .1, .04, .01, .15])
    ts = np.cumsum(deltas).astype(np.int64) + 10**15
    if kind == 0:
        vals = rng.normal(size=n)
    elif kind == 1:
        vals = np.round(rng.normal(size=n) * 100) / 100
    elif kind == 2:
        vals = np.full(n, 3.25)
        vals[rng.random(n) < .1] = np.nan
    elif kind == 3:
        vals = rng.choice(
            [0.0, -0.0, np.inf, -np.inf, np.nan, 5e-324, 1.0], size=n)
    elif kind == 4:
        vals = rng.integers(0, 3, size=n).astype(np.float64)
    else:
        vals = np.full(n, -1.7e308)
    _roundtrip_v2(ts, vals)


def test_v2_empty_single():
    assert encode_chunk_v2(np.array([], dtype=np.int64),
                           np.array([])) == b""
    t, v = decode_chunk_v2(b"", 0)
    assert len(t) == 0 and len(v) == 0
    _roundtrip_v2(np.array([-123456789], dtype=np.int64),
                  np.array([np.nan]))


def test_v2_size_parity_with_v1():
    """Same record vocabulary → v2 stream within a few % of v1."""
    rng = np.random.default_rng(5)
    n = 20_000
    ts = np.cumsum(rng.exponential(45e6, n)).astype(np.int64)
    vals = np.round(rng.lognormal(3, 1, n), 1)
    p1 = encode_chunk(ts, vals)
    p2 = _roundtrip_v2(ts, vals)
    assert len(p2) < 1.05 * len(p1) + 64


def test_v2_constant_compresses_well():
    ts = np.arange(0, 4096 * 1_000_000, 1_000_000, dtype=np.int64)
    vals = np.full(4096, 42.5)
    payload = _roundtrip_v2(ts, vals)
    assert 16 * 4096 / len(payload) > 20
