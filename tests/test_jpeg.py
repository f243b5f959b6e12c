"""Baseline JPEG codec tests (stages/jpeg.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cesium_ray.stages.jpeg import (
    JpegFeatures,
    decode_jpeg,
    encode_jpeg,
    jpeg_features,
)


def _blocky(rng, th, tw):
    tiles = rng.integers(0, 256, size=(th, tw, 3), dtype=np.uint8)
    return np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)


def test_blocky_q100_roundtrip_exact():
    """The oracle contract: constant 8x8 tiles at quality=100 decode
    BYTE-EXACTLY (all AC quantize to 0; DC + YCbCr rounding stay under
    the 0.5 margin)."""
    rng = np.random.default_rng(7)
    img = _blocky(rng, 5, 7)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.array_equal(dec, img)


def test_blocky_gray_roundtrip_exact():
    rng = np.random.default_rng(8)
    g = np.repeat(np.repeat(
        rng.integers(0, 256, size=(3, 4), dtype=np.uint8), 8, 0), 8, 1)
    assert np.array_equal(decode_jpeg(encode_jpeg(g, quality=100)), g)


def test_gradient_psnr():
    """Lossy path: smooth content at q=90 stays above 40 dB."""
    x = np.linspace(0, 255, 64)
    grad = np.clip(np.rint(np.stack(
        [np.add.outer(x, x) / 2] * 3, axis=-1)), 0, 255).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(grad, quality=90))
    mse = ((d.astype(float) - grad.astype(float)) ** 2).mean()
    assert 10 * np.log10(255 ** 2 / mse) > 40


def test_compression_and_quality_knob():
    """Lower quality -> smaller file; decode still parses."""
    rng = np.random.default_rng(9)
    img = _blocky(rng, 8, 8)
    hi = encode_jpeg(img, quality=95)
    lo = encode_jpeg(img, quality=30)
    assert len(lo) < len(hi)
    assert decode_jpeg(lo).shape == img.shape


def test_rejects_malformed():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    rng = np.random.default_rng(3)
    img = _blocky(rng, 2, 2)
    enc = encode_jpeg(img, quality=80)
    with pytest.raises(ValueError):
        decode_jpeg(enc[:40])  # truncated before SOS
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((10, 16, 3), np.uint8))  # not 8-aligned


def test_fill_bytes_before_marker():
    """T.81 B.1.1.2: 0xFF fill bytes may pad before any marker — a
    spec-legal file from another encoder must still decode."""
    rng = np.random.default_rng(11)
    img = _blocky(rng, 2, 3)
    enc = encode_jpeg(img, quality=100)
    # inject two fill bytes before the first post-SOI marker (DQT)
    padded = enc[:2] + b"\xff\xff" + enc[2:]
    assert np.array_equal(decode_jpeg(padded), img)


def test_jpeg_features_stage(ray_session):
    """Actor-pool decode over real jpeg payloads: exact channel sums
    on blocky q=100 content."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(6):
        img = _blocky(rng, 2, 3)
        rows.append((i, img))
    tbl = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "payload": pa.array(
            [encode_jpeg(r[1], quality=100) for r in rows], pa.binary()),
    })
    out = (jpeg_features(ray.data.from_arrow(tbl), batch_size=2)
           .to_pandas().set_index("media_id").sort_index())
    for i, img in rows:
        s = img.reshape(-1, 3).astype(np.int64).sum(axis=0)
        assert out.loc[i, "width"] == img.shape[1]
        assert out.loc[i, "height"] == img.shape[0]
        assert out.loc[i, "sum_r"] == s[0]
        assert out.loc[i, "sum_g"] == s[1]
        assert out.loc[i, "sum_b"] == s[2]
