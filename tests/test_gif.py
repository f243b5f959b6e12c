"""GIF codec tests (stages/gif.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cesium_ray.stages.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_frame_features,
)


def test_lzw_roundtrip_shapes():
    rng = np.random.default_rng(1)
    cases = [
        rng.integers(0, 256, 5000).astype(np.uint8),
        np.tile(np.arange(16, dtype=np.uint8), 1000),
        np.zeros(10000, np.uint8),
        np.arange(256, dtype=np.uint8),
        rng.integers(0, 256, 30000).astype(np.uint8),  # forces CLEAR
    ]
    for data in cases:
        assert np.array_equal(_lzw_decode(_lzw_encode(data), 8), data)


def test_gif_single_frame_exact():
    rng = np.random.default_rng(2)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    img = rng.integers(0, 256, (24, 31)).astype(np.uint8)
    frames, p2 = decode_gif(encode_gif(img, pal))
    assert frames.shape == (1, 24, 31)
    assert np.array_equal(frames[0], img)
    assert np.array_equal(p2, pal)


def test_gif_animated_exact():
    """Multi-frame (video-shaped) roundtrip: every frame decodes
    bit-exactly in order."""
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    anim = rng.integers(0, 256, (5, 16, 20)).astype(np.uint8)
    frames, _ = decode_gif(encode_gif(anim, pal))
    assert np.array_equal(frames, anim)


def test_gif_compresses_repetitive():
    pal = np.zeros((256, 3), np.uint8)
    rep = np.tile(np.arange(8, dtype=np.uint8).repeat(8), (64, 1))
    enc = encode_gif(np.stack([rep] * 3), pal)
    assert len(enc) < 3 * rep.size  # beats raw indices


def test_gif_rejects_malformed():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF....")
    pal = np.zeros((256, 3), np.uint8)
    enc = encode_gif(np.zeros((8, 8), np.uint8), pal)
    with pytest.raises(ValueError):
        decode_gif(enc[:20])  # truncated mid-structure
    # local color table: refused (would silently repaint frames
    # through one shared palette) — set the LCT flag on the image
    # descriptor and splice in a 4-entry table
    desc = enc.index(b"\x2c")
    lct = bytes(enc[:desc + 9]) + bytes([enc[desc + 9] | 0x81]) \
        + b"\x00" * 12 + bytes(enc[desc + 10:])
    with pytest.raises(ValueError, match="local color table"):
        decode_gif(lct)


def test_gif_frame_features_stage(ray_session):
    """Actor-pool decode: one row per frame, exact channel sums
    through the palette."""
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    rows = []
    for i in range(4):
        anim = rng.integers(0, 256, (3, 8, 8)).astype(np.uint8)
        rows.append((i, anim))
    tbl = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "payload": pa.array([encode_gif(r[1], pal) for r in rows],
                            pa.binary()),
    })
    out = (gif_frame_features(ray.data.from_arrow(tbl), batch_size=2)
           .to_pandas().set_index(["media_id", "frame_idx"]).sort_index())
    assert len(out) == 12  # 4 payloads x 3 frames
    for i, anim in rows:
        for f in range(3):
            counts = np.bincount(anim[f].ravel(), minlength=256)
            want = counts @ pal.astype(np.int64)
            got = out.loc[(i, f)]
            assert got["n_frames"] == 3
            for j, c in enumerate("rgb"):
                assert got[f"sum_{c}"] == want[j]
