"""MPEG-1 Layer III spectral codec tests (stages/mp3.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cesium_ray.stages.mp3 import (
    Mp3Features,
    alias_reduce,
    decode_mp3_spectra,
    encode_mp3,
    imdct_granules,
    mp3_features,
)


def _random_spec(rng, n_frames=3, k=25):
    spec = np.zeros((n_frames, 2, 576), dtype=np.int64)
    for f in range(n_frames):
        for g in range(2):
            pos = rng.choice(576, size=k, replace=False)
            spec[f, g, pos] = rng.choice([-1, 1], size=k)
    return spec


def test_roundtrip_exact():
    """The oracle contract: ±1 lines at global_gain=210 decode
    EXACTLY through header/side-info/Huffman/requantize."""
    rng = np.random.default_rng(7)
    spec = _random_spec(rng)
    ix, xr, meta = decode_mp3_spectra(encode_mp3(spec))
    assert np.array_equal(ix, spec)
    assert np.array_equal(xr, spec.astype(float))
    assert meta == {"samplerate": 44100, "bitrate": 128000,
                    "n_frames": 3}


def test_frame_geometry():
    """128 kbps / 44.1 kHz mono -> 417-byte frames, spec formula."""
    spec = np.zeros((4, 2, 576), dtype=np.int64)
    spec[:, :, 0] = 1
    payload = encode_mp3(spec)
    assert len(payload) == 4 * 417
    assert payload[0] == 0xFF and payload[1] == 0xFB


def test_dense_and_empty_granules():
    """Edge cases: a fully-dense granule (288 pairs) and an all-zero
    one (big_values=0) both roundtrip."""
    spec = np.zeros((1, 2, 576), dtype=np.int64)
    spec[0, 0, :] = np.where(np.arange(576) % 3 == 0, 1, -1)
    ix, _, _ = decode_mp3_spectra(encode_mp3(spec))
    assert np.array_equal(ix, spec)


def test_resync_skips_garbage_prefix():
    """Decoder scans to the first sync word (ID3-ish junk prefix)."""
    rng = np.random.default_rng(11)
    spec = _random_spec(rng, n_frames=2)
    payload = b"JUNKJUNK\x00\x01" + encode_mp3(spec)
    ix, _, meta = decode_mp3_spectra(payload)
    assert meta["n_frames"] == 2
    assert np.array_equal(ix, spec)


def test_rejects_malformed():
    with pytest.raises(ValueError):
        decode_mp3_spectra(b"no frames here at all")
    with pytest.raises(ValueError):
        encode_mp3(np.full((1, 2, 576), 2, dtype=np.int64))  # |ix|>1


def test_requantize_gain_scaling():
    """A hand-built frame with global_gain != 210 requantizes to the
    spec power law 2^((gg-210)/4): patch the side-info gain bits."""
    spec = np.zeros((1, 2, 576), dtype=np.int64)
    spec[0, :, 10] = 1
    payload = bytearray(encode_mp3(spec))
    # side info starts at byte 4; granule 0 fields begin at bit 18:
    # part2_3_length(12) + big_values(9) -> global_gain at bit 39
    rd_off = 4 * 8 + 18 + 12 + 9
    # write global_gain=214 (=210+4 -> xr scales by 2.0)
    for i, b in enumerate(f"{214:08b}"):
        byte_i, bit_i = divmod(rd_off + i, 8)
        if b == "1":
            payload[byte_i] |= 0x80 >> bit_i
        else:
            payload[byte_i] &= ~(0x80 >> bit_i) & 0xFF
    ix, xr, _ = decode_mp3_spectra(bytes(payload))
    assert ix[0, 0, 10] == 1
    assert xr[0, 0, 10] == pytest.approx(2.0, abs=0)
    assert xr[0, 1, 10] == pytest.approx(1.0, abs=0)  # untouched granule


def test_alias_reduce_energy_preserving():
    """Butterflies are rotations: per-boundary energy is preserved."""
    rng = np.random.default_rng(13)
    xr = rng.normal(size=(2, 576))
    out = alias_reduce(xr)
    assert (xr ** 2).sum() == pytest.approx((out ** 2).sum(), rel=1e-12)
    assert not np.allclose(out, xr)  # it did something


def test_imdct_subband_isolation_and_overlap():
    """A single spectral line excites only its own subband, and the
    second granule's head receives the first granule's tail
    (50% overlap-add)."""
    x = np.zeros((2, 576))
    x[0, 18 * 5 + 3] = 1.0
    sb = imdct_granules(x)
    assert sb.shape == (2, 32, 18)
    others = [i for i in range(32) if i != 5]
    assert np.abs(sb[:, others]).max() < 1e-12
    assert np.abs(sb[1, 5]).max() > 1e-6  # tail carried into granule 1


def test_mp3_features_stage(ray_session):
    """Actor-pool stage end-to-end over a small payload dataset."""
    rng = np.random.default_rng(17)
    rows = []
    expect = {}
    for d in range(4):
        spec = _random_spec(rng, n_frames=2, k=10)
        flat = spec.reshape(-1)
        nz = np.flatnonzero(flat)
        expect[d] = (int(nz.size), int(nz.sum()),
                     int(np.sign(flat[nz]).sum()))
        rows.append({"doc_id": d, "payload": encode_mp3(spec)})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = mp3_features(ds, batch_size=2).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    for d in range(4):
        n, s_idx, s_sign = expect[d]
        r = out.iloc[d]
        assert (r["n_lines"], r["sum_idx"], r["sum_sign"]) == \
            (n, s_idx, s_sign)
        assert r["n_frames"] == 2 and r["samplerate"] == 44100
