"""Multimodal (binary-payload) stages.

FOUR modalities have REAL codecs implemented with numpy/struct/zlib
only: RIFF/WAVE PCM16 audio, binary P6 PPM images, baseline PNG
(DEFLATE ships in the Python stdlib, so the full CRC-checked chunk
walk + five scanline unfilters need no external media library), and
baseline JPEG (sibling module stages/jpeg.py — full DCT + optimized
Huffman from the public ITU-T T.81 spec).  Payloads are genuine files
any media tool can open, and the paths are driver-verified end-to-end
(`wav_features` / `image_features` / `png_decode` / `jpeg_roundtrip`
★).  Remaining transform codecs (MP3/H.264) need libraries this
container does not ship — those stay behind the clearly-marked
``MediaDecodeStub`` with the same actor signature, swappable per
actor in a real deployment.

Schema convention: media rides as an opaque ``payload: binary`` column
with typed metadata columns (``media_type``, ``width``, ``height``,
``sample_rate``, …).  Batches stay in ``pyarrow`` format end-to-end —
binary columns round-trip zero-copy through the object store and do
NOT survive pandas object-dtype conversion well (see ray_guide
pitfalls).  Batch sizes must stay small for large payloads
(``batch_size`` parameter, default 64).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


class MediaDecodeStub:
    """Actor-pool decode stage.  A real deployment replaces the
    feature kernel with PIL/libav calls loaded once per actor in
    ``__init__``; here it emits a deterministic fake feature vector
    derived from the payload bytes — ``feature[j] =
    splitmix64(content_hash64(payload) + j) / 2^64`` — so the pipeline
    shape (schema, actor signature, batch size, output layout) is
    fully testable AND the values are pure 64-bit arithmetic a SQL
    oracle reproduces exactly (unlike the blake2b digest this
    replaced)."""

    def __init__(self, feature_dim: int = 8, real_decoder: bool = False):
        self.feature_dim = feature_dim
        if real_decoder:
            raise NotImplementedError(
                "compressed-video decode libraries are not available in "
                "this container; run with real_decoder=False "
                "(deterministic stub). Images (PNG/PPM/JPEG/GIF) and audio "
                "(WAV/MP3 spectral) have REAL from-spec codecs in "
                "stages/{multimodal,jpeg,gif,mp3}.py"
            )

    def _decode_batch(self, payloads: list) -> np.ndarray:
        from .dedup import _splitmix64, content_hash64

        base = content_hash64(payloads)
        lanes = np.arange(self.feature_dim, dtype=np.uint64)
        with np.errstate(over="ignore"):
            raw = _splitmix64((base[:, None] + lanes[None, :]).ravel())
        return (raw.astype(np.float64) / 2**64).reshape(
            len(payloads), self.feature_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = self._decode_batch(
            [p.as_py() for p in batch["payload"]])
        arr = pa.array([f.tolist() for f in feats], pa.list_(pa.float64()))
        return batch.drop_columns(["payload"]).append_column("features", arr)


def decode_media(
    ds: ray.data.Dataset,
    feature_dim: int = 8,
    batch_size: int = 64,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """payload:binary (+metadata) → features:list<double>.  Small batch
    size: payload × batch_size × concurrency must fit worker heaps."""
    return ds.map_batches(
        MediaDecodeStub,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"feature_dim": feature_dim},
    )


# ---------------------------------------------------------------------------
# REAL audio path: RIFF/WAVE PCM16 is a pure container format — encode
# and decode are implemented here with numpy + struct only (no external
# media libraries needed), so this modality is NOT a stub: payloads are
# genuine .wav bytes any audio tool can open, and the decoder walks the
# RIFF chunk list like a real parser (unknown chunks are skipped).

import struct


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono PCM16 WAV bytes for an int16 sample array."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    data = s.tobytes()
    byte_rate = sample_rate * 2
    return b"".join([
        b"RIFF", struct.pack("<I", 36 + len(data)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                             byte_rate, 2, 16),
        b"data", struct.pack("<I", len(data)), data,
    ])


def decode_wav_pcm16(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse a RIFF/WAVE payload → (sample_rate, int16 samples).

    Real chunk walk: 'fmt ' and 'data' may appear in any order with
    other chunks (LIST, fact, …) interleaved; chunk bodies are padded
    to even length per the RIFF spec.  Raises ValueError on anything
    that is not mono PCM16."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated RIFF chunk")
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if (audio_fmt, n_ch, bits) != (1, 1, 16):
        raise ValueError(f"unsupported wav layout {fmt}")
    return rate, np.frombuffer(data, dtype="<i2")


class WavFeatures:
    """Actor-pool decode stage over REAL wav payloads: parses each
    payload and emits exact integer-space features (``n_samples``,
    ``sample_rate``, ``duration_s``, ``peak``, ``rms``,
    ``zero_crossings``, ``mean_abs_step``) — every value reproducible
    by an oracle that knows the source samples."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"n_samples": [], "sample_rate": [], "duration_s": [],
                "peak": [], "rms": [], "zero_crossings": [],
                "mean_abs_step": []}
        for p in batch["payload"]:
            rate, s = decode_wav_pcm16(p.as_py())
            si = s.astype(np.int64)
            n = len(si)
            ssq = int((si * si).sum())
            rows["n_samples"].append(n)
            rows["sample_rate"].append(rate)
            rows["duration_s"].append(n / float(rate))
            rows["peak"].append(int(np.abs(si).max()) if n else 0)
            # float(ssq) FIRST (like SQL's CAST(sum AS DOUBLE)) so the
            # op sequence matches the oracle even when ssq ≥ 2^53
            rows["rms"].append(float(np.sqrt(float(ssq) / n)) if n else 0.0)
            # sign-flip count + mean |Δ| — exact int space, 0 for n<2
            rows["zero_crossings"].append(
                int(((si[:-1] * si[1:]) < 0).sum()) if n > 1 else 0)
            rows["mean_abs_step"].append(
                float(int(np.abs(np.diff(si)).sum())) / (n - 1)
                if n > 1 else 0.0)
        out = batch.drop_columns(["payload"])
        for k, v in rows.items():
            t = pa.int64() if k in ("n_samples", "sample_rate", "peak",
                                    "zero_crossings") \
                else pa.float64()
            out = out.append_column(k, pa.array(v, t))
        return out


def wav_features(
    ds: ray.data.Dataset, batch_size: int = 64, concurrency=(1, 8)
) -> ray.data.Dataset:
    """payload:binary (mono PCM16 wav) → exact audio features."""
    return ds.map_batches(
        WavFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


# REAL image path: P6 PPM (binary RGB) is likewise a pure container —
# ASCII header (+ optional '#' comments) followed by raw RGB bytes.


def encode_ppm(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary P6 PPM bytes."""
    a = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("P6 needs 3 channels")
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM → (H, W, 3) uint8.  Parses the real header
    grammar: magic, then 3 whitespace-separated ints with '#' comments
    allowed between tokens."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos:pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PPM header")
        vals.append(int(payload[start:pos]))
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    pos += 1  # single whitespace after maxval, then raw data
    data = payload[pos:pos + w * h * 3]
    if len(data) < w * h * 3:
        raise ValueError("truncated PPM data")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


class PpmFeatures:
    """Actor-pool decode over real P6 payloads → exact integer-space
    image features (width, height, per-channel means)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {"width": [], "height": [], "n_pixels": [],
                "mean_r": [], "mean_g": [], "mean_b": []}
        for p in batch["payload"]:
            img = decode_ppm(p.as_py())
            h, w, _ = img.shape
            n = h * w
            sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            cols["width"].append(w)
            cols["height"].append(h)
            cols["n_pixels"].append(n)
            for i, ch in enumerate(("mean_r", "mean_g", "mean_b")):
                cols[ch].append(float(sums[i]) / n if n else 0.0)
        out = batch.drop_columns(["payload"])
        for k, v in cols.items():
            t = pa.int64() if k in ("width", "height", "n_pixels") \
                else pa.float64()
            out = out.append_column(k, pa.array(v, t))
        return out


def ppm_features(
    ds: ray.data.Dataset, batch_size: int = 64, concurrency=(1, 8)
) -> ray.data.Dataset:
    """payload:binary (P6 PPM) → exact image features."""
    return ds.map_batches(
        PpmFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample(
    ds: ray.data.Dataset, every_n: int = 10, idx_col: str = "frame_idx"
) -> ray.data.Dataset:
    """Keep every n-th frame of a media stream (vectorized Arrow filter)."""
    def fn(batch: pa.Table) -> pa.Table:
        idx = batch[idx_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(idx % every_n == 0))

    return ds.map_batches(fn, batch_format="pyarrow")


# REAL compressed-image path: PNG.  DEFLATE lives in the Python
# stdlib (zlib), so a full baseline PNG codec — signature, CRC-checked
# chunks, IHDR/IDAT/IEND, and all five scanline filters — needs no
# external media library.  Public spec: RFC 2083 / W3C PNG.

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(tag + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)


def encode_png(img: np.ndarray, filter_type: int | str = 0) -> bytes:
    """(H, W, 3|4) uint8 → PNG bytes (8-bit truecolor / +alpha).

    ``filter_type``: 0–4 applies that filter to every scanline;
    ``"cycle"`` rotates 0→4 by row so decoders exercise every
    unfilter path.  Output is a spec-valid file any PNG tool opens."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = a.shape
    if c not in (3, 4):
        raise ValueError("PNG encoder supports RGB / RGBA")
    color_type = 2 if c == 3 else 6
    rows = a.reshape(h, w * c).astype(np.int16)
    prev = np.zeros(w * c, dtype=np.int16)
    out = bytearray()
    for y in range(h):
        ft = (y % 5) if filter_type == "cycle" else int(filter_type)
        cur = rows[y]
        left = np.zeros(w * c, dtype=np.int16)
        left[c:] = cur[:-c]
        ul = np.zeros(w * c, dtype=np.int16)
        ul[c:] = prev[:-c]
        if ft == 0:
            f = cur
        elif ft == 1:
            f = cur - left
        elif ft == 2:
            f = cur - prev
        elif ft == 3:
            f = cur - (left + prev) // 2
        elif ft == 4:
            p = left + prev - ul
            pa_, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                            np.where(pb <= pc, prev, ul))
            f = cur - pred
        else:
            raise ValueError("filter_type 0-4 or 'cycle'")
        out.append(ft)
        out += (f & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8.  Real decode: CRC-checked chunk
    walk, zlib-inflated IDAT stream, and all five scanline unfilters
    (None/Sub/Up/Average/Paeth).  Supports the baseline this engine
    emits and most camera/tool output: 8-bit gray / RGB / RGBA,
    non-interlaced."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    c = {0: 1, 2: 3, 6: 4}.get(color_type)
    if c is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    fts = raw[:, 0]
    data = raw[:, 1:].astype(np.int16)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ft = fts[y]
        cur = data[y]
        if ft == 0:
            rec = cur
        elif ft == 2:  # Up: previous row only — fully vectorized
            rec = (cur + prev) & 0xFF
        elif ft == 1:  # Sub: per-lane prefix sum mod 256
            lanes = cur.reshape(w, c)
            rec = (np.cumsum(lanes, axis=0, dtype=np.int64) & 0xFF) \
                .astype(np.int16).reshape(stride)
        elif ft in (3, 4):
            # Average/Paeth carry a left-dependency, so the scan is
            # sequential per channel lane by spec.  Run it as a pure
            # Python register scan over plain lists (one C-speed
            # tolist per row) — ~15× faster than numpy scalar
            # indexing — with the left-independent Paeth terms
            # (pa = |up-ul|, pc = |left + (up-2·ul)|) precomputed
            # vectorized per row.
            curl = cur.tolist()
            prevl = prev.tolist()
            recl = [0] * stride
            if ft == 3:  # Average
                for k in range(c):
                    left = 0
                    for x in range(k, stride, c):
                        left = (curl[x] + ((left + prevl[x]) >> 1)) & 0xFF
                        recl[x] = left
            else:  # Paeth
                ul_arr = np.empty(stride, dtype=np.int16)
                ul_arr[:c] = 0
                ul_arr[c:] = prev[:-c]
                pal = np.abs(prev - ul_arr).tolist()
                dl = (prev - 2 * ul_arr).tolist()
                ull = ul_arr.tolist()
                for k in range(c):
                    left = 0
                    for x in range(k, stride, c):
                        ul = ull[x]
                        pb = left - ul
                        if pb < 0:
                            pb = -pb
                        pc = left + dl[x]
                        if pc < 0:
                            pc = -pc
                        pa_ = pal[x]
                        if pa_ <= pb and pa_ <= pc:
                            pred = left
                        elif pb <= pc:
                            pred = prevl[x]
                        else:
                            pred = ul
                        left = (curl[x] + pred) & 0xFF
                        recl[x] = left
            rec = np.asarray(recl, dtype=np.int16)
        else:
            raise ValueError(f"bad PNG filter byte {ft}")
        out[y] = rec.astype(np.uint8)
        prev = out[y].astype(np.int16)
    return out.reshape(h, w, c)


class PngFeatures:
    """Actor-pool decode over real PNG payloads → exact integer-space
    image features (width, height, channel count, per-channel means).
    Same contract as PpmFeatures; the zlib inflate + unfilter runs
    once per payload inside the actor."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {"width": [], "height": [], "n_pixels": [],
                "mean_r": [], "mean_g": [], "mean_b": []}
        for p in batch["payload"]:
            img = decode_png(p.as_py())
            h, w, c = img.shape
            n = h * w
            sums = img.reshape(-1, c)[:, :3].sum(axis=0, dtype=np.int64)
            cols["width"].append(w)
            cols["height"].append(h)
            cols["n_pixels"].append(n)
            for i, ch in enumerate(("mean_r", "mean_g", "mean_b")):
                v = sums[i] if c >= 3 else sums[0]
                cols[ch].append(float(v) / n if n else 0.0)
        out = batch.drop_columns(["payload"])
        for k, v in cols.items():
            t = pa.int64() if k in ("width", "height", "n_pixels") \
                else pa.float64()
            out = out.append_column(k, pa.array(v, t))
        return out


def png_features(
    ds: ray.data.Dataset, batch_size: int = 64, concurrency=(1, 8)
) -> ray.data.Dataset:
    """payload:binary (PNG) → exact image features."""
    return ds.map_batches(
        PngFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
