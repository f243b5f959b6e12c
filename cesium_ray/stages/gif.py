"""GIF87a/89a codec — pure numpy + stdlib, public spec (W3C/CompuServe).

Completes the multimodal codec family (wav/PPM/PNG/JPEG in the sibling
modules): GIF's LZW is the last stdlib-implementable compressed format
here, and — unlike the stills — an ANIMATED GIF is a real multi-frame
container, so the engine's video-shaped plumbing (frame extraction →
``frame_sample`` → per-frame actor-pool features) runs against a REAL
decoder rather than the MediaDecodeStub.  H.264/MP3 remain gated (they
need external codec libraries).

Encoder: 8-bit global color table, one or more full-frame images,
REAL variable-width LZW (dict growth 9→12 bits, CLEAR on table
overflow), Netscape looping extension + per-frame Graphic Control
Extensions when animated.  Decoder: full block walk (extensions
skipped per spec grammar), variable-width LZW with dictionary rebuild,
interlace NOT supported (the encoder never emits it; raises).

Exactness: GIF is lossless (palette-indexed), so decode(encode(x))
returns the exact index matrix — the ★ oracle recomputes per-frame
channel sums analytically from the same palette arithmetic
(extra_queries.q_gif_frames).
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_HDR = b"GIF89a"


# ----------------------------------------------------------------- LZW


def _lzw_encode(indices: np.ndarray, min_code_size: int = 8) -> bytes:
    """Real variable-width GIF-LZW over a flat uint8 index array."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits  # GIF packs LSB-first
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(-1, i): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = -1
    for b in indices.tolist():
        key = (prev, b)
        if key in table:
            prev = table[key]
            continue
        emit(prev, width)
        table[key] = next_code
        next_code += 1
        if next_code > (1 << width):
            if width < 12:
                width += 1
            else:
                emit(clear, width)
                table = {(-1, i): i for i in range(clear)}
                next_code = end + 1
                width = min_code_size + 1
        prev = b
    if prev != -1:
        emit(prev, width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int,
                expected: int | None = None) -> np.ndarray:
    """GIF-LZW bytes → flat uint8 index array.

    Vectorized decode: codes are extracted in BATCHES per constant
    code-width run (one numpy gather/shift/mask over the whole run
    instead of a Python bit-reader call per code), the string table is
    two parallel int lists of (start, length) spans into the output
    buffer (every LZW entry is ``prev + first(entry)``, which is
    exactly the contiguous bytes ``out[cur-len(prev) : cur+1]`` at the
    moment it is defined — the LZ77-style trick), and each emission is
    one overlap-free memoryview slice copy — no per-entry bytes
    allocation, no per-symbol Python.  ``expected`` (the frame's h·w,
    when known) preallocates the output."""
    clear = 1 << min_code_size
    end = clear + 1
    b = np.frombuffer(data + b"\x00\x00\x00",
                      dtype=np.uint8).astype(np.uint32)
    total_bits = len(data) * 8
    cap = (expected if expected else 1 << 16) + 4096 + 8
    out = bytearray(cap)
    mv = memoryview(out)
    # parallel-array table: entry c (c > end) = out[src[c]:src[c]+ln[c]]
    src = [0] * 4096
    ln = [0] * 4096
    pos = 0
    width = min_code_size + 1
    cur = 0
    next_code = end + 1
    prev_len = -1  # -1 → no previous entry (start / after CLEAR)
    arange = np.arange(4096, dtype=np.int64)
    while pos + width <= total_bits:
        # constant-width run: at most this many codes can be consumed
        # before the table reaches 2^width and the width bumps (the
        # first code after a CLEAR adds no entry, hence the +1)
        room = (1 << width) - next_code if width < 12 else 1 << 20
        if prev_len < 0:
            room += 1
        n = min(max(room, 1), (total_bits - pos) // width)
        bitpos = pos + width * arange[:n]
        byi = bitpos >> 3
        word = b[byi] | (b[byi + 1] << 8) | (b[byi + 2] << 16)
        codes = ((word >> (bitpos & 7).astype(np.uint32))
                 & ((1 << width) - 1)).tolist()
        stop = False
        for code in codes:
            pos += width
            if code == clear:
                next_code = end + 1
                width = min_code_size + 1
                prev_len = -1
                break  # re-extract at the reset width
            if code == end:
                stop = True
                break
            if prev_len < 0:
                if code >= next_code:
                    raise ValueError("corrupt LZW stream")
            elif code > next_code:
                raise ValueError("corrupt LZW stream")
            # new table entry = prev + first(entry) = the contiguous
            # output span [cur - prev_len, cur + 1)
            if code < clear:
                length = 1
                s = -1
            elif code == next_code:  # KwKwK: entry IS the new entry
                length = prev_len + 1
                s = cur - prev_len
            elif code > end:
                length = ln[code]
                s = src[code]
            else:
                raise ValueError("corrupt LZW stream")
            if cur + length > cap:
                del mv
                cap = max(cap * 2, cur + length + 4096)
                nb = bytearray(cap)
                nb[: len(out)] = out
                out = nb
                mv = memoryview(out)
            if prev_len >= 0 and next_code < 4096:
                src[next_code] = cur - prev_len
                ln[next_code] = prev_len + 1
                next_code += 1
            if s < 0:
                out[cur] = code
            elif length == 1:
                out[cur] = out[s]
            elif s + length > cur:  # KwKwK: last byte = first(prev),
                mv[cur:cur + length - 1] = mv[s:cur]  # not yet written
                out[cur + length - 1] = out[s]
            else:
                mv[cur:cur + length] = mv[s:s + length]
            cur += length
            prev_len = length
            if next_code == (1 << width) and width < 12:
                width += 1
                break  # re-extract at the new width
        if stop:
            break
    del mv
    return np.frombuffer(bytes(out[:cur]), dtype=np.uint8)


# ------------------------------------------------------------- encode


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: np.ndarray, palette: np.ndarray, delay_cs: int = 4
) -> bytes:
    """(F, H, W) uint8 palette indices + (256, 3) uint8 palette →
    GIF89a bytes (animated when F > 1, with Netscape loop ext)."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim == 2:
        f = f[None]
    nf, h, w = f.shape
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[: len(palette)] = np.asarray(palette, dtype=np.uint8)
    out = bytearray()
    out += _GIF_HDR
    # logical screen descriptor: GCT present, 8-bit color, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += pal.tobytes()
    if nf > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0" + _sub_blocks(b"\x01\x00\x00")[:-1] \
            + b"\x00"
    for i in range(nf):
        if nf > 1:
            out += b"\x21\xf9" + bytes([4, 0]) \
                + struct.pack("<H", delay_cs) + bytes([0, 0])
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(8)  # LZW min code size
        out += _sub_blocks(_lzw_encode(f[i].ravel(), 8))
    out += b"\x3b"
    return bytes(out)


# ------------------------------------------------------------- decode


def decode_gif(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """GIF bytes → ((F, H, W) uint8 index frames, (256, 3) palette).

    Full-frame, non-interlaced, global-color-table GIFs (what the
    encoder emits and what synthetic/animation tools commonly write).
    Extensions are walked per the spec grammar and skipped."""
    if payload[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF payload")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    pal = np.zeros((256, 3), dtype=np.uint8)
    if flags & 0x80:
        n = 2 << (flags & 7)
        pal[:n] = np.frombuffer(
            payload[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    frames = []
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", payload,
                                                       pos + 1)
        pos += 10
        if iflags & 0x40:
            raise ValueError("interlaced GIF unsupported")
        if iflags & 0x80:
            # a per-frame local color table would silently repaint
            # every frame through one shared palette in callers that
            # apply the single returned palette — refuse, like the
            # interlace / partial-frame guards
            raise ValueError("local color table unsupported")
        if (left, top, fw, fh) != (0, 0, w, h):
            raise ValueError("partial-frame GIF unsupported")
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(data), mcs)
        if len(idx) < h * w:
            raise ValueError("truncated LZW frame")
        frames.append(idx[: h * w].reshape(h, w))
    if not frames:
        raise ValueError("no image data in GIF")
    return np.stack(frames), pal


# ------------------------------------------------- actor-pool stage

import pyarrow as pa
import ray.data


class GifFrameFeatures:
    """Actor-pool decode over REAL animated-gif payloads: one output
    row PER FRAME (video-shaped explode) with exact per-channel pixel
    sums through the palette."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, nf = [], [], []
        sums = {c: [] for c in "rgb"}
        id_col = batch.column_names[0]
        for mid, p in zip(batch[id_col], batch["payload"]):
            frames, pal = decode_gif(p.as_py())
            pal64 = pal.astype(np.int64)
            for i, fr in enumerate(frames):
                counts = np.bincount(fr.ravel(), minlength=256)
                rgb = counts @ pal64  # (3,) exact channel sums
                ids.append(mid.as_py())
                fidx.append(i)
                nf.append(len(frames))
                for j, c in enumerate("rgb"):
                    sums[c].append(int(rgb[j]))
        out = pa.table({
            id_col: pa.array(ids, batch[id_col].type),
            "frame_idx": pa.array(fidx, pa.int64()),
            "n_frames": pa.array(nf, pa.int64()),
        })
        for c in "rgb":
            out = out.append_column(f"sum_{c}", pa.array(sums[c], pa.int64()))
        return out


def gif_frame_features(
    ds: ray.data.Dataset, batch_size: int = 32, concurrency=(1, 8)
) -> ray.data.Dataset:
    """payload:binary (gif) → one row per decoded frame with exact
    channel sums (video-shaped flat-map through an actor pool)."""
    return ds.map_batches(
        GifFrameFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
