"""Gorilla XOR float values + delta-of-delta timestamps codec (G3).

SURVEY.md §2.3 T4 / §2.9 G3; encoding follows the Facebook Gorilla
paper (Pelkonen et al., VLDB 2015), adapted for epoch-µs int64
timestamps (wider delta buckets than the paper's seconds) and float64
values.  Pure-Python bit packing; decode is bit-exact for every float64
payload including NaN, ±0.0, denormals, ±inf (FIXTURES.md F5 codec
fixture).

Layout of a chunk payload (bitstream, MSB-first):
  [ts0: 64] [delta0: dod-bucket] [dod_1 …] … then
  [v0 bits: 64] [gorilla xor stream …]
``n`` (the point count) lives in the chunk row, not the payload.
"""

from __future__ import annotations

import zlib

import numpy as np

_MASK64 = (1 << 64) - 1


class BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, nbits: int) -> int:
        out = 0
        p = self.pos
        data = self.data
        for _ in range(nbits):
            out = (out << 1) | ((data[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return out

    def read1(self) -> int:
        p = self.pos
        self.pos += 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1


# DoD buckets: (prefix_bits, prefix_value, payload_bits, bias)
_DOD_BUCKETS = [
    ("10", 7, 63),        # [-63, 64]
    ("110", 9, 255),      # [-255, 256]
    ("1110", 12, 2047),   # [-2047, 2048]
    ("11110", 32, 2**31 - 1),
    ("11111", 64, 2**63 - 1),
]


def _write_dod(w: BitWriter, d: int):
    if d == 0:
        w.write(0, 1)
        return
    for prefix, bits, bias in _DOD_BUCKETS:
        if -bias <= d <= bias + 1:
            w.write(int(prefix, 2), len(prefix))
            w.write(d + bias, bits)
            return
    raise OverflowError(f"delta-of-delta out of range: {d}")


def _read_dod(r: BitReader) -> int:
    """DoD reader: walks the unary bucket prefix."""
    if r.read1() == 0:
        return 0
    # prefixes after leading '1': 0 → b7, 10 → b9, 110 → b12, 1110 → b32, 1111 → b64
    depth = 0
    while depth < 4 and r.read1() == 1:
        depth += 1
    _, bits, bias = _DOD_BUCKETS[depth]
    return r.read(bits) - bias


def encode_chunk(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Encode one (conv, channel) chunk.  ``ts_us`` int64 (sorted),
    ``values`` float64 (NaN allowed — bit pattern preserved)."""
    ts = np.asarray(ts_us, dtype=np.int64)
    vb = np.asarray(values, dtype=np.float64).view(np.uint64)
    n = len(ts)
    w = BitWriter()
    if n == 0:
        return b""
    # --- timestamps: delta-of-delta ---
    w.write(int(ts[0]) & _MASK64, 64)
    prev_delta = 0
    prev = int(ts[0])
    for i in range(1, n):
        cur = int(ts[i])
        delta = cur - prev
        _write_dod(w, delta - prev_delta)
        prev_delta = delta
        prev = cur
    # --- values: Gorilla XOR ---
    w.write(int(vb[0]), 64)
    prev_bits = int(vb[0])
    prev_lz, prev_tz = 65, 65  # invalid window
    for i in range(1, n):
        cur = int(vb[i])
        xor = cur ^ prev_bits
        prev_bits = cur
        if xor == 0:
            w.write(0, 1)
            continue
        w.write(1, 1)
        lz = 64 - xor.bit_length()
        if lz > 31:
            lz = 31
        tz = (xor & -xor).bit_length() - 1
        if prev_lz <= 64 and lz >= prev_lz and tz >= prev_tz:
            w.write(0, 1)
            w.write(xor >> prev_tz, 64 - prev_lz - prev_tz)
        else:
            sig = 64 - lz - tz
            w.write(1, 1)
            w.write(lz, 5)
            w.write(sig - 1, 6)
            w.write(xor >> tz, sig)
            prev_lz, prev_tz = lz, tz
    return w.getvalue()


def decode_chunk(payload: bytes, n: int):
    """Inverse of encode_chunk → (ts_us int64[n], values float64[n])."""
    ts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.uint64)
    if n == 0:
        return ts, vals.view(np.float64)
    r = BitReader(payload)
    t0 = r.read(64)
    if t0 >= 1 << 63:
        t0 -= 1 << 64
    ts[0] = t0
    prev = t0
    prev_delta = 0
    for i in range(1, n):
        dod = _read_dod(r)
        prev_delta += dod
        prev += prev_delta
        ts[i] = prev
    v0 = r.read(64)
    vals[0] = v0
    prev_bits = v0
    prev_lz, prev_tz = 65, 65
    for i in range(1, n):
        if r.read1() == 0:
            vals[i] = prev_bits
            continue
        if r.read1() == 0:
            sig = 64 - prev_lz - prev_tz
            xor = r.read(sig) << prev_tz
        else:
            lz = r.read(5)
            sig = r.read(6) + 1
            tz = 64 - lz - sig
            xor = r.read(sig) << tz
            prev_lz, prev_tz = lz, tz
        prev_bits ^= xor
        vals[i] = prev_bits
    return ts, vals.view(np.float64)


def crc32(payload: bytes) -> int:
    return zlib.crc32(payload) & 0xFFFFFFFF
