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

    def write_many(self, fields):
        """Append an iterable of (value, nbits) fields via chunked
        big-int packing — bit-identical to repeated write() calls but
        ~5-10× faster (one bigint shift per field + one to_bytes per
        chunk instead of per-byte Python loops)."""
        CHUNK = 512
        fields = list(fields)
        for s in range(0, len(fields), CHUNK):
            big = 0
            nb_total = 0
            for v, nb in fields[s : s + CHUNK]:
                big = (big << nb) | (v & ((1 << nb) - 1))
                nb_total += nb
            # merge with carry bits, flush whole bytes
            combined = (self.acc << nb_total) | big
            total = self.nbits + nb_total
            rem = total & 7
            nbytes = total >> 3
            if nbytes:
                self.buf += (combined >> rem).to_bytes(nbytes, "big")
            self.acc = combined & ((1 << rem) - 1)
            self.nbits = rem


class BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, nbits: int) -> int:
        p = self.pos
        end = p + nbits
        b = self.data[p >> 3 : (end + 7) >> 3]
        val = int.from_bytes(b, "big") >> ((len(b) << 3) - (p & 7) - nbits)
        self.pos = end
        return val & ((1 << nbits) - 1)

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


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (x > 0).  float64 conversion
    can round UP to the next power of two, so the frexp exponent is
    clamped and corrected downward where 2^(e−1) > x."""
    e = np.frexp(x.astype(np.float64))[1].astype(np.int64)
    e = np.minimum(e, 64)
    over = x < (np.uint64(1) << np.maximum(e - 1, 0).astype(np.uint64))
    return e - over


def _dod_fields(dods: np.ndarray) -> list:
    """Vectorized (value, nbits) fields for a delta-of-delta array —
    bit-identical to per-value _write_dod."""
    d = dods.astype(np.int64)
    nb = np.select(
        [d == 0, (d >= -63) & (d <= 64), (d >= -255) & (d <= 256),
         (d >= -2047) & (d <= 2048),
         (d >= -(2**31 - 1)) & (d <= 2**31)],
        [1, 9, 12, 16, 37],
        default=69,
    )
    val = np.select(
        [d == 0, nb == 9, nb == 12, nb == 16, nb == 37],
        [np.zeros_like(d),
         (0b10 << 7) + d + 63,
         (0b110 << 9) + d + 255,
         (0b1110 << 12) + d + 2047,
         (0b11110 << 32) + d + (2**31 - 1)],
        default=0,
    )
    fields = list(zip(val.tolist(), nb.tolist()))
    if (nb == 69).any():  # rare giant jumps: 69-bit Python ints
        for i in np.flatnonzero(nb == 69):
            fields[i] = ((0b11111 << 64) | ((int(d[i]) + 2**63 - 1) & _MASK64), 69)
    return fields


def encode_chunk(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Encode one (conv, channel) chunk.  ``ts_us`` int64 (sorted),
    ``values`` float64 (NaN allowed — bit pattern preserved).

    Vectorized precompute (deltas, XORs, leading/trailing zero counts)
    + chunked big-int packing; output bit-identical to the scalar
    reference encoder (tests/test_codec.py::test_fast_matches_reference).
    """
    ts = np.asarray(ts_us, dtype=np.int64)
    vb = np.ascontiguousarray(np.asarray(values, dtype=np.float64)).view(np.uint64)
    n = len(ts)
    if n == 0:
        return b""
    w = BitWriter()
    # --- timestamps: delta-of-delta ---
    fields = [(int(ts[0]) & _MASK64, 64)]
    if n > 1:
        deltas = ts[1:] - ts[:-1]
        dods = np.empty(n - 1, dtype=np.int64)
        dods[0] = deltas[0]
        dods[1:] = deltas[1:] - deltas[:-1]
        fields += _dod_fields(dods)
    # --- values: Gorilla XOR ---
    fields.append((int(vb[0]), 64))
    if n > 1:
        xors = vb[1:] ^ vb[:-1]
        nz = xors != 0
        lz = np.zeros(n - 1, dtype=np.int64)
        tz = np.zeros(n - 1, dtype=np.int64)
        if nz.any():
            x = xors[nz]
            lz_nz = 64 - _bit_length_u64(x)
            t = x & (~x + np.uint64(1))  # lowest set bit (power of two)
            tz_nz = np.frexp(t.astype(np.float64))[1].astype(np.int64) - 1
            lz[nz] = np.minimum(lz_nz, 31)
            tz[nz] = tz_nz
        prev_lz, prev_tz = 65, 65
        ap = fields.append
        for x, l, t in zip(xors.tolist(), lz.tolist(), tz.tolist()):
            if x == 0:
                ap((0, 1))
                continue
            if prev_lz <= 64 and l >= prev_lz and t >= prev_tz:
                ap((0b10, 2))
                ap((x >> prev_tz, 64 - prev_lz - prev_tz))
            else:
                sig = 64 - l - t
                ap((0b11, 2))
                ap((l, 5))
                ap((sig - 1, 6))
                ap((x >> t, sig))
                prev_lz, prev_tz = l, t
    w.write_many(fields)
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
