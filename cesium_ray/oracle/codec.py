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


def _dod_fields(dods: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (values u64, nbits) field arrays for a delta-of-delta
    array — bit-identical to per-value _write_dod.  Fields wider than
    64 bits (the rare 69-bit giant-jump bucket) are pre-split into a
    37-bit high + 32-bit low field so every array entry fits uint64
    (the packer requires it; the emitted bitstream is unchanged)."""
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
    ).astype(np.uint64)
    if not (nb == 69).any():
        return val, nb.astype(np.int64)
    reps = np.where(nb == 69, 2, 1)
    idx = np.repeat(np.arange(len(d)), reps)
    second = np.r_[False, idx[1:] == idx[:-1]]
    is69 = nb[idx] == 69
    with np.errstate(over="ignore"):
        u = d[idx].astype(np.uint64) + np.uint64(2**63 - 1)
    hi = (np.uint64(0b11111) << np.uint64(32)) | (u >> np.uint64(32))
    lo = u & np.uint64(0xFFFFFFFF)
    vals = np.where(second, lo, np.where(is69, hi, val[idx]))
    nbs = np.where(second, 32, np.where(is69, 37, nb[idx])).astype(np.int64)
    return vals, nbs


def _pack_fields(vals: np.ndarray, nbs: np.ndarray) -> bytes:
    """MSB-first bitstream packer, word-based: each ≤64-bit field
    spans at most two big-endian uint64 output words, so its value
    splits into a low part (shifted into the word holding the field's
    last bit) and, when it crosses a word boundary, a high part.  Both
    word-index sequences are non-decreasing (field offsets are), and
    fields never overlap bit ranges, so per-word accumulation is
    ``np.add.reduceat`` (sum ≡ OR with disjoint bits — no carries).
    Bit-identical to sequential BitWriter.write calls (the scalar
    reference), including the zero-padded final byte; O(fields) work
    instead of O(stream bits)."""
    nbs = nbs.astype(np.int64, copy=False)
    sh = nbs.astype(np.uint64)
    mask = np.full(len(nbs), np.uint64(0xFFFFFFFFFFFFFFFF))
    lt = nbs < 64
    mask[lt] = (np.uint64(1) << sh[lt]) - np.uint64(1)
    v = vals.astype(np.uint64, copy=False) & mask
    ends = np.cumsum(nbs)
    total = int(ends[-1])
    nwords = (total + 63) >> 6
    offs = ends - nbs
    w1 = (ends - 1) >> 6  # word holding the field's last bit
    w0 = offs >> 6        # word holding the field's first bit
    last = (ends - 1) & 63
    # low part: LSB lands at word bit 63-last (numpy << wraps mod 2^64,
    # discarding the bits that belong to the previous word)
    c1 = v << (np.uint64(63) - last.astype(np.uint64))
    words = np.zeros(nwords, dtype=np.uint64)
    starts = np.flatnonzero(np.r_[True, w1[1:] != w1[:-1]])
    words[w1[starts]] = np.add.reduceat(c1, starts)
    span = np.flatnonzero(w0 != w1)
    if len(span):
        # when a field crosses a boundary its last word holds
        # last+1 ∈ [1, 63] of its bits; the rest go one word up
        c0 = v[span] >> (last[span] + 1).astype(np.uint64)
        w0s = w0[span]
        s0 = np.flatnonzero(np.r_[True, w0s[1:] != w0s[:-1]])
        words[w0s[s0]] |= np.add.reduceat(c0, s0)
    return words.byteswap().tobytes()[: (total + 7) >> 3]


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
    segs = []  # list of (uint64 value array, int64 nbits array)
    # --- timestamps: delta-of-delta ---
    segs.append((np.array([int(ts[0]) & _MASK64], dtype=np.uint64),
                 np.array([64], dtype=np.int64)))
    if n > 1:
        deltas = ts[1:] - ts[:-1]
        dods = np.empty(n - 1, dtype=np.int64)
        dods[0] = deltas[0]
        dods[1:] = deltas[1:] - deltas[:-1]
        segs.append(_dod_fields(dods))
    # --- values: Gorilla XOR ---
    segs.append((np.array([int(vb[0])], dtype=np.uint64),
                 np.array([64], dtype=np.int64)))
    if n > 1:
        xors = vb[1:] ^ vb[:-1]
        nz = xors != 0
        nz_any = bool(nz.any())
        if nz_any:
            x = xors[nz]
            l_nz = np.minimum(64 - _bit_length_u64(x), 31)
            t = x & (~x + np.uint64(1))  # lowest set bit (power of two)
            t_nz = np.frexp(t.astype(np.float64))[1].astype(np.int64) - 1
            # control policy: reuse the window ('10') iff this xor's
            # (lz, tz) EQUAL the previous nonzero xor's — the decoder's
            # window state then matches exactly.  The Gorilla paper's
            # greedy containment rule (reuse when the window merely
            # covers the bits) is an encoder CHOICE, not a format
            # requirement: any mix of '10'/'11' records decodes
            # identically.  Equality vectorizes (no sequential chain);
            # quantized series repeat (lz, tz) patterns, so the
            # compression delta is ≤11 bits only on the rare covered-
            # but-unequal records.
            same = np.r_[False, (l_nz[1:] == l_nz[:-1]) & (t_nz[1:] == t_nz[:-1])]
            sig = 64 - l_nz - t_nz
            payload = x >> t_nz.astype(np.uint64)
            counts = np.ones(n - 1, dtype=np.int64)
            counts[nz] = np.where(same, 2, 4)
            off = np.r_[0, np.cumsum(counts)[:-1]]
            total = int(off[-1] + counts[-1])
            out_v = np.zeros(total, dtype=np.uint64)
            out_n = np.ones(total, dtype=np.int64)  # default: zero-xor '0' bit
            pos = off[nz]
            pr = pos[same]
            out_v[pr] = 0b10
            out_n[pr] = 2
            out_v[pr + 1] = payload[same]
            out_n[pr + 1] = sig[same]
            ps = pos[~same]
            out_v[ps] = 0b11
            out_n[ps] = 2
            out_v[ps + 1] = l_nz[~same].astype(np.uint64)
            out_n[ps + 1] = 5
            out_v[ps + 2] = (sig[~same] - 1).astype(np.uint64)
            out_n[ps + 2] = 6
            out_v[ps + 3] = payload[~same]
            out_n[ps + 3] = sig[~same]
            segs.append((out_v, out_n))
        else:
            segs.append((np.zeros(n - 1, dtype=np.uint64),
                         np.ones(n - 1, dtype=np.int64)))
    return _pack_fields(
        np.concatenate([s[0] for s in segs]),
        np.concatenate([s[1] for s in segs]),
    )


def _decode_chunk_scalar(payload: bytes, n: int):
    """Scalar reference decoder (kept as the bit-exact spec for
    tests/test_codec.py::test_fast_decode_matches_scalar; decode_chunk
    below is the production path)."""
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


def _extract_fields(buf: np.ndarray, pos: np.ndarray, nb: np.ndarray) -> np.ndarray:
    """Vectorized MSB-first bit-field gather: value of the ``nb[i]``-bit
    field at bit offset ``pos[i]`` (1 ≤ nb ≤ 64).  ``buf`` must be the
    payload bytes padded with ≥8 trailing zero bytes (misaligned 64-bit
    window reads run past the last field)."""
    byte0 = pos >> 3
    idx = byte0[:, None] + np.arange(8)
    b = buf[idx].astype(np.uint64)
    hi = np.zeros(len(pos), dtype=np.uint64)
    for k in range(8):
        hi |= b[:, k] << np.uint64(56 - 8 * k)
    shift = (pos & 7).astype(np.uint64)
    w = hi << shift  # uint64 wraps mod 2^64 (top `shift` bits discarded)
    b8 = buf[byte0 + 8].astype(np.uint64)
    w |= b8 >> (np.uint64(8) - shift)  # shift==0 → b8>>8 == 0
    return w >> (np.uint64(64) - nb.astype(np.uint64))


def decode_chunk(payload: bytes, n: int):
    """Inverse of encode_chunk → (ts_us int64[n], values float64[n]).

    Two passes: a light Python scan over an unpacked bit list records
    only (record index, payload offset, width, shift) — all multi-bit
    payloads are then gathered vectorized (_extract_fields) and the
    series reconstructed with cumsum / bitwise_xor.accumulate.
    Bit-identical to _decode_chunk_scalar (spec'd by the same Gorilla
    stream; tests cross-check on adversarial floats)."""
    ts = np.empty(n, dtype=np.int64)
    if n == 0:
        return ts, np.empty(0, dtype=np.float64)
    data = payload + b"\x00" * 12  # pad: window reads past the last field
    buf = np.frombuffer(data, dtype=np.uint8)
    t0 = int.from_bytes(payload[:8], "big")
    if t0 >= 1 << 63:
        t0 -= 1 << 64
    pos = 64
    tab = _TS_TAB
    zrun = _ZRUN
    # --- timestamps: delta-of-delta records ---
    if n > 1:
        ridx: list[int] = []
        rpos: list[int] = []
        rnb: list[int] = []
        bias: list[int] = []
        i = 0
        end = n - 1
        while i < end:
            bi = pos >> 3
            o = pos & 7
            z = zrun[data[bi]][o]
            if z:  # run of zero-DoD records: z consecutive 0 bits
                if z > end - i:
                    z = end - i
                i += z
                pos += z
                continue
            w24 = (data[bi] << 16) | (data[bi + 1] << 8) | data[bi + 2]
            plen, nb, bs = tab[(w24 >> (19 - o)) & 31]
            ridx.append(i)
            rpos.append(pos + plen)
            rnb.append(nb)
            bias.append(bs)
            pos += plen + nb
            i += 1
        dods = np.zeros(n - 1, dtype=np.uint64)
        if ridx:
            vals = _extract_fields(buf, np.asarray(rpos, dtype=np.int64),
                                   np.asarray(rnb, dtype=np.int64))
            # stored = d + bias (mod 2^64); wrap-subtract then reinterpret
            dods[np.asarray(ridx, dtype=np.int64)] = \
                vals - np.asarray(bias, dtype=np.uint64)
        deltas = np.cumsum(dods.view(np.int64))
        ts[0] = t0
        ts[1:] = t0 + np.cumsum(deltas)
    else:
        ts[0] = t0
    # --- values: Gorilla XOR records ---
    bi = pos >> 3
    v0 = (int.from_bytes(data[bi : bi + 9], "big")
          >> (8 - (pos & 7))) & _MASK64
    pos += 64
    vals_u = np.empty(n, dtype=np.uint64)
    vals_u[0] = v0
    if n > 1:
        xidx: list[int] = []
        xpos: list[int] = []
        xnb: list[int] = []
        xshift: list[int] = []
        sig = 0
        tz = 0
        i = 0
        end = n - 1
        while i < end:
            bi = pos >> 3
            o = pos & 7
            z = zrun[data[bi]][o]
            if z:  # run of zero-xor records: z consecutive 0 bits
                if z > end - i:
                    z = end - i
                i += z
                pos += z
                continue
            i += 1
            w24 = (data[bi] << 16) | (data[bi + 1] << 8) | data[bi + 2]
            c2 = (w24 >> (22 - o)) & 3
            if c2 == 2:  # '10': reuse current (lz, tz) window
                xidx.append(i)
                xpos.append(pos + 2)
                xnb.append(sig)
                xshift.append(tz)
                pos += 2 + sig
            else:  # '11': explicit 5-bit lz + 6-bit (sig-1)
                w = ((w24 << 8) | data[bi + 3]) >> (19 - o)  # 11 bits at pos+2
                lz = (w >> 6) & 31
                sig = (w & 63) + 1
                tz = 64 - lz - sig
                xidx.append(i)
                xpos.append(pos + 13)
                xnb.append(sig)
                xshift.append(tz)
                pos += 13 + sig
        xors = np.zeros(n, dtype=np.uint64)
        if xidx:
            xors[np.asarray(xidx, dtype=np.int64)] = _extract_fields(
                buf, np.asarray(xpos, dtype=np.int64),
                np.asarray(xnb, dtype=np.int64),
            ) << np.asarray(xshift, dtype=np.uint64)
        xors[0] = v0
        vals_u = np.bitwise_xor.accumulate(xors)
    return ts, vals_u.view(np.float64)


# ---------------------------------------------------------------------------
# v2 layout: columnar control.  Same record vocabulary as v1 (DoD
# buckets 7/9/12/32/64 bits, Gorilla zero/'reuse'/'new-window' XOR
# records) but control bits live in their own fixed-width sections, so
# DECODE is branch-free numpy — no sequential bit scan anywhere:
#
#   [t0: 8B BE] [v0: 8B BE]
#   A: ts nonzero bitmap      ceil((n-1)/8) B   bit i ⇔ dod_i != 0
#   B: ts bucket codes        3 bits × k_t      0..4 → 7/9/12/32/64
#   C: ts payloads            Σ width bits      stored = dod + bias
#   D: val nonzero bitmap     ceil((n-1)/8) B   bit i ⇔ xor_i != 0
#   E: val window codes       1 bit × k_v       1 ⇔ new (lz, sig) window
#   F: val window headers     11 bits × k_new   lz:5, sig-1:6
#   G: val payloads           Σ sig bits        xor >> tz
#
# Every section is byte-aligned; all lengths derive from n and the
# bitmaps/codes, so offsets resolve with popcounts + cumsums.  Stream
# size is within a few bits/record of v1 (same payload widths; control
# cost differs by ≤1 bit on nonzero DoD records).  Decode cost: three
# vectorized field gathers + two unpackbits + cumsums — measured ≥10×
# the v1 sequential reader.
# ---------------------------------------------------------------------------

_DOD_W = np.array([7, 9, 12, 32, 64], dtype=np.int64)
_DOD_BIAS = np.array([63, 255, 2047, 2**31 - 1, 2**63 - 1],
                     dtype=np.uint64)


def _pad(b: bytes) -> np.ndarray:
    return np.frombuffer(b + b"\x00" * 12, dtype=np.uint8)


def encode_chunk_v2(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Columnar-control Gorilla/DoD encoder (layout above); the
    production format — ``encode_chunk`` (v1, interleaved control)
    is kept as the paper-faithful reference."""
    ts = np.asarray(ts_us, dtype=np.int64)
    vb = np.ascontiguousarray(
        np.asarray(values, dtype=np.float64)).view(np.uint64)
    n = len(ts)
    if n == 0:
        return b""
    parts = [int(ts[0]).to_bytes(8, "big", signed=True),
             int(vb[0]).to_bytes(8, "big")]
    if n == 1:
        return b"".join(parts)
    # --- timestamps ---
    deltas = ts[1:] - ts[:-1]
    dods = np.empty(n - 1, dtype=np.int64)
    dods[0] = deltas[0]
    dods[1:] = deltas[1:] - deltas[:-1]
    nz_t = dods != 0
    parts.append(np.packbits(nz_t).tobytes())
    d = dods[nz_t]
    if len(d):
        code = np.select(
            [(d >= -63) & (d <= 64), (d >= -255) & (d <= 256),
             (d >= -2047) & (d <= 2048),
             (d >= -(2**31 - 1)) & (d <= 2**31)],
            [0, 1, 2, 3], default=4).astype(np.int64)
        parts.append(_pack_fields(code.astype(np.uint64),
                                  np.full(len(d), 3, np.int64)))
        with np.errstate(over="ignore"):
            stored = d.astype(np.uint64) + _DOD_BIAS[code]
        parts.append(_pack_fields(stored, _DOD_W[code]))
    # --- values ---
    xors = vb[1:] ^ vb[:-1]
    nz_v = xors != 0
    parts.append(np.packbits(nz_v).tobytes())
    x = xors[nz_v]
    if len(x):
        l_nz = np.minimum(64 - _bit_length_u64(x), 31)
        t = x & (~x + np.uint64(1))
        t_nz = np.frexp(t.astype(np.float64))[1].astype(np.int64) - 1
        # same window-reuse policy as v1: reuse iff (lz, tz) equal the
        # previous nonzero record's (vectorizes; format-neutral)
        new = np.r_[True, (l_nz[1:] != l_nz[:-1]) | (t_nz[1:] != t_nz[:-1])]
        sig = 64 - l_nz - t_nz
        parts.append(np.packbits(new).tobytes())
        hdr = (l_nz[new].astype(np.uint64) << np.uint64(6)) | \
            (sig[new] - 1).astype(np.uint64)
        parts.append(_pack_fields(hdr, np.full(int(new.sum()), 11,
                                               np.int64)))
        parts.append(_pack_fields(x >> t_nz.astype(np.uint64), sig))
    return b"".join(parts)


def decode_chunk_v2(payload: bytes, n: int):
    """Inverse of ``encode_chunk_v2`` → (ts_us int64[n], float64[n]).
    Branch-free: bitmap unpack + three vectorized field gathers +
    cumsum / xor.accumulate; no per-record scan."""
    ts = np.empty(n, dtype=np.int64)
    if n == 0:
        return ts, np.empty(0, dtype=np.float64)
    t0 = int.from_bytes(payload[:8], "big", signed=True)
    v0 = int.from_bytes(payload[8:16], "big")
    ts[0] = t0
    if n == 1:
        return ts, np.array([v0], dtype=np.uint64).view(np.float64)
    off = 16
    nbm = (n - 1 + 7) >> 3
    # --- timestamps ---
    bits_t = np.unpackbits(
        np.frombuffer(payload[off:off + nbm], np.uint8))[:n - 1] \
        .astype(bool)
    off += nbm
    dods = np.zeros(n - 1, dtype=np.uint64)
    k_t = int(bits_t.sum())
    if k_t:
        cb = (3 * k_t + 7) >> 3
        codes = _extract_fields(
            _pad(payload[off:off + cb]),
            3 * np.arange(k_t, dtype=np.int64),
            np.full(k_t, 3, np.int64)).astype(np.int64)
        off += cb
        w = _DOD_W[codes]
        ends = np.cumsum(w)
        pb = (int(ends[-1]) + 7) >> 3
        stored = _extract_fields(_pad(payload[off:off + pb]),
                                 ends - w, w)
        off += pb
        dods[bits_t] = stored - _DOD_BIAS[codes]
    deltas = np.cumsum(dods.view(np.int64))
    ts[1:] = t0 + np.cumsum(deltas)
    # --- values ---
    bits_v = np.unpackbits(
        np.frombuffer(payload[off:off + nbm], np.uint8))[:n - 1] \
        .astype(bool)
    off += nbm
    xors = np.zeros(n, dtype=np.uint64)
    xors[0] = v0
    k_v = int(bits_v.sum())
    if k_v:
        eb = (k_v + 7) >> 3
        new = np.unpackbits(
            np.frombuffer(payload[off:off + eb], np.uint8))[:k_v] \
            .astype(bool)
        off += eb
        k_new = int(new.sum())
        fb = (11 * k_new + 7) >> 3
        hdr = _extract_fields(_pad(payload[off:off + fb]),
                              11 * np.arange(k_new, dtype=np.int64),
                              np.full(k_new, 11, np.int64))
        off += fb
        lz = (hdr >> np.uint64(6)).astype(np.int64)
        sig_new = (hdr & np.uint64(63)).astype(np.int64) + 1
        tz_new = 64 - lz - sig_new
        wid = np.cumsum(new) - 1          # window id per nonzero record
        sig = sig_new[wid]
        tz = tz_new[wid]
        ends = np.cumsum(sig)
        gb = (int(ends[-1]) + 7) >> 3
        xv = _extract_fields(_pad(payload[off:off + gb]),
                             ends - sig, sig) << tz.astype(np.uint64)
        xors[1:][bits_v] = xv
    vals_u = np.bitwise_xor.accumulate(xors)
    return ts, vals_u.view(np.float64)


def _build_ts_tab():
    """5-bit-window → (prefix_len, payload_bits, bias) for DoD records.
    Window bit 4 == 0 → the 1-bit zero record (payload_bits 0)."""
    tab = []
    buckets = [(2, 7, 63), (3, 9, 255), (4, 12, 2047),
               (5, 32, 2**31 - 1), (5, 64, 2**63 - 1)]
    for w5 in range(32):
        if not (w5 >> 4):
            tab.append((1, 0, 0))
            continue
        depth = 0
        while depth < 4 and (w5 >> (3 - depth)) & 1:
            depth += 1
        tab.append(buckets[depth])
    return tuple(tab)


_TS_TAB = _build_ts_tab()

def _build_zrun():
    """(byte, bit offset) → length of the run of 0 bits starting at
    that offset (MSB-first), capped at the byte boundary."""
    out = []
    for b in range(256):
        row = []
        for o in range(8):
            z = 0
            while o + z < 8 and not (b >> (7 - o - z)) & 1:
                z += 1
            row.append(z)
        out.append(tuple(row))
    return tuple(out)


_ZRUN = _build_zrun()



def crc32(payload: bytes) -> int:
    return zlib.crc32(payload) & 0xFFFFFFFF
