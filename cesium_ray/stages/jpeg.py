"""Baseline JPEG codec — pure numpy + struct, public ITU-T T.81 spec.

This retires the biggest ``MediaDecodeStub`` gap (multimodal.py): JPEG
is a transform codec, but baseline sequential DCT needs nothing beyond
an FDCT/IDCT (8×8 matrix products), quantization, zigzag RLE and
Huffman coding — all implementable from the public standard with the
stdlib + numpy, exactly like the PNG codec next door.

Encoder: 8-bit grayscale or RGB (JFIF YCbCr, 4:4:4 — no chroma
subsampling), Annex-K quantization tables scaled by the IJG quality
formula, and OPTIMIZED per-image Huffman tables (two-pass: symbol
frequencies → length-limited canonical code per Annex K.2's BITS
adjustment, emitted in DHT).  Optimized tables are what real encoders
emit with `-optimize`; they also mean the decoder must genuinely parse
DHT rather than assume the fixed Annex-K defaults.

Decoder: full marker walk (APPn/COM skipped, DQT/DHT/SOF0/SOS parsed),
16-bit-peek LUT Huffman decode over the unstuffed entropy stream,
dequantize + vectorized IDCT, YCbCr→RGB.  Restart markers and
progressive/arithmetic modes raise (the encoder never emits them).

Exactness contract used by the ★ oracle (see
extra_queries.q_jpeg_roundtrip): at quality=100 every quant step is 1;
for an image whose 8×8 blocks are each constant, all AC coefficients
quantize to exactly 0 and the only loss is DC rounding (≤1/16 per
sample) plus YCbCr rounding (<0.2 per channel, under the 0.5 rounding
margin) — so decode(encode(img)) == img BYTE-EXACTLY.  The pytest
asserts that, plus a PSNR bound on non-blocky content.

At 100-TB scale the decode stage runs as the same actor-pool
``map_batches`` shape as PngFeatures/WavFeatures; a real deployment
swaps this kernel for libjpeg-turbo per actor without touching the
pipeline.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- DCT

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * 0.5
_C[0, :] *= 1 / np.sqrt(2)


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """(N, 8, 8) spatial → (N, 8, 8) DCT-II coefficients."""
    return np.einsum("ki,nij,lj->nkl", _C, blocks, _C, optimize=True)


def _idct(coef: np.ndarray) -> np.ndarray:
    """(N, 8, 8) coefficients → (N, 8, 8) spatial."""
    return np.einsum("ki,nkl,lj->nij", _C, coef, _C, optimize=True)


# ---------------------------------------------------- quant + zigzag

# Annex K.1 example quantization tables (public spec)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)


def _scaled_qt(tab: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: q=50 → table as-is, q=100 → all ones."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((tab * scale + 50) // 100, 1, 255).astype(np.int64)


# zigzag: _ZIG[i] = raster index of the i-th zigzag position
_ZIG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
_UNZIG = np.argsort(_ZIG)

# ------------------------------------------------------------- color


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# ------------------------------------------------- Huffman (encode)


def _huff_lengths(freq: np.ndarray) -> np.ndarray:
    """Symbol frequencies → JPEG-legal code lengths (≤16 bits).

    Annex K.2 procedure: build the Huffman tree with a reserved
    extra symbol (guarantees no real code is all-ones), then fold
    any >16-bit lengths down by the classic BITS adjustment."""
    n = len(freq)
    f = freq.astype(np.int64).copy()
    others = np.full(n + 1, -1, dtype=np.int64)
    codesize = np.zeros(n + 1, dtype=np.int64)
    f = np.append(f, 1)  # reserved symbol: lowest nonzero freq
    while True:
        nz = np.flatnonzero(f > 0)
        if len(nz) < 2:
            if len(nz) == 1 and codesize[nz[0]] == 0:
                codesize[nz[0]] = 1
            break
        two = nz[np.argsort(f[nz], kind="stable")[:2]]
        v1, v2 = int(min(two)), int(max(two))
        f[v1] += f[v2]
        f[v2] = 0
        while True:
            codesize[v1] += 1
            if others[v1] == -1:
                break
            v1 = int(others[v1])
        others[v1] = v2
        while True:
            codesize[v2] += 1
            if others[v2] == -1:
                break
            v2 = int(others[v2])
    bits = np.zeros(33, dtype=np.int64)
    for size in codesize[codesize > 0]:
        bits[min(int(size), 32)] += 1
    # fold lengths > 16 down (Annex K.2 Adjust_BITS)
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    # drop the reserved symbol from the longest used length
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1
    lengths = np.zeros(n, dtype=np.int64)
    order = np.argsort(codesize[:n], kind="stable")
    used = order[codesize[:n][order] > 0]
    # canonical: shortest lengths to most frequent symbols — assign by
    # walking BITS over symbols sorted by their tree codesize
    srt = used[np.argsort(codesize[:n][used], kind="stable")]
    pos = 0
    for ln in range(1, 17):
        for _ in range(int(bits[ln])):
            lengths[srt[pos]] = ln
            pos += 1
    return lengths


def _huff_table(lengths: np.ndarray):
    """Code lengths → (BITS[1..16], HUFFVAL order, code/size arrays
    indexed by symbol).  Canonical JPEG code assignment (Annex C)."""
    bits = np.zeros(17, dtype=np.int64)
    for ln in lengths[lengths > 0]:
        bits[int(ln)] += 1
    huffval = []
    for ln in range(1, 17):
        for sym in np.flatnonzero(lengths == ln):
            huffval.append(int(sym))
    codes = np.zeros(len(lengths), dtype=np.int64)
    sizes = np.zeros(len(lengths), dtype=np.int64)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(int(bits[ln])):
            sym = huffval[k]
            codes[sym] = code
            sizes[sym] = ln
            code += 1
            k += 1
        code <<= 1
    return bits[1:], np.array(huffval, dtype=np.int64), codes, sizes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, size: int):
        if size == 0:
            return
        self.acc = (self.acc << size) | (value & ((1 << size) - 1))
        self.nbits += size
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _mag_cat(v: int) -> int:
    return int(abs(v)).bit_length()


# ------------------------------------------------------------ encode


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 → baseline JFIF bytes.

    H and W must be multiples of 8 (the oracle path uses aligned
    tiles; pad upstream if needed).  4:4:4, optimized Huffman."""
    a = np.asarray(img, dtype=np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if h % 8 or w % 8:
        raise ValueError("encode_jpeg needs 8-aligned dimensions")
    if gray:
        planes = [a.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(a)
        planes = [ycc[..., i] for i in range(3)]
    qts = [_scaled_qt(_QT_LUMA, quality)]
    if not gray:
        qts.append(_scaled_qt(_QT_CHROMA, quality))
    bh, bw = h // 8, w // 8
    nb = bh * bw
    # per component: zigzagged quantized coefficients (nb, 64)
    comp_z = []
    for ci, plane in enumerate(planes):
        qt = qts[min(ci, len(qts) - 1)]
        blocks = (plane - 128.0).reshape(bh, 8, bw, 8).transpose(
            0, 2, 1, 3).reshape(nb, 8, 8)
        coef = _fdct(blocks)
        qz = np.rint(coef.reshape(nb, 64) / qt).astype(np.int64)
        comp_z.append(qz[:, _ZIG])

    # ---- pass 1: symbol statistics (DC and AC, luma/chroma classes)
    ncls = 1 if gray else 2
    dc_freq = np.zeros((ncls, 12), dtype=np.int64)
    ac_freq = np.zeros((ncls, 256), dtype=np.int64)
    comp_syms = []  # per component: list per block of (dcsym, dcval, acs)
    for ci, qz in enumerate(comp_z):
        cls = min(ci, ncls - 1)
        prev_dc = 0
        syms = []
        for bi in range(nb):
            z = qz[bi]
            diff = int(z[0]) - prev_dc
            prev_dc = int(z[0])
            dcat = _mag_cat(diff)
            dc_freq[cls, dcat] += 1
            acs = []
            run = 0
            nzi = np.flatnonzero(z[1:]) + 1
            last = nzi[-1] if len(nzi) else 0
            for i in range(1, last + 1):
                v = int(z[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    acs.append((0xF0, 0, 0))
                    ac_freq[cls, 0xF0] += 1
                    run -= 16
                cat = _mag_cat(v)
                sym = (run << 4) | cat
                acs.append((sym, v, cat))
                ac_freq[cls, sym] += 1
                run = 0
            if last < 63:
                acs.append((0x00, 0, 0))  # EOB
                ac_freq[cls, 0x00] += 1
            syms.append((dcat, diff, acs))
        comp_syms.append(syms)

    # ---- build optimized tables
    dc_tabs, ac_tabs = [], []
    for cls in range(ncls):
        dl = _huff_lengths(dc_freq[cls])
        al = _huff_lengths(ac_freq[cls])
        dc_tabs.append(_huff_table(dl))
        ac_tabs.append(_huff_table(al))

    # ---- pass 2: emit
    def dht(tc: int, th: int, tab) -> bytes:
        bits, huffval, _, _ = tab
        body = bytes([(tc << 4) | th]) + bytes(
            int(x) for x in bits) + bytes(int(v) for v in huffval)
        return struct.pack(">HH", 0xFFC4, len(body) + 2) + body

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += struct.pack(">HH", 0xFFE0, 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)  # APP0
    for ti, qt in enumerate(qts):
        body = bytes([ti]) + bytes(int(v) for v in qt[_ZIG])
        out += struct.pack(">HH", 0xFFDB, len(body) + 2) + body
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        cls = min(ci, ncls - 1)
        sof += bytes([ci + 1, 0x11, cls])  # 4:4:4 sampling, qt id
    out += struct.pack(">HH", 0xFFC0, len(sof) + 2) + sof  # SOF0
    for cls in range(ncls):
        out += dht(0, cls, dc_tabs[cls])
        out += dht(1, cls, ac_tabs[cls])
    sos = bytes([ncomp])
    for ci in range(ncomp):
        cls = min(ci, ncls - 1)
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    out += struct.pack(">HH", 0xFFDA, len(sos) + 2) + sos

    bw_ = _BitWriter()
    for bi in range(nb):  # MCU = one block per component (4:4:4)
        for ci in range(ncomp):
            cls = min(ci, ncls - 1)
            _, _, dcodes, dsizes = dc_tabs[cls]
            _, _, acodes, asizes = ac_tabs[cls]
            dcat, diff, acs = comp_syms[ci][bi]
            bw_.write(int(dcodes[dcat]), int(dsizes[dcat]))
            if dcat:
                m = diff if diff > 0 else diff - 1
                bw_.write(m & ((1 << dcat) - 1), dcat)
            for sym, v, cat in acs:
                bw_.write(int(acodes[sym]), int(asizes[sym]))
                if cat:
                    m = v if v > 0 else v - 1
                    bw_.write(m & ((1 << cat) - 1), cat)
    bw_.flush()
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------ decode


def _build_lut(bits: np.ndarray, huffval: np.ndarray) -> np.ndarray:
    """DHT (BITS, HUFFVAL) → 2^16 LUT of (symbol << 8 | length),
    vectorized fill per code."""
    lut = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(int(bits[ln - 1])):
            sym = int(huffval[k])
            lo = code << (16 - ln)
            hi = (code + 1) << (16 - ln)
            lut[lo:hi] = (sym << 8) | ln
            code += 1
            k += 1
        code <<= 1
    return lut


class _BitReader:
    """MSB-first reader over the unstuffed entropy bytes; O(1) 16-bit
    peek via a 32-bit window."""

    def __init__(self, data: bytes):
        self.b = np.frombuffer(data + b"\x00\x00\x00\x00", dtype=np.uint8)
        self.pos = 0  # bit position

    def peek16(self) -> int:
        i = self.pos >> 3
        word = (int(self.b[i]) << 24) | (int(self.b[i + 1]) << 16) \
            | (int(self.b[i + 2]) << 8) | int(self.b[i + 3])
        return (word >> (16 - (self.pos & 7))) & 0xFFFF

    def take(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.peek16() >> (16 - n)
        self.pos += n
        return v


def _extend(mag: int, size: int) -> int:
    if size == 0:
        return 0
    return mag if mag >= (1 << (size - 1)) else mag - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (H, W) gray or (H, W, 3) RGB uint8.

    Supports what any baseline 4:4:4 / grayscale file contains:
    DQT/DHT/SOF0/SOS marker walk, optimized or standard Huffman
    tables, byte-stuffed entropy stream.  Raises ValueError on
    progressive (SOF2), arithmetic coding, subsampled chroma or
    restart intervals."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_lut: dict[int, np.ndarray] = {}
    ac_lut: dict[int, np.ndarray] = {}
    sof = None
    comps = None
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker sync lost")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before
        # a marker byte — skip them
        while pos + 2 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / RSTn are standalone markers with no length field
            pos += 2
            continue
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT (possibly several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                z = np.frombuffer(body[o + 1:o + 65], dtype=np.uint8)
                qt = np.zeros(64, dtype=np.int64)
                qt[_ZIG] = z
                qts[tq] = qt
                o += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 15
                bits = np.frombuffer(body[o + 1:o + 17], dtype=np.uint8)
                nv = int(bits.sum())
                huffval = np.frombuffer(
                    body[o + 17:o + 17 + nv], dtype=np.uint8)
                lut = _build_lut(bits, huffval)
                (dc_lut if tc == 0 else ac_lut)[th] = lut
                o += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci:9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError("only 4:4:4 / grayscale supported")
                comps.append((cid, tq))
            sof = (h, w, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS: entropy data follows
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si:3 + 2 * si]
                scan.append((cs, tt >> 4, tt & 15))
            break
        # APPn / COM / others: skipped via ln
    if sof is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    h, w, nc = sof
    if h % 8 or w % 8:
        raise ValueError("decoder requires 8-aligned dimensions")

    # unstuff entropy bytes up to EOI
    raw = payload[pos:]
    ent = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0xFF:
            nxt = raw[i + 1] if i + 1 < len(raw) else 0xD9
            if nxt == 0x00:
                ent.append(0xFF)
                i += 2
                continue
            if nxt == 0xD9:  # EOI
                break
            raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        ent.append(b)
        i += 1

    rd = _BitReader(bytes(ent))
    bh, bw = h // 8, w // 8
    nb = bh * bw
    coef = [np.zeros((nb, 64), dtype=np.int64) for _ in range(nc)]
    prev_dc = [0] * nc
    for bi in range(nb):
        for ci in range(nc):
            _, td, ta = scan[ci]
            dlut, alut = dc_lut[td], ac_lut[ta]
            e = int(dlut[rd.peek16()])
            sym, l = e >> 8, e & 0xFF
            if l == 0:
                raise ValueError("bad DC code")
            rd.pos += l
            diff = _extend(rd.take(sym), sym)
            prev_dc[ci] += diff
            z = coef[ci][bi]
            z[0] = prev_dc[ci]
            k = 1
            while k < 64:
                e = int(alut[rd.peek16()])
                sym, l = e >> 8, e & 0xFF
                if l == 0:
                    raise ValueError("bad AC code")
                rd.pos += l
                run, size = sym >> 4, sym & 15
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    raise ValueError("AC run past block end")
                z[k] = _extend(rd.take(size), size)
                k += 1

    planes = []
    for ci in range(nc):
        qt = qts[comps[ci][1]]
        dz = (coef[ci] * qt[_ZIG])[:, _UNZIG].reshape(nb, 8, 8)
        sp = _idct(dz.astype(np.float64)) + 128.0
        plane = sp.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)
        planes.append(plane)
    if nc == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))


# ------------------------------------------------- actor-pool stage

import pyarrow as pa
import ray.data


class JpegFeatures:
    """Actor-pool decode stage over REAL jpeg payloads: decodes each
    payload and emits exact integer-space features (width, height,
    per-channel pixel sums and raw float means — callers round) —
    every value reproducible by an oracle that knows the source
    pixels when the roundtrip is exact (blocky q=100 content)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"width": [], "height": [], "sum_r": [], "sum_g": [],
                "sum_b": [], "mean_r": [], "mean_g": [], "mean_b": []}
        for p in batch["payload"]:
            img = decode_jpeg(p.as_py())
            if img.ndim == 2:
                img = np.stack([img] * 3, axis=-1)
            hh, ww = img.shape[:2]
            s = img.reshape(-1, 3).astype(np.int64).sum(axis=0)
            n = hh * ww
            rows["width"].append(ww)
            rows["height"].append(hh)
            for j, ch in enumerate("rgb"):
                rows[f"sum_{ch}"].append(int(s[j]))
                rows[f"mean_{ch}"].append(float(s[j]) / n)
        out = batch.drop_columns(["payload"])
        for k, v in rows.items():
            t = pa.float64() if k.startswith("mean") else pa.int64()
            out = out.append_column(k, pa.array(v, t))
        return out


def jpeg_features(
    ds: ray.data.Dataset, batch_size: int = 64, concurrency=(1, 8)
) -> ray.data.Dataset:
    """payload:binary (baseline jpeg) → exact image features."""
    return ds.map_batches(
        JpegFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
