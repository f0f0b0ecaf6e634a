"""Baseline JPEG (ITU-T T.81 / JFIF) codec — pure Python + numpy.

Round-6 de-stub of the last fake image path: `multimodal.decode_image`
dispatches ``FF D8`` blobs here, so the Arrow-batched image stage decodes
real baseline JPEGs end-to-end with no external codec library (the
container only ships pyspark/numpy/pyarrow — PIL/cv2 are unavailable).

Scope — the baseline sequential DCT process the spec makes mandatory:

- decoder: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS/EOI marker walk, huffman
  entropy decode with 0xFF00 byte-unstuffing and FFD0-D7 restart markers,
  dequantize, zigzag, 8x8 IDCT (numpy separable transform), generic
  chroma sampling factors (4:4:4 / 4:2:0 / 4:2:2 / grayscale all fall out
  of the (h, v) per-component loop), replicated upsample, JFIF BT.601
  YCbCr -> RGB. Progressive (SOF2), arithmetic coding (SOF9+), 12-bit
  precision, and >4 components raise NotImplementedError; malformed or
  truncated streams raise ValueError.
- encoder: 8-bit RGB -> YCbCr, 4:4:4 or 4:2:0 (2x2 box-filtered chroma),
  Annex K.1 quantization tables with IJG quality scaling, FDCT, Annex K.3
  huffman tables, optional restart intervals. Emits a JFIF file the
  decoder (and the `probe_media` SOF walk) reads back.

Reference parity: the reference's media ingest hands image bytes to its
bundled native codecs (analysis-side `ImageDecode` stage); here the same
capability is a plain Python function usable inside `mapInPandas`
batches, and the per-pixel work stays vectorized in numpy.

JPEG is lossy: the contract-facing features built on decode stay on the
lossless formats (BMP/PNG) for bit-exact oracles; the JPEG path is
bounded by PSNR/roundtrip tests instead (tests/test_extensions.py).
"""

from __future__ import annotations

import struct
from typing import Sequence

import numpy as np

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K — public spec)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# (bits[1..16], huffval) per Annex K.3
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])

# separable DCT-II basis: FDCT F = C @ f @ C.T, IDCT f = C.T @ F @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (np.sqrt(0.125) if _u == 0 else 0.5) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16.0)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (public libjpeg rule)."""
    q = min(100, max(1, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


def _canonical_codes(bits: Sequence[int], huffval: Sequence[int]):
    """(code, length) per symbol in spec order (T.81 §C.2 Generate_size/
    code tables)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# ---------------------------------------------------------------------------
# Encoder

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing (T.81 §B.1.1.5)
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def pad_align(self) -> None:
        if self._n:
            self.write(0x7F, 8 - self._n)  # 1-fill to byte boundary


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(w: _BitWriter, block: np.ndarray, qt: np.ndarray,
                  dc_codes, ac_codes, pred: int) -> int:
    """``qt`` is in natural (raster) order; zigzag happens after
    quantization, mirroring the decoder's zigzag-side dequantize."""
    coef = _C @ (block - 128.0) @ _C.T
    q = np.round(coef.flatten() / qt).astype(np.int32)
    zz = q[ZIGZAG]
    dc = int(zz[0])
    size, bits = _magnitude(dc - pred)
    c, ln = dc_codes[size]
    w.write(c, ln)
    if size:
        w.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]   # ZRL
            w.write(c, ln)
            run -= 16
        size, bits = _magnitude(v)
        c, ln = ac_codes[(run << 4) | size]
        w.write(c, ln)
        w.write(bits, size)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]       # EOB
        w.write(c, ln)
    return dc


def encode_jpeg(width: int, height: int, pixels: Sequence[tuple[int, int, int]],
                quality: int = 85, subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Baseline JFIF encoder. ``pixels`` is row-major top-down RGB
    (decode_image's shape). ``subsampling``: '444' (Y/Cb/Cr all 1x1),
    '420' (Y 2x2, box-filtered chroma), or 'gray' (single-component
    luma-only frame). ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs (exercises the decoder's restart path; what a
    real encoder emits for error resilience)."""
    if subsampling not in ("444", "420", "gray"):
        raise ValueError(
            f"subsampling must be '444', '420' or 'gray', got {subsampling}")
    rgb = np.asarray(pixels, dtype=np.float64).reshape(height, width, 3)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qt_l, qt_c = _quality_tables(quality)

    if subsampling == "420":
        hv = [(2, 2), (1, 1), (1, 1)]
        # box-filter chroma over 2x2 (pad odd dims by edge replication)
        def _down(p):
            ph = p if p.shape[0] % 2 == 0 else np.pad(p, ((0, 1), (0, 0)), mode="edge")
            ph = ph if ph.shape[1] % 2 == 0 else np.pad(ph, ((0, 0), (0, 1)), mode="edge")
            return (ph[0::2, 0::2] + ph[0::2, 1::2] + ph[1::2, 0::2] + ph[1::2, 1::2]) / 4.0
        planes = [y, _down(cb), _down(cr)]
    elif subsampling == "gray":
        hv = [(1, 1)]
        planes = [y]
    else:
        hv = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(h for h, _ in hv)
    vmax = max(v for _, v in hv)
    padded, nby, nbx = [], [], []
    for p, (ch, cv) in zip(planes, hv):
        # pad each plane so every MCU's h x v block grid is complete
        h8, w8 = p.shape
        need_h = -(-height * cv // vmax // 8) * 8
        need_w = -(-width * ch // hmax // 8) * 8
        # MCU coverage may exceed ceil(dim/8)*8 when dims aren't MCU-aligned
        mcu_rows = -(-height // (8 * vmax))
        mcu_cols = -(-width // (8 * hmax))
        need_h = max(need_h, mcu_rows * cv * 8)
        need_w = max(need_w, mcu_cols * ch * 8)
        pp = np.pad(p, ((0, need_h - h8), (0, need_w - w8)), mode="edge")
        padded.append(pp)
    mcu_rows = -(-height // (8 * vmax))
    mcu_cols = -(-width // (8 * hmax))

    dc_l = _canonical_codes(*DC_LUMA)
    ac_l = _canonical_codes(*AC_LUMA)
    dc_c = _canonical_codes(*DC_CHROMA)
    ac_c = _canonical_codes(*AC_CHROMA)
    comp_codes = [(dc_l, ac_l, qt_l), (dc_c, ac_c, qt_c), (dc_c, ac_c, qt_c)]

    w = _BitWriter()
    preds = [0, 0, 0]
    mcu_count = 0
    rst = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                w.pad_align()
                w.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            for ci, (p, (ch, cv)) in enumerate(zip(padded, hv)):
                dcc, acc, qt = comp_codes[ci]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = p[y0:y0 + 8, x0:x0 + 8]
                        preds[ci] = _encode_block(w, block, qt, dcc, acc, preds[ci])
            mcu_count += 1
    w.pad_align()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(int(v) for v in tbl[ZIGZAG]))

    def dht(cls: int, tid: int, bits, vals) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    nc = len(hv)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([nc])
    for cid, (ch, cv) in zip(range(1, nc + 1), hv):
        sof += bytes([cid, (ch << 4) | cv, 0 if cid == 1 else 1])
    sos = bytes([nc])
    for cid in range(1, nc + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    out += dqt(0, qt_l) + dqt(1, qt_c)
    out += seg(0xC0, sof)
    out += dht(0, 0, *DC_LUMA) + dht(1, 0, *AC_LUMA)
    out += dht(0, 1, *DC_CHROMA) + dht(1, 1, *AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, sos)
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder

class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing;
    stops at any real marker (restart handling is the caller's job)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy data truncated")
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt - 0xD0)
            else:
                # EOI or another marker: pad with 1s (spec allows the
                # final EOB to rely on padding)
                self._acc = (self._acc << 8) | 0xFF
                self._n += 8
                return
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | byte
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self, expect: int) -> None:
        """Byte-align and consume the RSTn marker (after _RestartMarker)."""
        self._acc = 0
        self._n = 0
        d = self.data
        while self.pos + 1 < len(d) and not (d[self.pos] == 0xFF
                                             and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        if self.pos + 1 >= len(d):
            raise ValueError("expected restart marker, hit end of data")
        got = d[self.pos + 1] - 0xD0
        if got != expect:
            raise ValueError(f"restart marker out of sequence: RST{got} != RST{expect}")
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, n: int) -> None:
        self.n = n


class _HuffTable:
    """Canonical-code decoder: walk bit-by-bit, match against the
    per-length first-code/offset arrays (T.81 §F.2.2.3 DECODE)."""

    def __init__(self, bits: Sequence[int], huffval: Sequence[int]) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.huffval = list(huffval)
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, r: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | r.bit()
            if code <= self.maxcode[length]:
                return self.huffval[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("invalid huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if v < (1 << (size - 1)) else v


def _decode_block(r: _BitReader, dc_tbl: _HuffTable, ac_tbl: _HuffTable,
                  qzz: np.ndarray, pred: int) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int32)
    size = dc_tbl.decode(r)
    diff = _extend(r.bits(size), size) if size else 0
    dc = pred + diff
    zz[0] = dc
    i = 1
    while i < 64:
        rs = ac_tbl.decode(r)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:       # ZRL
                i += 16
                continue
            break               # EOB
        i += run
        if i > 63:
            raise ValueError("AC run past end of block")
        zz[i] = _extend(r.bits(size), size)
        i += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[ZIGZAG] = zz * qzz
    block = _C.T @ coef.reshape(8, 8) @ _C
    return block + 128.0, dc


def decode_jpeg(blob: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Decode a baseline JPEG to (width, height, row-major top-down
    [(r, g, b), ...]) — the decode_image contract. Grayscale expands to
    RGB. See module docstring for scope and raised types."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    restart_interval = 0
    frame = None
    n = len(blob)
    while pos < n:
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = blob[pos + 1] if pos + 1 < n else None
        if marker is None:
            raise ValueError("truncated JPEG")
        pos += 2
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("JPEG has no scan data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment header")
        seglen = struct.unpack(">H", blob[pos:pos + 2])[0]
        payload = blob[pos + 2:pos + seglen]
        if len(payload) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                prec, tid = payload[p] >> 4, payload[p] & 0xF
                p += 1
                if prec == 0:
                    tbl = np.frombuffer(payload[p:p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(payload[p:p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                if tbl.size != 64:
                    raise ValueError("truncated DQT table")
                inv = np.empty(64, dtype=np.int32)
                inv[:] = tbl  # stored in zigzag order; keep zigzag-side
                qtables[tid] = inv
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1:p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17:p + 17 + nv])
                if len(vals) != nv:
                    raise ValueError("truncated DHT table")
                htables[(cls, tid)] = _HuffTable(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext sequential
            precision = payload[0]
            if precision != 8:
                raise NotImplementedError(f"JPEG precision {precision} (only 8-bit)")
            h, w = struct.unpack(">HH", payload[1:5])
            nc = payload[5]
            if nc not in (1, 3):
                raise NotImplementedError(f"JPEG with {nc} components")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential DCT "
                "(SOF0/SOF1) is supported")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan = {}
            for i in range(ns):
                cs, tables = payload[1 + 2 * i], payload[2 + 2 * i]
                scan[cs] = (tables >> 4, tables & 0xF)
            return _decode_scan(blob, pos + seglen, frame, scan, qtables,
                                htables, restart_interval)
        pos += seglen
    raise ValueError("JPEG ended without SOS")


def _decode_scan(blob, pos, frame, scan, qtables, htables, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if w == 0 or h == 0:
        raise ValueError(f"invalid JPEG dimensions {w}x{h}")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("invalid sampling factors")
    mcu_cols = -(-w // (8 * hmax))
    mcu_rows = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcu_rows * c["v"] * 8, mcu_cols * c["h"] * 8)))
        if c["tq"] not in qtables:
            raise ValueError(f"missing quant table {c['tq']}")
        td, ta = scan.get(c["id"], (None, None))
        if td is None:
            raise ValueError(f"component {c['id']} missing from scan")
        if (0, td) not in htables or (1, ta) not in htables:
            raise ValueError("missing huffman table referenced by scan")
        c["dc"] = htables[(0, td)]
        c["ac"] = htables[(1, ta)]
        c["qzz"] = qtables[c["tq"]]

    r = _BitReader(blob, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    rst = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                try:
                    r.align_restart(rst)
                except ValueError:
                    raise
                rst = (rst + 1) % 8
                preds = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            block, preds[ci] = _decode_block(
                                r, c["dc"], c["ac"], c["qzz"], preds[ci])
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            except _RestartMarker as m:
                raise ValueError(
                    f"unexpected restart marker RST{m.n} mid-MCU") from None
            mcu_count += 1

    # upsample to full resolution (replication — JFIF's simple path)
    full = []
    for c, p in zip(comps, planes):
        fy, fx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            # non-integer ratios are legal but exotic; replicate via repeat
            # on the integer part is wrong, so reject clearly
            raise NotImplementedError("non-integer chroma sampling ratio")
        up = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        full.append(up[:h, :w])

    if len(comps) == 1:
        yp = np.clip(full[0], 0, 255)
        rgbv = np.stack([yp, yp, yp], axis=-1)
    else:
        y, cb, cr = full
        rv = y + 1.402 * (cr - 128.0)
        gv = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bv = y + 1.772 * (cb - 128.0)
        rgbv = np.clip(np.stack([rv, gv, bv], axis=-1), 0, 255)
    arr = np.round(rgbv).astype(np.uint8)
    px = [tuple(int(v) for v in row) for row in arr.reshape(-1, 3)]
    return w, h, px
