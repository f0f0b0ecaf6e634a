"""JPEG (ITU-T T.81 / JFIF) codec — pure Python + numpy.

Round-6 de-stub of the last fake image path: `multimodal.decode_image`
dispatches ``FF D8`` blobs here, so the Arrow-batched image stage decodes
real JPEGs end-to-end with no external codec library (the container only
ships pyspark/numpy/pyarrow — PIL/cv2 are unavailable).

Scope — baseline sequential DCT plus (round-7) the progressive DCT
process real-world encoders default to:

- decoder: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOF2/SOS/EOI marker walk,
  huffman entropy decode with 0xFF00 byte-unstuffing and FFD0-D7 restart
  markers, dequantize, zigzag, 8x8 IDCT (numpy separable transform),
  generic chroma sampling factors (4:4:4 / 4:2:0 / 4:2:2 / grayscale all
  fall out of the (h, v) per-component loop), replicated upsample, JFIF
  BT.601 YCbCr -> RGB. Progressive (SOF2) streams accumulate per-scan
  spectral-selection / successive-approximation slices (T.81 Annex G.1:
  DC first/refine, AC first with EOB runs, AC refinement correction
  bits) into coefficient arrays inverse-transformed at EOI. Arithmetic
  coding (SOF9+), 12-bit precision, and >4 components raise
  NotImplementedError; malformed or truncated streams raise ValueError.
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
                restart_interval: int = 0, progressive: bool = False) -> bytes:
    """Baseline JFIF encoder. ``pixels`` is row-major top-down RGB
    (decode_image's shape). ``subsampling``: '444' (Y/Cb/Cr all 1x1),
    '420' (Y 2x2, box-filtered chroma), or 'gray' (single-component
    luma-only frame). ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs (exercises the decoder's restart path; what a
    real encoder emits for error resilience).

    ``progressive=True`` emits a SOF2 stream with a libjpeg-style scan
    script (interleaved DC first pass at Al=1, spectral-selection AC
    first passes, then DC + AC successive-approximation refinements), so
    every progressive decode path has an in-repo fixture source. EOB
    runs are capped at 1 (plain EOB0 per block) because the Annex K AC
    tables carry no EOBn>0 symbols — costs compression, never
    correctness; the decoder accepts full EOB runs from real files."""
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

    if progressive:
        return _encode_progressive(
            width, height, hv, padded, qt_l, qt_c, restart_interval,
            mcu_rows, mcu_cols, hmax, vmax,
        )

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


def _point_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shift toward zero (T.81 G.1.2.2 —
    unlike DC, which uses a plain arithmetic shift)."""
    return -((-v) >> al) if v < 0 else v >> al


def _encode_progressive(width, height, hv, padded, qt_l, qt_c,
                        restart_interval, mcu_rows, mcu_cols, hmax, vmax):
    """SOF2 entropy body + headers (see encode_jpeg docstring). Quantizes
    every block once into zigzag coefficient arrays, then serializes a
    libjpeg-style scan script over them."""
    nc = len(hv)
    qts = [qt_l] + [qt_c] * (nc - 1)
    # per-component zigzag coefficients over the PADDED block grid, plus
    # the unpadded block dims AC (non-interleaved) scans iterate
    zz_blocks, bdims = [], []
    for ci, (p, (ch, cv)) in enumerate(zip(padded, hv)):
        bh_pad, bw_pad = p.shape[0] // 8, p.shape[1] // 8
        zz = np.zeros((bh_pad, bw_pad, 64), dtype=np.int32)
        for by in range(bh_pad):
            for bx in range(bw_pad):
                coef = _C @ (p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0) @ _C.T
                zz[by, bx] = np.round(coef.flatten() / qts[ci]).astype(np.int32)[ZIGZAG]
        zz_blocks.append(zz)
        cw = -(-width * ch // hmax)
        chh = -(-height * cv // vmax)
        bdims.append((-(-chh // 8), -(-cw // 8)))

    dc_codes = [_canonical_codes(*DC_LUMA)] + [_canonical_codes(*DC_CHROMA)] * (nc - 1)
    ac_codes = [_canonical_codes(*AC_LUMA)] + [_canonical_codes(*AC_CHROMA)] * (nc - 1)

    if nc == 1:
        script = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 63, 0, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    else:
        script = [
            (list(range(nc)), 0, 0, 0, 1),  # DC first, interleaved
            ([0], 1, 5, 0, 2),              # Y low band
            ([1], 1, 63, 0, 1),
            ([2], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),             # Y high band
            (list(range(nc)), 0, 0, 1, 0),  # DC refine
            ([0], 1, 63, 2, 1),             # Y AC refine 2 -> 1
            ([1], 1, 63, 1, 0),
            ([2], 1, 63, 1, 0),
            ([0], 1, 63, 1, 0),             # Y AC refine 1 -> 0
        ]

    def _rst(w, count, unit, state):
        if restart_interval and count and count % (restart_interval * unit) == 0:
            w.pad_align()
            w.out += bytes([0xFF, 0xD0 + state["rst"]])
            state["rst"] = (state["rst"] + 1) % 8
            return True
        return False

    body = bytearray()
    for cis, ss, se, ah, al in script:
        w = _BitWriter()
        state = {"rst": 0}
        if ss == 0 and ah == 0:  # DC first
            interleaved = len(cis) > 1
            preds = {ci: 0 for ci in cis}
            blocks = []
            if interleaved:
                for my in range(mcu_rows):
                    for mx in range(mcu_cols):
                        for ci in cis:
                            ch, cv = hv[ci]
                            for by in range(cv):
                                for bx in range(ch):
                                    blocks.append((ci, my * cv + by, mx * ch + bx))
                unit = sum(hv[ci][0] * hv[ci][1] for ci in cis)
            else:
                ci = cis[0]
                bh, bw = bdims[ci]
                blocks = [(ci, by, bx) for by in range(bh) for bx in range(bw)]
                unit = 1
            for count, (ci, by, bx) in enumerate(blocks):
                if _rst(w, count, unit, state):
                    preds = {c: 0 for c in cis}
                dc = int(zz_blocks[ci][by, bx, 0]) >> al  # arithmetic shift
                size, bits = _magnitude(dc - preds[ci])
                preds[ci] = dc
                c, ln = dc_codes[ci][size]
                w.write(c, ln)
                if size:
                    w.write(bits, size)
        elif ss == 0:  # DC refine: one raw bit per block
            interleaved = len(cis) > 1
            blocks = []
            if interleaved:
                for my in range(mcu_rows):
                    for mx in range(mcu_cols):
                        for ci in cis:
                            ch, cv = hv[ci]
                            for by in range(cv):
                                for bx in range(ch):
                                    blocks.append((ci, my * cv + by, mx * ch + bx))
                unit = sum(hv[ci][0] * hv[ci][1] for ci in cis)
            else:
                ci = cis[0]
                bh, bw = bdims[ci]
                blocks = [(ci, by, bx) for by in range(bh) for bx in range(bw)]
                unit = 1
            for count, (ci, by, bx) in enumerate(blocks):
                _rst(w, count, unit, state)
                w.write((int(zz_blocks[ci][by, bx, 0]) >> al) & 1, 1)
        elif ah == 0:  # AC first
            ci = cis[0]
            acs = ac_codes[ci]
            bh, bw = bdims[ci]
            count = 0
            for by in range(bh):
                for bx in range(bw):
                    _rst(w, count, 1, state)
                    count += 1
                    band = [
                        _point_ac(int(zz_blocks[ci][by, bx, k]), al)
                        for k in range(ss, se + 1)
                    ]
                    nz = [i for i, v in enumerate(band) if v]
                    if not nz:
                        c, ln = acs[0x00]  # EOB0 (EOB runs capped at 1)
                        w.write(c, ln)
                        continue
                    run = 0
                    for i in range(nz[-1] + 1):
                        v = band[i]
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            c, ln = acs[0xF0]
                            w.write(c, ln)
                            run -= 16
                        size, bits = _magnitude(v)
                        c, ln = acs[(run << 4) | size]
                        w.write(c, ln)
                        w.write(bits, size)
                        run = 0
                    if nz[-1] < len(band) - 1:
                        c, ln = acs[0x00]
                        w.write(c, ln)
        else:  # AC refine (T.81 G.1.2.3, the jcphuff shape)
            ci = cis[0]
            acs = ac_codes[ci]
            bh, bw = bdims[ci]
            count = 0
            for by in range(bh):
                for bx in range(bw):
                    _rst(w, count, 1, state)
                    count += 1
                    zz = zz_blocks[ci][by, bx]
                    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
                    eob = -1  # index of last NEWLY-significant coef
                    for i, t in enumerate(absv):
                        if t == 1:
                            eob = i
                    r = 0
                    br: list[int] = []
                    for i, t in enumerate(absv):
                        if t == 0:
                            r += 1
                            continue
                        while r > 15 and i <= eob:
                            c, ln = acs[0xF0]
                            w.write(c, ln)
                            r -= 16
                            for b in br:
                                w.write(b, 1)
                            br = []
                        if t > 1:  # history-nonzero: buffered correction bit
                            br.append(t & 1)
                            continue
                        c, ln = acs[(r << 4) | 1]
                        w.write(c, ln)
                        w.write(1 if int(zz[ss + i]) >= 0 else 0, 1)
                        for b in br:
                            w.write(b, 1)
                        br = []
                        r = 0
                    if r > 0 or br:
                        c, ln = acs[0x00]  # EOB0 carrying trailing corrections
                        w.write(c, ln)
                        for b in br:
                            w.write(b, 1)
        w.pad_align()
        sos = bytes([len(cis)])
        for ci in cis:
            td = (ci if ci < 2 else 1) if ss == 0 else 0
            ta = (ci if ci < 2 else 1) if ss != 0 else 0
            sos += bytes([ci + 1, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        body += _seg(0xDA, sos) + w.out

    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([nc])
    for cid, (ch, cv) in zip(range(1, nc + 1), hv):
        sof += bytes([cid, (ch << 4) | cv, 0 if cid == 1 else 1])

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(v) for v in qt_l[ZIGZAG]))
    if nc > 1:
        out += _seg(0xDB, bytes([1]) + bytes(int(v) for v in qt_c[ZIGZAG]))
    out += _seg(0xC2, sof)
    out += _dht_seg(0, 0, *DC_LUMA) + _dht_seg(1, 0, *AC_LUMA)
    if nc > 1:
        out += _dht_seg(0, 1, *DC_CHROMA) + _dht_seg(1, 1, *AC_CHROMA)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += body
    out += b"\xff\xd9"
    return bytes(out)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dht_seg(cls: int, tid: int, bits, vals) -> bytes:
    return _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))


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
    prog = None
    n = len(blob)
    while pos < n:
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = blob[pos + 1] if pos + 1 < n else None
        if marker is None:
            raise ValueError("truncated JPEG")
        pos += 2
        if marker == 0xD9:  # EOI: ends a progressive stream, else premature
            if prog is not None and prog.scans_seen:
                return prog.reconstruct(qtables)
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
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
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
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
            if frame["progressive"]:
                prog = _ProgState(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline (SOF0/SOF1) and "
                "progressive (SOF2) DCT are supported")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan = {}
            order = []
            for i in range(ns):
                cs, tables = payload[1 + 2 * i], payload[2 + 2 * i]
                scan[cs] = (tables >> 4, tables & 0xF)
                order.append(cs)
            if not frame["progressive"]:
                return _decode_scan(blob, pos + seglen, frame, scan, qtables,
                                    htables, restart_interval)
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            pos = prog.decode_scan(
                blob, pos + seglen, order, scan, htables,
                restart_interval, ss, se, ahal >> 4, ahal & 0xF,
            )
            continue
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

    return _planes_to_rgb(comps, planes, w, h, hmax, vmax)


def _planes_to_rgb(comps, planes, w, h, hmax, vmax):
    """Replicated upsample to full resolution + JFIF BT.601 color convert
    — shared by the sequential and progressive reconstruction paths."""
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


# ---------------------------------------------------------------------------
# Progressive DCT (SOF2) — ITU-T T.81 Annex G.1/G.2 (round-7 de-stub)


class _ProgState:
    """Coefficient accumulator for a progressive (SOF2) stream.

    Each SOS scan deposits one (spectral band x approximation bit) slice
    into per-component zigzag-order coefficient arrays (T.81 G.1.1);
    `reconstruct` dequantizes and inverse-transforms once, after EOI.
    Scan kinds: DC first (Ah=0, Ss=0; interleaved allowed), DC refine
    (one raw bit/block), AC first (single-component band decode with EOB
    runs), AC refine (correction-bit algorithm of G.1.2.3). Restart
    markers reset DC predictors and the EOB run."""

    def __init__(self, frame):
        self.frame = frame
        comps = frame["comps"]
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        self.mcu_cols = -(-frame["w"] // (8 * self.hmax))
        self.mcu_rows = -(-frame["h"] // (8 * self.vmax))
        self.coefs: dict[int, np.ndarray] = {}
        self.bdims: dict[int, tuple[int, int]] = {}  # unpadded (bh, bw)
        for c in comps:
            bh_pad = self.mcu_rows * c["v"]
            bw_pad = self.mcu_cols * c["h"]
            self.coefs[c["id"]] = np.zeros((bh_pad, bw_pad, 64), dtype=np.int32)
            cw = -(-frame["w"] * c["h"] // self.hmax)
            ch = -(-frame["h"] * c["v"] // self.vmax)
            self.bdims[c["id"]] = (-(-ch // 8), -(-cw // 8))
        self.scans_seen = 0

    # -- scan entry ----------------------------------------------------------

    def decode_scan(self, blob, pos, order, scan, htables,
                    restart_interval, ss, se, ah, al):
        if ss == 0:
            if se != 0:
                raise ValueError("progressive scan mixing DC and AC bands")
            if ah == 0:
                pos = self._dc_first(blob, pos, order, scan, htables,
                                     restart_interval, al)
            else:
                pos = self._dc_refine(blob, pos, order, restart_interval, al)
        else:
            if len(order) != 1:
                raise ValueError("progressive AC scan must be single-component")
            if se > 63 or ss > se:
                raise ValueError(f"invalid spectral band {ss}..{se}")
            cid = order[0]
            ta = scan[cid][1]
            if (1, ta) not in htables:
                raise ValueError("missing AC huffman table referenced by scan")
            tbl = htables[(1, ta)]
            if ah == 0:
                pos = self._ac_first(blob, pos, cid, tbl, restart_interval,
                                     ss, se, al)
            else:
                pos = self._ac_refine(blob, pos, cid, tbl, restart_interval,
                                      ss, se, al)
        self.scans_seen += 1
        return pos

    def _comp(self, cid):
        for c in self.frame["comps"]:
            if c["id"] == cid:
                return c
        raise ValueError(f"scan references unknown component {cid}")

    @staticmethod
    def _next_marker(blob, pos):
        """Skip remaining entropy bytes: the next real marker (not a fill
        0xFF, stuffed 0xFF00, or RSTn) starts the following segment."""
        n = len(blob)
        while pos + 1 < n:
            if blob[pos] == 0xFF and blob[pos + 1] not in (0x00,) and not (
                0xD0 <= blob[pos + 1] <= 0xD7
            ):
                if blob[pos + 1] == 0xFF:  # fill byte
                    pos += 1
                    continue
                return pos
            pos += 1
        raise ValueError("progressive JPEG truncated after scan")

    # -- DC scans --------------------------------------------------------

    def _dc_first(self, blob, pos, order, scan, htables,
                  restart_interval, al):
        comps = [self._comp(cid) for cid in order]
        for c in comps:
            td = scan[c["id"]][0]
            if (0, td) not in htables:
                raise ValueError("missing DC huffman table referenced by scan")
            c["_dc"] = htables[(0, td)]
        r = _BitReader(blob, pos)
        preds = {c["id"]: 0 for c in comps}
        interleaved = len(comps) > 1

        def block_iter():
            if interleaved:
                for my in range(self.mcu_rows):
                    for mx in range(self.mcu_cols):
                        for c in comps:
                            for by in range(c["v"]):
                                for bx in range(c["h"]):
                                    yield c, my * c["v"] + by, mx * c["h"] + bx
            else:
                c = comps[0]
                bh, bw = self.bdims[c["id"]]
                for by in range(bh):
                    for bx in range(bw):
                        yield c, by, bx

        count = 0
        rst = 0
        unit = (sum(c["h"] * c["v"] for c in comps) if interleaved else 1)
        for c, by, bx in block_iter():
            # `count % (ri * unit) == 0` only holds at MCU boundaries,
            # since each MCU contributes exactly `unit` blocks
            if restart_interval and count and count % (restart_interval * unit) == 0:
                r.align_restart(rst)
                rst = (rst + 1) % 8
                preds = {cc["id"]: 0 for cc in comps}
            size = c["_dc"].decode(r)
            diff = _extend(r.bits(size), size) if size else 0
            preds[c["id"]] += diff
            self.coefs[c["id"]][by, bx, 0] = preds[c["id"]] << al
            count += 1
        return self._next_marker(blob, r.pos)

    def _dc_refine(self, blob, pos, order, restart_interval, al):
        comps = [self._comp(cid) for cid in order]
        r = _BitReader(blob, pos)
        interleaved = len(comps) > 1
        count = 0
        rst = 0
        if interleaved:
            it = []
            for my in range(self.mcu_rows):
                for mx in range(self.mcu_cols):
                    for c in comps:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                it.append((c, my * c["v"] + by, mx * c["h"] + bx))
            unit = sum(c["h"] * c["v"] for c in comps)
        else:
            c = comps[0]
            bh, bw = self.bdims[c["id"]]
            it = [(c, by, bx) for by in range(bh) for bx in range(bw)]
            unit = 1
        for c, by, bx in it:
            if restart_interval and count and count % (restart_interval * unit) == 0:
                r.align_restart(rst)
                rst = (rst + 1) % 8
            if r.bit():
                self.coefs[c["id"]][by, bx, 0] |= 1 << al
            count += 1
        return self._next_marker(blob, r.pos)

    # -- AC scans --------------------------------------------------------

    def _ac_blocks(self, cid):
        bh, bw = self.bdims[cid]
        for by in range(bh):
            for bx in range(bw):
                yield by, bx

    def _ac_first(self, blob, pos, cid, tbl, restart_interval, ss, se, al):
        r = _BitReader(blob, pos)
        coefs = self.coefs[cid]
        eobrun = 0
        count = 0
        rst = 0
        for by, bx in self._ac_blocks(cid):
            if restart_interval and count and count % restart_interval == 0:
                r.align_restart(rst)
                rst = (rst + 1) % 8
                eobrun = 0
            count += 1
            if eobrun > 0:
                eobrun -= 1
                continue
            zz = coefs[by, bx]
            k = ss
            while k <= se:
                s = tbl.decode(r)
                run, size = s >> 4, s & 0xF
                if size:
                    k += run
                    if k > se:
                        raise ValueError("AC run past spectral band")
                    zz[k] = _extend(r.bits(size), size) << al
                    k += 1
                else:
                    if run != 15:
                        eobrun = (1 << run) - 1
                        if run:
                            eobrun += r.bits(run)
                        break
                    k += 16  # ZRL
        return self._next_marker(blob, r.pos)

    def _ac_refine(self, blob, pos, cid, tbl, restart_interval, ss, se, al):
        """T.81 G.1.2.3 correction-bit decode (the jdphuff algorithm
        restated from the spec): newly-significant coefficients arrive as
        run/size=1 symbols, history-nonzero coefficients absorb one
        correction bit whenever the scan passes over them."""
        r = _BitReader(blob, pos)
        coefs = self.coefs[cid]
        p1 = 1 << al
        m1 = -1 << al
        eobrun = 0
        count = 0
        rst = 0
        for by, bx in self._ac_blocks(cid):
            if restart_interval and count and count % restart_interval == 0:
                r.align_restart(rst)
                rst = (rst + 1) % 8
                eobrun = 0
            count += 1
            zz = coefs[by, bx]
            k = ss
            if eobrun == 0:
                while k <= se:
                    s = tbl.decode(r)
                    run, size = s >> 4, s & 0xF
                    val = 0
                    if size:
                        if size != 1:
                            raise ValueError(
                                "AC refinement symbol with size != 1")
                        val = p1 if r.bit() else m1
                    elif run != 15:
                        eobrun = 1 << run
                        if run:
                            eobrun += r.bits(run)
                        break
                    # advance over `run` zero-history coefficients,
                    # feeding correction bits to nonzero-history ones
                    while k <= se:
                        c = int(zz[k])
                        if c != 0:
                            if r.bit() and (c & p1) == 0:
                                zz[k] = c + (p1 if c >= 0 else m1)
                        else:
                            if run == 0:
                                break
                            run -= 1
                        k += 1
                    if val and k <= se:
                        zz[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    c = int(zz[k])
                    if c != 0:
                        if r.bit() and (c & p1) == 0:
                            zz[k] = c + (p1 if c >= 0 else m1)
                    k += 1
                eobrun -= 1
        return self._next_marker(blob, r.pos)

    # -- reconstruction ----------------------------------------------------

    def reconstruct(self, qtables):
        frame = self.frame
        w, h, comps = frame["w"], frame["h"], frame["comps"]
        if w == 0 or h == 0:
            raise ValueError(f"invalid JPEG dimensions {w}x{h}")
        planes = []
        for c in comps:
            if c["tq"] not in qtables:
                raise ValueError(f"missing quant table {c['tq']}")
            qzz = qtables[c["tq"]]
            zz = self.coefs[c["id"]]
            bh_pad, bw_pad = zz.shape[:2]
            plane = np.zeros((bh_pad * 8, bw_pad * 8))
            coef = np.zeros(64)
            for by in range(bh_pad):
                for bx in range(bw_pad):
                    coef[ZIGZAG] = zz[by, bx] * qzz
                    plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                        _C.T @ coef.reshape(8, 8) @ _C + 128.0
                    )
            planes.append(plane)
        return _planes_to_rgb(comps, planes, w, h, self.hmax, self.vmax)
