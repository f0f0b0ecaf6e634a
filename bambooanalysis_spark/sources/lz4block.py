"""Pure-Python LZ4 block codec + XXH64 — the two public formats ROOT's
``L4`` compression frames are made of (lz4 block format spec,
lz4.github.io/lz4/lz4_Block_format.html; XXH64 spec, github.com/Cyan4973/
xxHash — both public documents; no lz4/xxhash package ships in this
container, which is why minroot previously punted L4 frames to uproot).

Scope: the BLOCK format only (ROOT frames carry raw blocks, not the lz4
FRAME container). The compressor is a greedy 4-byte-hash matcher — valid
output, not ratio-chasing — used to build test fixtures and to write
optional L4-compressed baskets; the decompressor handles any
spec-conforming block (overlapping matches, 255-extended lengths), which
is what reading real ROOT files requires. Python-speed: fine for the
per-key basket sizes ROOT writes (<= 16 MB frames); a 100 TB ingest
prefers uproot+cramjam when installable — this is the stdlib-only
fallback, same policy as minroot's zlib path.

XXH64 is verified against Spark's JVM `xxhash64` implementation in
tests (an independent oracle for the same public algorithm).
"""

from __future__ import annotations

_M64 = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` — the checksum ROOT stores in every L4 frame
    (computed over the compressed block, seed 0)."""
    import struct

    n = len(data)
    i = 0
    if n >= 32:
        a1 = (seed + _P1 + _P2) & _M64
        a2 = (seed + _P2) & _M64
        a3 = seed & _M64
        a4 = (seed - _P1) & _M64
        while i + 32 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, i)
            a1 = (_rotl((a1 + l1 * _P2) & _M64, 31) * _P1) & _M64
            a2 = (_rotl((a2 + l2 * _P2) & _M64, 31) * _P1) & _M64
            a3 = (_rotl((a3 + l3 * _P2) & _M64, 31) * _P1) & _M64
            a4 = (_rotl((a4 + l4 * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _M64
        for a in (a1, a2, a3, a4):
            h = ((h ^ ((_rotl((a * _P2) & _M64, 31) * _P1) & _M64)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h = (_rotl(h ^ ((_rotl((k * _P2) & _M64, 31) * _P1) & _M64), 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = (_rotl(h ^ ((k * _P1) & _M64), 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def lz4_block_decompress(src: bytes, out_size: int) -> bytes:
    """Decode one LZ4 block to exactly ``out_size`` bytes. Raises
    ValueError on any spec violation (zero/too-far offset, overrun,
    wrong decoded size) — corrupt basket data must fail loudly."""
    out = bytearray()
    i = 0
    n = len(src)
    while i < n:
        token = src[i]
        i += 1
        ll = token >> 4
        if ll == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated literal length")
                b = src[i]
                i += 1
                ll += b
                if b != 255:
                    break
        if i + ll > n:
            raise ValueError("lz4: literal run past end of block")
        out += src[i : i + ll]
        i += ll
        if i >= n:
            break  # last sequence is literals-only
        if i + 2 > n:
            raise ValueError("lz4: truncated match offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("lz4: zero match offset")
        ml = token & 0xF
        if ml == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated match length")
                b = src[i]
                i += 1
                ml += b
                if b != 255:
                    break
        ml += 4
        start = len(out) - offset
        if start < 0:
            raise ValueError("lz4: match offset before block start")
        if offset >= ml:
            out += out[start : start + ml]
        else:  # overlapping match: byte-wise copy (the RLE trick)
            for j in range(ml):
                out.append(out[start + j])
    if len(out) != out_size:
        raise ValueError(
            f"lz4: decoded {len(out)} bytes, expected {out_size}"
        )
    return bytes(out)


def _emit_length(out: bytearray, v: int) -> None:
    while v >= 255:
        out.append(255)
        v -= 255
    out.append(v)


def lz4_block_compress(src: bytes) -> bytes:
    """Greedy single-pass LZ4 block encoder (4-byte hash chains, 64 KB
    window). Honors the spec's end conditions: the last 5 bytes are
    always literals and no match starts within 12 bytes of the end."""
    n = len(src)
    out = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    while i + 12 <= n:
        key = bytes(src[i : i + 4])
        j = table.get(key)
        table[key] = i
        if j is None or i - j > 0xFFFF:
            i += 1
            continue
        ml = 4
        limit = n - 5
        while i + ml < limit and src[j + ml] == src[i + ml]:
            ml += 1
        lit = src[anchor:i]
        ll, mm = len(lit), ml - 4
        out.append((min(ll, 15) << 4) | min(mm, 15))
        if ll >= 15:
            _emit_length(out, ll - 15)
        out += lit
        off = i - j
        out.append(off & 0xFF)
        out.append(off >> 8)
        if mm >= 15:
            _emit_length(out, mm - 15)
        i += ml
        anchor = i
    lit = src[anchor:]
    ll = len(lit)
    out.append(min(ll, 15) << 4)
    if ll >= 15:
        _emit_length(out, ll - 15)
    out += lit
    return bytes(out)
