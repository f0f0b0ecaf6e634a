"""Pure-Python Zstandard decoder (RFC 8878) — the last codec gap in the
vendored ROOT reader (``ZS`` compression frames; zstd is a ROOT 6.20+
option and common on modern CMS files). No zstd module ships in this
container, and the format is an open IETF RFC, so the decoder is
implemented from the spec:

- frame parsing (magic, frame-header descriptor, window/single-segment,
  frame content size, optional XXH64-low32 content checksum),
- raw / RLE / compressed blocks,
- literals: raw, RLE, huffman-compressed (direct 4-bit weights AND
  FSE-compressed weights; 1-stream and 4-stream layouts), treeless
  (repeat the previous table),
- sequences: predefined / RLE / FSE-compressed / repeat tables for the
  three interleaved symbol streams (literal lengths, offsets, match
  lengths), the backward bitstream, and repeat-offset history with the
  literals-length-0 shift rule.

Dictionaries are NOT supported (ROOT never uses them; a dict id in the
frame header raises). Speed: Python-rate — fine for per-key basket
payloads; a bulk ingest prefers uproot+zstandard when installable.

The companion encoder (``zstd_compress``) exists to make every decode
path testable without the reference binary: it emits raw-literal /
huffman-literal (direct or FSE weights) compressed blocks with
predefined OR explicitly-normalized FSE sequence tables, so round-trips
exercise the same machinery real zstd frames use.
"""

from __future__ import annotations

import struct

ZSTD_MAGIC = 0xFD2FB528

# --- predefined FSE distributions (RFC 8878 §3.1.1.3.2.2) -------------------

_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
     2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1],
    5,
)

# literal-length code -> (baseline, extra bits); codes 0-15 are the value
_LL_BASE = [(i, 0) for i in range(16)] + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3), (40, 3),
    (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10), (2048, 11),
    (4096, 12), (8192, 13), (16384, 14), (32768, 15), (65536, 16),
]
# match-length code -> (baseline, extra bits); codes 0-31 are value+3
_ML_BASE = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3), (59, 3),
    (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9), (1027, 10),
    (2051, 11), (4099, 12), (8195, 13), (16387, 14), (32771, 15),
    (65539, 16),
]


# --- bit readers -------------------------------------------------------------


class _FwdBits:
    """Forward little-endian bit reader (FSE normalized-count headers)."""

    def __init__(self, data: bytes) -> None:
        self.val = int.from_bytes(data, "little")
        self.pos = 0
        self.limit = len(data) * 8

    def read(self, n: int) -> int:
        v = (self.val >> self.pos) & ((1 << n) - 1)
        self.pos += n
        if self.pos > self.limit:
            raise ValueError("zstd: FSE header overread")
        return v

    def peek(self, n: int) -> int:
        return (self.val >> self.pos) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.pos += n
        if self.pos > self.limit:
            raise ValueError("zstd: FSE header overread")

    def bytes_consumed(self) -> int:
        return (self.pos + 7) // 8


class _BackBits:
    """Backward bitstream (RFC 8878 §3.1.1.3.2.1.1): written forward
    LSB-first, read from the end after the 1-bit padding marker. The
    first bits read are the HIGH bits of the underlying integer."""

    def __init__(self, data: bytes) -> None:
        if not data or data[-1] == 0:
            raise ValueError("zstd: backward bitstream missing padding marker")
        self.val = int.from_bytes(data, "little")
        self.pos = len(data) * 8 - (8 - data[-1].bit_length()) - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.pos -= n
        if self.pos < 0:
            raise ValueError("zstd: backward bitstream overread")
        return (self.val >> self.pos) & ((1 << n) - 1)

    def read_or_zero(self, n: int) -> int:
        """Huffman tail: the last code may peek past the stream start —
        missing low bits count as zeros (codes are fully determined by
        the bits that exist)."""
        if self.pos >= n:
            return self.read(n)
        v = (self.val << (n - self.pos)) & ((1 << n) - 1) if self.pos > 0 else 0
        self.pos -= n
        return v


# --- FSE ---------------------------------------------------------------------


def _fse_read_ncount(fwd: _FwdBits, max_symbol: int) -> tuple[list[int], int]:
    """FSE normalized counts from a forward bitstream (§4.1.1). Returns
    (counts incl. -1 for 'less than 1', accuracy_log)."""
    accuracy = fwd.read(4) + 5
    if accuracy > 9 + 6:
        raise ValueError(f"zstd: FSE accuracy log {accuracy} too large")
    table_size = 1 << accuracy
    remaining = table_size + 1
    threshold = table_size
    nb_bits = accuracy + 1
    counts: list[int] = []
    while remaining > 1:
        if len(counts) > max_symbol + 1:
            raise ValueError("zstd: FSE count table exceeds symbol range")
        max_val = (2 * threshold - 1) - remaining
        low_mask = threshold - 1
        peek = fwd.peek(nb_bits)
        if (peek & low_mask) < max_val:
            value = peek & low_mask
            fwd.skip(nb_bits - 1)
        else:
            value = peek & (2 * threshold - 1)
            if value >= threshold:
                value -= max_val
            fwd.skip(nb_bits)
        count = value - 1  # -1 encodes "probability less than 1"
        counts.append(count)
        remaining -= count if count > 0 else 1 if count == -1 else 0
        if count == 0:
            while True:
                rep = fwd.read(2)
                counts.extend([0] * rep)
                if rep < 3:
                    break
        while remaining > 1 and remaining < threshold:
            threshold >>= 1
            nb_bits -= 1
    if remaining != 1:
        raise ValueError("zstd: corrupt FSE normalized counts")
    return counts, accuracy


def _fse_build_dtable(
    counts: list[int], accuracy: int
) -> list[tuple[int, int, int]]:
    """(symbol, nb_bits, baseline) per state cell (§4.1.1)."""
    size = 1 << accuracy
    symbols = [0] * size
    high = size - 1
    for s, c in enumerate(counts):
        if c == -1:
            symbols[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, c in enumerate(counts):
        if c <= 0:
            continue
        for _ in range(c):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: FSE table spread did not return to zero")
    # decode numbers, reference algorithm: symbolNext[s] starts at the
    # symbol's count (1 for "-1" probs); each cell, visited in TABLE
    # order, takes x = symbolNext[s]++ and gets
    # nbBits = accuracy - highbit(x), newState = (x << nbBits) - size
    symbol_next = [c if c > 0 else 1 for c in counts]
    table: list[tuple[int, int, int]] = [(0, 0, 0)] * size
    for i in range(size):
        s = symbols[i]
        x = symbol_next[s]
        symbol_next[s] += 1
        nb = accuracy - (x.bit_length() - 1)
        baseline = (x << nb) - size
        table[i] = (s, nb, baseline)
    return table


class _FseState:
    def __init__(self, table: list[tuple[int, int, int]], accuracy: int,
                 bits: _BackBits) -> None:
        self.table = table
        self.state = bits.read(accuracy)

    def symbol(self) -> int:
        return self.table[self.state][0]

    def update(self, bits: _BackBits) -> None:
        _s, nb, baseline = self.table[self.state]
        self.state = baseline + bits.read(nb)


def _rle_table(symbol: int) -> list[tuple[int, int, int]]:
    """An RLE 'table': accuracy 0, one state, zero-bit updates."""
    return [(symbol, 0, 0)]


# --- Huffman -----------------------------------------------------------------


def _huf_build(weights: list[int]) -> tuple[list[tuple[int, int]], int]:
    """Canonical huffman decode table from weights (§4.2.1): returns
    (table of (symbol, nb_bits) with 2^max_bits entries, max_bits).
    ``weights`` EXCLUDES the implicit last symbol, which is derived."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: huffman weights all zero")
    # the implicit last symbol completes the sum to the power of 2
    # STRICTLY larger than the transmitted total (§4.2.1) — `1 <<
    # (total-1).bit_length()` collapses when total is itself a power of
    # 2 (found by hypothesis on a 2-symbol table: the last symbol would
    # get weight 0 and vanish)
    size = 1 << total.bit_length()
    rest = size - total
    if rest & (rest - 1):
        raise ValueError("zstd: huffman weights do not complete a power of 2")
    weights = weights + [rest.bit_length()]
    max_bits = (size).bit_length() - 1
    if max_bits > 11:
        raise ValueError(f"zstd: huffman max bits {max_bits} > 11")
    table: list[tuple[int, int]] = [(0, 0)] * (1 << max_bits)
    # rank start positions: weight 1 (longest codes) fills from index 0
    rank_count: dict[int, int] = {}
    for w in weights:
        if w > 0:
            rank_count[w] = rank_count.get(w, 0) + 1
    rank_val: dict[int, int] = {}
    nxt = 0
    for w in sorted(rank_count):
        rank_val[w] = nxt
        nxt += rank_count[w] << (w - 1)
    for sym, w in enumerate(weights):
        if w == 0:
            continue
        nb = max_bits + 1 - w
        start = rank_val[w]
        length = 1 << (w - 1)
        for i in range(start, start + length):
            table[i] = (sym, nb)
        rank_val[w] += length
    return table, max_bits


def _huf_read_weights(data: bytes) -> tuple[list[int], int]:
    """Huffman tree description (§4.2.1): returns (weights-without-last,
    bytes consumed)."""
    h = data[0]
    if h >= 128:  # direct: (h-127) 4-bit weights (§4.2.1.1)
        n = h - 127
        nbytes = 1 + (n + 1) // 2
        weights = []
        for i in range(n):
            byte = data[1 + i // 2]
            weights.append((byte >> 4) if i % 2 == 0 else (byte & 0xF))
        return weights, nbytes
    # FSE-compressed weights: h = compressed size
    comp = data[1 : 1 + h]
    if len(comp) != h:
        raise ValueError("zstd: truncated huffman weight stream")
    fwd = _FwdBits(comp)
    counts, accuracy = _fse_read_ncount(fwd, 255)
    if accuracy > 6:
        raise ValueError("zstd: huffman weight FSE accuracy > 6")
    table = _fse_build_dtable(counts, accuracy)
    stream = comp[fwd.bytes_consumed():]
    bits = _BackBits(stream)
    s1 = _FseState(table, accuracy, bits)
    s2 = _FseState(table, accuracy, bits)
    weights: list[int] = []
    # interleaved decode; a state whose update would overread flushes the
    # other state's symbol and ends the stream (§4.2.1.2 / reference loop)
    while True:
        weights.append(s1.symbol())
        try:
            s1.update(bits)
        except ValueError:
            weights.append(s2.symbol())
            break
        weights.append(s2.symbol())
        try:
            s2.update(bits)
        except ValueError:
            weights.append(s1.symbol())
            break
        if len(weights) > 255:
            raise ValueError("zstd: huffman weight stream too long")
    return weights, 1 + h


def _huf_decode_stream(bits: _BackBits, table: list[tuple[int, int]],
                       max_bits: int, n_out: int) -> bytearray:
    out = bytearray()
    for _ in range(n_out):
        idx = bits.read_or_zero(max_bits)
        sym, nb = table[idx]
        bits.pos += max_bits - nb  # give back unused bits
        out.append(sym)
    return out


# --- literals section --------------------------------------------------------


def _decode_literals(block: bytes, prev_huf) -> tuple[bytearray, int, object]:
    """Returns (literals, bytes consumed, huffman table for reuse)."""
    b0 = block[0]
    ltype = b0 & 3
    size_format = (b0 >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if size_format in (0, 2):  # 1-byte header (format bit 0 reused)
            regen = b0 >> 3
            hdr = 1
        elif size_format == 1:
            regen = (b0 >> 4) | (block[1] << 4)
            hdr = 2
        else:
            regen = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hdr = 3
        if ltype == 0:
            lit = bytearray(block[hdr : hdr + regen])
            if len(lit) != regen:
                raise ValueError("zstd: truncated raw literals")
            return lit, hdr + regen, prev_huf
        return bytearray([block[hdr]] * regen), hdr + 1, prev_huf
    # compressed (2) / treeless (3) — RFC 8878 §3.1.1.3.1.1: size_format
    # 00 = SINGLE stream, 01 = 4 streams (both 10-bit sizes, 3-byte header)
    if size_format == 0:  # 1 stream, 10-bit sizes, 3-byte header
        regen = (b0 >> 4) | ((block[1] & 0x3F) << 4)
        comp = (block[1] >> 6) | (block[2] << 2)
        hdr = 3
        four = False
    elif size_format == 1:  # 4 streams, 10-bit sizes
        regen = (b0 >> 4) | ((block[1] & 0x3F) << 4)
        comp = (block[1] >> 6) | (block[2] << 2)
        hdr = 3
        four = True
    elif size_format == 2:  # 4 streams, 14-bit
        regen = (b0 >> 4) | (block[1] << 4) | ((block[2] & 3) << 12)
        comp = (block[2] >> 2) | (block[3] << 6)
        hdr = 4
        four = True
    else:  # 4 streams, 18-bit
        regen = (b0 >> 4) | (block[1] << 4) | ((block[2] & 0x3F) << 12)
        comp = (block[2] >> 6) | (block[3] << 2) | (block[4] << 10)
        hdr = 5
        four = True
    payload = block[hdr : hdr + comp]
    if len(payload) != comp:
        raise ValueError("zstd: truncated compressed literals")
    if ltype == 2:
        weights, consumed = _huf_read_weights(payload)
        table, max_bits = _huf_build(weights)
        huf = (table, max_bits)
        payload = payload[consumed:]
    else:
        if prev_huf is None:
            raise ValueError("zstd: treeless literals with no previous table")
        huf = prev_huf
        table, max_bits = huf
    if not four:
        lit = _huf_decode_stream(_BackBits(payload), table, max_bits, regen)
        return lit, hdr + comp, huf
    if regen < 6:
        # libzstd's MIN_LITERALS_FOR_4_STREAMS = 6 (ADVICE r8). The exact
        # rule: stream-4 size = regen - 3*ceil(regen/4) must be >= 0,
        # which first goes NEGATIVE below regen=6 (regen=5 -> -1);
        # regen=6 itself yields a legal zero-length 4th stream and is
        # accepted — do not tighten this to < 7
        raise ValueError("zstd: 4-stream literals with regen < 6")
    if len(payload) < 6:
        raise ValueError("zstd: missing 4-stream jump table")
    j1, j2, j3 = struct.unpack_from("<HHH", payload, 0)
    streams = payload[6:]
    bounds = [0, j1, j1 + j2, j1 + j2 + j3, len(streams)]
    per = (regen + 3) // 4
    sizes = [per, per, per, regen - 3 * per]
    lit = bytearray()
    for i in range(4):
        seg = streams[bounds[i] : bounds[i + 1]]
        lit += _huf_decode_stream(_BackBits(seg), table, max_bits, sizes[i])
    return lit, hdr + comp, huf


# --- sequences ---------------------------------------------------------------


def _seq_table(mode: int, block: bytes, pos: int, default, max_symbol: int,
               prev):
    """One symbol-stream table per its 2-bit compression mode. Returns
    (table, accuracy, new pos, keep-for-repeat)."""
    if mode == 0:  # predefined
        counts, accuracy = default
        table = _fse_build_dtable(counts, accuracy)
        return table, accuracy, pos, (table, accuracy)
    if mode == 1:  # RLE: single byte symbol
        sym = block[pos]
        if sym > max_symbol:
            raise ValueError(f"zstd: RLE symbol {sym} out of range")
        return _rle_table(sym), 0, pos + 1, (_rle_table(sym), 0)
    if mode == 2:  # FSE-compressed
        fwd = _FwdBits(block[pos:])
        counts, accuracy = _fse_read_ncount(fwd, max_symbol)
        table = _fse_build_dtable(counts, accuracy)
        return table, accuracy, pos + fwd.bytes_consumed(), (table, accuracy)
    if prev is None:
        raise ValueError("zstd: repeat mode with no previous table")
    table, accuracy = prev
    return table, accuracy, pos, prev


def _decode_sequences(block: bytes, pos: int, lit: bytearray, out: bytearray,
                      rep: list[int], prev_tables: dict) -> None:
    b0 = block[pos]
    if b0 < 128:
        n_seq = b0
        pos += 1
    elif b0 < 255:
        n_seq = ((b0 - 128) << 8) | block[pos + 1]
        pos += 2
    else:
        # long form (§3.1.1.3.2.1): byte0 == 255, count = u16 + 0x7F00
        # (ADDITION per the RFC, not an OR — an OR mis-decodes any block
        # with >= 0x8000 sequences)
        n_seq = (block[pos + 1] | (block[pos + 2] << 8)) + 0x7F00
        pos += 3
    if n_seq == 0:
        out += lit
        return
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd: reserved sequence-mode bits set")
    ll_t, ll_a, pos, prev_tables["ll"] = _seq_table(
        (modes >> 6) & 3, block, pos, _LL_DEFAULT, 35, prev_tables.get("ll")
    )
    of_t, of_a, pos, prev_tables["of"] = _seq_table(
        (modes >> 4) & 3, block, pos, _OF_DEFAULT, 31, prev_tables.get("of")
    )
    ml_t, ml_a, pos, prev_tables["ml"] = _seq_table(
        (modes >> 2) & 3, block, pos, _ML_DEFAULT, 52, prev_tables.get("ml")
    )
    bits = _BackBits(block[pos:])
    ll_s = _FseState(ll_t, ll_a, bits)
    of_s = _FseState(of_t, of_a, bits)
    ml_s = _FseState(ml_t, ml_a, bits)
    lit_pos = 0
    for i in range(n_seq):
        of_code = of_s.symbol()
        if of_code > 31:
            raise ValueError("zstd: offset code out of range")
        offset_value = (1 << of_code) + bits.read(of_code)
        ml_code = ml_s.symbol()
        ml_base, ml_extra = _ML_BASE[ml_code]
        ml = ml_base + bits.read(ml_extra)
        ll_code = ll_s.symbol()
        ll_base, ll_extra = _LL_BASE[ll_code]
        ll = ll_base + bits.read(ll_extra)

        if offset_value > 3:
            offset = offset_value - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = offset_value - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif idx == 2:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:
                offset = rep[0] - 1
                if offset == 0:
                    raise ValueError("zstd: repeat offset underflow")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset

        if lit_pos + ll > len(lit):
            raise ValueError("zstd: literal overrun")
        out += lit[lit_pos : lit_pos + ll]
        lit_pos += ll
        start = len(out) - offset
        if start < 0:
            raise ValueError("zstd: match offset before output start")
        if offset >= ml:
            out += out[start : start + ml]
        else:
            for j in range(ml):
                out.append(out[start + j])
        if i < n_seq - 1:
            ll_s.update(bits)
            ml_s.update(bits)
            of_s.update(bits)
    out += lit[lit_pos:]


# --- frame / block walk ------------------------------------------------------


def zstd_decompress(data: bytes, expected_size: int | None = None) -> bytes:
    """Decode one zstd frame (plus any trailing skippable frames are NOT
    consumed — ROOT stores exactly one frame per compression frame)."""
    if len(data) < 4 or struct.unpack_from("<I", data, 0)[0] != ZSTD_MAGIC:
        raise ValueError("zstd: bad magic")
    pos = 4
    fhd = data[pos]
    pos += 1
    fcs_field = fhd >> 6
    single_segment = (fhd >> 5) & 1
    checksum = (fhd >> 2) & 1
    dict_id = fhd & 3
    if (fhd >> 3) & 1:
        raise ValueError("zstd: reserved frame-header bit set")
    if dict_id:
        raise ValueError("zstd: dictionaries not supported")
    if not single_segment:
        pos += 1  # window descriptor (we buffer the whole output anyway)
    fcs = None
    fcs_len = {0: (1 if single_segment else 0), 1: 2, 2: 4, 3: 8}[fcs_field]
    if fcs_len:
        fcs = int.from_bytes(data[pos : pos + fcs_len], "little")
        if fcs_len == 2:
            fcs += 256
        pos += fcs_len
    out = bytearray()
    rep = [1, 4, 8]
    prev_huf = None
    prev_tables: dict = {}
    while True:
        if pos + 3 > len(data):
            raise ValueError("zstd: truncated block header")
        bh = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:  # raw
            out += data[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE
            out += bytes([data[pos]]) * bsize
            pos += 1
        elif btype == 2:  # compressed
            block = data[pos : pos + bsize]
            if len(block) != bsize:
                raise ValueError("zstd: truncated compressed block")
            pos += bsize
            lit, consumed, prev_huf = _decode_literals(block, prev_huf)
            _decode_sequences(block, consumed, lit, out, rep, prev_tables)
        else:
            raise ValueError("zstd: reserved block type")
        if last:
            break
    if checksum:
        if pos + 4 > len(data):
            raise ValueError("zstd: missing content checksum")
        from .lz4block import xxh64

        stored = struct.unpack_from("<I", data, pos)[0]
        if (xxh64(bytes(out)) & 0xFFFFFFFF) != stored:
            raise ValueError("zstd: content checksum mismatch")
    if fcs is not None and fcs != len(out):
        raise ValueError(f"zstd: frame content size {fcs} != {len(out)}")
    if expected_size is not None and len(out) != expected_size:
        raise ValueError(
            f"zstd: decoded {len(out)} bytes, expected {expected_size}"
        )
    return bytes(out)


# --- encoder (fixture/test companion) ---------------------------------------


class _BackBitWriter:
    """Collect (value, nbits) fields in DECODE order; `finish` packs them
    so a _BackBits reader yields them in that order (first-read field in
    the top bits, 1-bit padding marker appended)."""

    def __init__(self) -> None:
        self.fields: list[tuple[int, int]] = []

    def add(self, value: int, nbits: int) -> None:
        if nbits and not 0 <= value < (1 << nbits):
            raise ValueError(f"field {value} does not fit {nbits} bits")
        if nbits:
            self.fields.append((value, nbits))

    def finish(self) -> bytes:
        acc = 0
        total = 0
        for v, n in self.fields:
            acc = (acc << n) | v
            total += n
        acc |= 1 << total  # padding marker
        return acc.to_bytes((total + 1 + 7) // 8, "little")


def _fse_encode_chain(
    table: list[tuple[int, int, int]], symbols: list[int]
) -> tuple[int, list[tuple[int, int]]]:
    """FSE-encode one symbol chain: returns (initial state cell, update
    fields in DECODE order — bits that move the decoder from symbol i's
    cell to symbol i+1's cell). Backward construction: any cell of the
    last symbol works; each predecessor must be a cell of its symbol
    whose baseline range covers the successor cell index."""
    cells: dict[int, list[tuple[int, int, int]]] = {}
    for i, (s, nb, baseline) in enumerate(table):
        cells.setdefault(s, []).append((i, nb, baseline))
    for s in symbols:
        if s not in cells:
            raise ValueError(f"symbol {s} has zero probability in FSE table")
    state = cells[symbols[-1]][0][0]
    updates: list[tuple[int, int]] = []
    for sym in reversed(symbols[:-1]):
        nxt = state
        for i, nb, baseline in cells[sym]:
            if baseline <= nxt < baseline + (1 << nb):
                updates.append((nxt - baseline, nb))
                state = i
                break
        else:
            raise ValueError("FSE cells do not cover the state space")
    updates.reverse()
    return state, updates


def _fse_normalize(hist: dict[int, int], accuracy: int,
                   n_symbols: int) -> list[int]:
    """Largest-remainder normalization of a histogram to 2^accuracy with
    every present symbol >= 1."""
    size = 1 << accuracy
    total = sum(hist.values())
    counts = [0] * n_symbols
    fracs = []
    used = 0
    for s in range(n_symbols):
        c = hist.get(s, 0)
        if c == 0:
            continue
        exact = c * size / total
        counts[s] = max(1, int(exact))
        used += counts[s]
        fracs.append((exact - int(exact), s))
    if used > size:
        # shrink the largest counts until it fits
        order = sorted(range(n_symbols), key=lambda s: -counts[s])
        i = 0
        while used > size:
            s = order[i % len(order)]
            if counts[s] > 1:
                counts[s] -= 1
                used -= 1
            i += 1
    fracs.sort(reverse=True)
    i = 0
    while used < size and fracs:
        s = fracs[i % len(fracs)][1]
        counts[s] += 1
        used += 1
        i += 1
    if sum(counts) != size:
        raise ValueError("normalization failed")
    return counts


def _fse_write_ncount(counts: list[int], accuracy: int) -> bytes:
    """Inverse of _fse_read_ncount: forward little-endian bit packing of
    the normalized counts (no -1 probs emitted — the encoder never
    produces them)."""
    fields: list[tuple[int, int]] = [(accuracy - 5, 4)]
    table_size = 1 << accuracy
    remaining = table_size + 1
    threshold = table_size
    nb_bits = accuracy + 1
    i = 0
    while remaining > 1:
        count = counts[i] if i < len(counts) else 0
        i += 1
        max_val = (2 * threshold - 1) - remaining
        value = count + 1
        if value < max_val:
            fields.append((value, nb_bits - 1))
        else:
            enc = value if value < threshold else value + max_val
            fields.append((enc, nb_bits))
        remaining -= count if count > 0 else 0
        if count == 0:
            # runs of zeros: 2-bit repeats
            run = 0
            while i < len(counts) and counts[i] == 0:
                run += 1
                i += 1
            while run >= 3:
                fields.append((3, 2))
                run -= 3
            fields.append((run, 2))
        while remaining > 1 and remaining < threshold:
            threshold >>= 1
            nb_bits -= 1
    acc = 0
    pos = 0
    for v, n in fields:
        acc |= v << pos
        pos += n
    return acc.to_bytes((pos + 7) // 8, "little")


def _ll_code(ll: int) -> tuple[int, int, int]:
    if ll < 16:
        return ll, 0, 0
    for code in range(len(_LL_BASE) - 1, 15, -1):
        base, extra = _LL_BASE[code]
        if ll >= base:
            return code, ll - base, extra
    raise ValueError(f"literal length {ll}")


def _ml_code(ml: int) -> tuple[int, int, int]:
    if ml - 3 < 32:
        return ml - 3, 0, 0
    for code in range(len(_ML_BASE) - 1, 31, -1):
        base, extra = _ML_BASE[code]
        if ml >= base:
            return code, ml - base, extra
    raise ValueError(f"match length {ml}")


def _greedy_matches(src: bytes, start: int, end: int,
                    table: dict) -> tuple[list[tuple[int, int, int]], bytes]:
    """LZ parse of src[start:end] against all history: sequences of
    (literal_len, offset, match_len >= 3) + trailing literals."""
    seqs: list[tuple[int, int, int]] = []
    lits = bytearray()
    anchor = i = start
    while i + 3 <= end:
        key = src[i : i + 3]
        j = table.get(key)
        table[key] = i
        if j is None:
            i += 1
            continue
        ml = 3
        while i + ml < end and src[j + ml] == src[i + ml]:
            ml += 1
        seqs.append((i - anchor, i - j, ml))
        lits += src[anchor:i]
        i += ml
        anchor = i
    lits += src[anchor:end]
    return seqs, bytes(lits)


def _huf_weights_for(lits: bytes) -> list[int] | None:
    """Valid (not optimal) canonical weight set: all distinct symbols at
    max_bits, `2^max_bits - n` of them upgraded one bit shorter. None if
    huffman cannot apply (one distinct symbol, or codes would be
    pointless)."""
    symbols = sorted(set(lits))
    n = len(symbols)
    if n < 2 or n > 255:
        return None
    max_bits = max((n - 1).bit_length(), 1)
    if max_bits > 11:
        return None
    deficit = (1 << max_bits) - n
    weights = [0] * 256
    for k, s in enumerate(symbols):
        # weight = max_bits + 1 - code_len; upgraded symbols are 1 shorter
        weights[s] = 2 if k < deficit else 1
    while weights and weights[-1] == 0:
        weights.pop()
    return weights


def _huf_encode_stream(lits: bytes, enc: dict[int, tuple[int, int]]) -> bytes:
    w = _BackBitWriter()
    for b in lits:
        v, n = enc[b]
        w.add(v, n)
    return w.finish()


def _huf_make(lits: bytes):
    """(transmitted weights, decode table, max_bits, per-symbol encoder
    map) for a literal set — or None when huffman cannot apply. The
    TRANSMITTED weights exclude the last present symbol (its weight is
    implicit per §4.2.1 — the remainder to the next power of 2, always
    exactly 2^(w_last - 1) here)."""
    full = _huf_weights_for(lits)
    if full is None:
        return None
    weights_tx = full[:-1]
    table, max_bits = _huf_build(weights_tx)
    enc: dict[int, tuple[int, int]] = {}
    start: dict[int, int] = {}
    for idx, (sym, nb) in enumerate(table):
        if sym not in start:
            start[sym] = idx
            enc[sym] = (idx >> (max_bits - nb), nb)
    return weights_tx, table, max_bits, enc


def _encode_literals_section(lits: bytes, mode: str) -> bytes:
    n = len(lits)
    made = _huf_make(lits) if mode != "raw" else None
    if made is None:
        # raw literals, size_format by magnitude
        if n < 32:
            return bytes([(n << 3) | 0]) + lits
        if n < 4096:
            return bytes([((n & 0xF) << 4) | 4 | 0, n >> 4]) + lits
        return bytes([((n & 0xF) << 4) | 12 | 0, (n >> 4) & 0xFF, n >> 12]) + lits
    weights, table, max_bits, enc = made
    if mode == "huf-fse":
        hist: dict[int, int] = {}
        for wgt in weights:
            hist[wgt] = hist.get(wgt, 0) + 1
        if len(hist) < 2:
            mode = "huf"  # degenerate: direct weights
        else:
            acc = 6
            counts = _fse_normalize(hist, acc, max(hist) + 1)
            # the dance (see _huf_read_weights): last update must RAISE,
            # so every cell must read >= 1 bit -> max count <= size/2
            if max(counts) > (1 << acc) >> 1:
                mode = "huf"
            else:
                dtab = _fse_build_dtable(counts, acc)
                chain1 = weights[0::2]
                chain2 = weights[1::2]
                s1, u1 = _fse_encode_chain(dtab, chain1)
                s2, u2 = _fse_encode_chain(dtab, chain2)
                w = _BackBitWriter()
                w.add(s1, acc)
                w.add(s2, acc)
                # decode order interleaves updates: u1[0], u2[0], u1[1]...
                for k in range(max(len(u1), len(u2))):
                    if k < len(u1):
                        w.add(*u1[k])
                    if k < len(u2):
                        w.add(*u2[k])
                wblob = _fse_write_ncount(counts, acc) + w.finish()
                if len(wblob) >= 128:
                    mode = "huf"
                else:
                    header = bytes([len(wblob)]) + wblob
    if mode == "huf":
        nw = len(weights)
        if nw > 128:
            # direct headers encode at most 128 weights (h = 127 + nw);
            # wide symbol sets must go FSE-weights or raw
            return _encode_literals_section(lits, "raw")
        packed = bytearray([127 + nw])
        for k in range(0, nw, 2):
            hi = weights[k] << 4
            lo = weights[k + 1] if k + 1 < nw else 0
            packed.append(hi | lo)
        header = bytes(packed)
    stream = _huf_encode_stream(lits, enc)
    payload = header + stream
    comp = len(payload)
    if n >= 1024 or comp >= 1024:
        # 4-stream, size_format 2 (14-bit sizes)
        per = (n + 3) // 4
        parts = [lits[0:per], lits[per:2 * per], lits[2 * per:3 * per],
                 lits[3 * per:]]
        streams = [_huf_encode_stream(p, enc) for p in parts]
        jump = struct.pack("<HHH", len(streams[0]), len(streams[1]),
                           len(streams[2]))
        payload = header + jump + b"".join(streams)
        comp = len(payload)
        b = [0] * 4
        b[0] = 2 | (2 << 2) | ((n & 0xF) << 4)
        b[1] = (n >> 4) & 0xFF
        b[2] = ((n >> 12) & 3) | ((comp & 0x3F) << 2)
        b[3] = comp >> 6
        return bytes(b) + payload
    # compressed literals, size_format 0 (single stream, 10-bit sizes)
    b0 = 2 | (0 << 2) | ((n & 0xF) << 4)
    b1 = ((n >> 4) & 0x3F) | ((comp & 3) << 6)
    b2 = comp >> 2
    return bytes([b0, b1, b2]) + payload


def _encode_sequences_section(seqs: list[tuple[int, int, int]],
                              mode: str) -> bytes:
    out = bytearray()
    n = len(seqs)
    if n < 128:
        out.append(n)
    elif n < 0x7F00:
        out.append(128 + (n >> 8))
        out.append(n & 0xFF)
    else:
        # long form stores count - 0x7F00 as a u16 (decoder ADDS it back)
        m = n - 0x7F00
        if m > 0xFFFF:
            raise ValueError(f"zstd: too many sequences in one block ({n})")
        out += bytes([255, m & 0xFF, (m >> 8) & 0xFF])
    if n == 0:
        return bytes(out)
    ll_codes, of_codes, ml_codes = [], [], []
    extras: list[list[tuple[int, int]]] = []
    for ll, offset, ml in seqs:
        lc, lv, ln = _ll_code(ll)
        offset_value = offset + 3
        oc = offset_value.bit_length() - 1
        ov = offset_value - (1 << oc)
        mc, mv, mn = _ml_code(ml)
        ll_codes.append(lc)
        of_codes.append(oc)
        ml_codes.append(mc)
        extras.append([(ov, oc), (mv, mn), (lv, ln)])
    if mode == "predefined":
        out.append(0)  # all three streams predefined
        tabs = {}
        for key, default in (("ll", _LL_DEFAULT), ("of", _OF_DEFAULT),
                             ("ml", _ML_DEFAULT)):
            counts, acc = default
            tabs[key] = (_fse_build_dtable(counts, acc), acc)
    else:  # explicit FSE tables normalized from our code histograms
        out.append((2 << 6) | (2 << 4) | (2 << 2))
        tabs = {}
        for key, codes, nsym, max_acc in (
            ("ll", ll_codes, 36, 9), ("of", of_codes, 32, 8),
            ("ml", ml_codes, 53, 9),
        ):
            hist: dict[int, int] = {}
            for c in codes:
                hist[c] = hist.get(c, 0) + 1
            acc = min(max_acc, max(5, (len(codes) - 1).bit_length()))
            counts = _fse_normalize(hist, acc, max(hist) + 1)
            out += _fse_write_ncount(counts, acc)
            tabs[key] = (_fse_build_dtable(counts, acc), acc)
    (ll_t, ll_a), (of_t, of_a), (ml_t, ml_a) = (
        tabs["ll"], tabs["of"], tabs["ml"]
    )
    ll_s, ll_u = _fse_encode_chain(ll_t, ll_codes)
    of_s, of_u = _fse_encode_chain(of_t, of_codes)
    ml_s, ml_u = _fse_encode_chain(ml_t, ml_codes)
    w = _BackBitWriter()
    w.add(ll_s, ll_a)
    w.add(of_s, of_a)
    w.add(ml_s, ml_a)
    for i in range(n):
        for v, nb in extras[i]:
            w.add(v, nb)
        if i < n - 1:
            w.add(*ll_u[i])
            w.add(*ml_u[i])
            w.add(*of_u[i])
    out += w.finish()
    return bytes(out)


def zstd_compress(data: bytes, literals: str = "raw",
                  seq_mode: str = "predefined",
                  block_size: int = 100_000,
                  checksum: bool = True) -> bytes:
    """Spec-shaped zstd frame writer — the test companion of
    zstd_decompress (see module docstring). ``literals``: 'raw', 'huf'
    (direct weights), or 'huf-fse' (FSE-compressed weights);
    ``seq_mode``: 'predefined' or 'fse'. Single-segment frame, content
    size recorded, optional XXH64-low32 checksum."""
    from .lz4block import xxh64

    out = bytearray()
    out += struct.pack("<I", ZSTD_MAGIC)
    fhd = (2 << 6) | (1 << 5) | ((1 if checksum else 0) << 2)
    out.append(fhd)
    out += struct.pack("<I", len(data))
    table: dict = {}
    nblocks = max(1, -(-len(data) // block_size))
    for bi in range(nblocks):
        start = bi * block_size
        end = min(start + block_size, len(data))
        last = 1 if bi == nblocks - 1 else 0
        seqs, lits = _greedy_matches(data, start, end, table)
        body = _encode_literals_section(lits, literals)
        body += _encode_sequences_section(seqs, seq_mode)
        if len(body) >= end - start:
            # incompressible: raw block
            out += struct.pack("<I", last | (0 << 1) | ((end - start) << 3))[:3]
            out += data[start:end]
        else:
            out += struct.pack("<I", last | (2 << 1) | (len(body) << 3))[:3]
            out += body
    if checksum:
        out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)
