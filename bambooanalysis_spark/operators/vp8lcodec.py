"""Pure-Python lossless WebP (VP8L) codec — WebP Lossless Bitstream
Specification (public, webmproject.org; the format RFC 9649 carries as
its lossless layer).

Decoder covers the full still-image feature set real encoders emit:

- RIFF/WEBP container with a VP8L chunk (plus VP8X-wrapped files whose
  image chunk is VP8L),
- LSB-first bitstream, canonical prefix codes read MSB-first (the
  DEFLATE convention), both the "simple" (1-2 symbol) and the
  code-length-coded forms, with repeat codes 16/17/18 and the optional
  max-symbol bound,
- LZ77 backward references with the length/distance prefix-code scheme
  and the 120-entry two-dimensional distance mapping (close pixels in
  the row above map to short codes),
- color cache (1..11 bit, 0x1e35a7bd multiplicative hash),
- meta prefix codes (an entropy image selecting per-tile code groups),
- all four transforms, inverted in reverse order: PREDICTOR (14 spatial
  predictors on a tile grid), COLOR (per-tile signed 3.5 fixed-point
  green->red/green->blue/red->blue deltas), SUBTRACT_GREEN, and
  COLOR_INDEXING (palette, including the packed sub-byte layouts for
  palettes of <= 16 colors).

The companion encoder writes spec-shaped VP8L (no transforms, optional
LZ77 backrefs, complete canonical codes) so every decode path is
testable; tests cross-validate BOTH directions against the system
libwebp (ctypes) when present — the round-8 zstd lesson (self-roundtrips
cannot catch a convention error mirrored on both sides) applied from the
start. The 2D distance table below was extracted empirically from
libwebp decode behavior (scripts/extract_vp8l_distance_table.py) and is
re-derived in the test suite, so a transcription error cannot survive.

Lossy VP8 frames are out of scope (DCT codec, needs a real library);
`decode_webp` raises NotImplementedError for them with a pointer.
"""

from __future__ import annotations

import struct

# --- bit I/O ------------------------------------------------------------------


class _BitReader:
    """LSB-first bit reader over bytes (VP8L convention)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte_pos = self.pos >> 3
            if byte_pos >= len(self.data):
                raise ValueError("vp8l: bitstream overread")
            bit = (self.data[byte_pos] >> (self.pos & 7)) & 1
            v |= bit << i
            self.pos += 1
        return v

    def read_bit(self) -> int:
        byte_pos = self.pos >> 3
        if byte_pos >= len(self.data):
            raise ValueError("vp8l: bitstream overread")
        bit = (self.data[byte_pos] >> (self.pos & 7)) & 1
        self.pos += 1
        return bit


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        """n bits of value, LSB-first."""
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """A canonical prefix code: bits MSB-first (DEFLATE convention)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# --- canonical prefix codes ---------------------------------------------------

# order in which code-length-code lengths are transmitted (spec §5.2.2)
_CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (shorter first,
    ties by symbol index) — identical to DEFLATE."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out: dict[int, tuple[int, int]] = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _HuffTree:
    """Bit-at-a-time canonical decoder. A single-symbol code (the
    'simple' 1-symbol form) decodes to that symbol consuming 0 bits."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]) -> None:
        nonzero = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not nonzero:
            raise ValueError("vp8l: empty prefix code")
        if len(nonzero) == 1:
            self.single = nonzero[0][0]
            self.table = None
            return
        self.single = None
        # completeness check (libwebp rejects over/under-subscribed codes)
        kraft = sum(1 / (1 << l) for _s, l in nonzero)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError("vp8l: incomplete prefix code")
        self.table = {
            (ln, code): sym
            for sym, (code, ln) in _canonical_codes(lengths).items()
        }

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        acc = 0
        ln = 0
        table = self.table
        for _ in range(16):
            acc = (acc << 1) | br.read_bit()
            ln += 1
            sym = table.get((ln, acc))
            if sym is not None:
                return sym
        raise ValueError("vp8l: prefix code overrun")


def _read_huffman_code(br: _BitReader, alphabet_size: int) -> _HuffTree:
    """One prefix code (spec §5.2.1/§5.2.2): simple or code-length-coded."""
    if br.read_bit():  # simple
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        if sym0 >= alphabet_size:
            raise ValueError("vp8l: simple code symbol out of range")
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[sym0] = 1  # _HuffTree treats single as 0-bit
        else:
            sym1 = br.read(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size:
                raise ValueError("vp8l: simple code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        return _HuffTree(lengths)
    # normal: code lengths themselves prefix-coded
    num_codes = br.read(4) + 4
    clcl = [0] * 19
    for i in range(num_codes):
        clcl[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_tree = _HuffTree(clcl)
    lengths = [0] * alphabet_size
    if br.read_bit():  # optional bound on transmitted symbols
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_tree.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat = br.read(2) + 3
                fill = prev_len
            elif code_len == 17:
                repeat = br.read(3) + 3
                fill = 0
            else:
                repeat = br.read(7) + 11
                fill = 0
            for _ in range(repeat):
                if symbol >= alphabet_size:
                    raise ValueError("vp8l: code length repeat overflow")
                lengths[symbol] = fill
                symbol += 1
    return _HuffTree(lengths)


# --- LZ77 prefix values and the 2D distance map -------------------------------


def _lz77_prefix_decode(code: int, br: _BitReader) -> int:
    """length/distance prefix scheme (spec §4.2.2): codes 0-3 are values
    1-4; above that, (code-2)>>1 extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_prefix_encode(value: int) -> tuple[int, int, int]:
    """Inverse of _lz77_prefix_decode: (code, extra_value, extra_bits)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    high = v.bit_length() - 1
    extra = high - 1
    code = 2 * high + ((v >> extra) & 1) - 2 + 2
    offset = (2 + ((code & 1))) << extra
    return code, value - offset - 1, extra


# The 120-entry map from small distance codes to (dx, dy) pixel offsets
# (spec §4.2.2): codes 1..120 address nearby pixels in the rows above;
# dist = dy * xsize + dx (clamped to >= 1). EXTRACTED EMPIRICALLY from
# libwebp decode behavior by scripts/extract_vp8l_distance_table.py and
# re-derived against libwebp in tests/test_vp8l.py — not transcribed
# from memory (the zstd size_format lesson).
_DIST_MAP: list[tuple[int, int]] = []  # populated below


def _plane_code_to_distance(xsize: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


def _distance_to_plane_code(xsize: int, distance: int) -> int:
    """Encoder side: linear distances only (always valid: code = d+120)."""
    return distance + 120


# --- color cache ---------------------------------------------------------------


class _ColorCache:
    __slots__ = ("bits", "vals")

    def __init__(self, bits: int) -> None:
        self.bits = bits
        self.vals = [0] * (1 << bits)

    def insert(self, argb: int) -> None:
        key = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - self.bits)
        self.vals[key] = argb

    def lookup(self, idx: int) -> int:
        return self.vals[idx]


# --- entropy-coded image (spatially coded or auxiliary) ------------------------


def _decode_image_stream(
    br: _BitReader, xsize: int, ysize: int, is_level0: bool
) -> tuple[list[int], list]:
    """Returns (pixels as ARGB uint32 row-major, transforms list) —
    transforms only read when is_level0."""
    transforms: list = []
    seen: set[int] = set()
    w = xsize
    if is_level0:
        while br.read_bit():
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("vp8l: duplicate transform")
            seen.add(ttype)
            if ttype == 0:  # PREDICTOR
                size_bits = br.read(3) + 2
                bw = _subsample_size(w, size_bits)
                bh = _subsample_size(ysize, size_bits)
                sub, _ = _decode_image_stream(br, bw, bh, False)
                transforms.append(("predictor", size_bits, sub))
            elif ttype == 1:  # COLOR
                size_bits = br.read(3) + 2
                bw = _subsample_size(w, size_bits)
                bh = _subsample_size(ysize, size_bits)
                sub, _ = _decode_image_stream(br, bw, bh, False)
                transforms.append(("color", size_bits, sub))
            elif ttype == 2:  # SUBTRACT_GREEN
                transforms.append(("subtract_green",))
            else:  # COLOR_INDEXING
                n_colors = br.read(8) + 1
                pal_raw, _ = _decode_image_stream(br, n_colors, 1, False)
                # palette entries are delta-coded component-wise
                palette = []
                prev = 0
                for p in pal_raw:
                    cur = _add_pixels(p, prev)
                    palette.append(cur)
                    prev = cur
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append(("color_indexing", width_bits, palette, w))
                w = _subsample_size(w, width_bits)
    # color cache
    cache = None
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"vp8l: color cache bits {cache_bits}")
        cache = _ColorCache(cache_bits)
    # meta prefix codes (entropy image) — spatially-coded images only
    entropy: list[int] | None = None
    huff_bits = 0
    n_groups = 1
    if is_level0 and br.read_bit():
        huff_bits = br.read(3) + 2
        ew = _subsample_size(w, huff_bits)
        eh = _subsample_size(ysize, huff_bits)
        entropy, _ = _decode_image_stream(br, ew, eh, False)
        # meta index = (red << 8) | green — 16 bits, alpha NOT included
        n_groups = max(((p >> 8) & 0xFFFF) for p in entropy) + 1
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_huffman_code(br, green_size),
                _read_huffman_code(br, 256),  # red
                _read_huffman_code(br, 256),  # blue
                _read_huffman_code(br, 256),  # alpha
                _read_huffman_code(br, 40),  # distance
            )
        )
    n_pix = w * ysize
    pixels: list[int] = [0] * n_pix
    pos = 0
    ew = _subsample_size(w, huff_bits) if entropy is not None else 0
    while pos < n_pix:
        if entropy is not None:
            x = pos % w
            y = pos // w
            gp = entropy[(y >> huff_bits) * ew + (x >> huff_bits)]
            g_t, r_t, b_t, a_t, d_t = groups[(gp >> 8) & 0xFFFF]
        else:
            g_t, r_t, b_t, a_t, d_t = groups[0]
        s = g_t.read(br)
        if s < 256:
            red = r_t.read(br)
            blue = b_t.read(br)
            alpha = a_t.read(br)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            pixels[pos] = argb
            pos += 1
            if cache is not None:
                cache.insert(argb)
        elif s < 256 + 24:
            length = _lz77_prefix_decode(s - 256, br)
            dist_code = _lz77_prefix_decode(d_t.read(br), br)
            dist = _plane_code_to_distance(w, dist_code)
            if dist > pos:
                raise ValueError("vp8l: backward reference before start")
            for _ in range(length):
                if pos >= n_pix:
                    raise ValueError("vp8l: backward reference overflow")
                argb = pixels[pos - dist]
                pixels[pos] = argb
                pos += 1
                if cache is not None:
                    cache.insert(argb)
        else:
            if cache is None:
                raise ValueError("vp8l: cache symbol without color cache")
            idx = s - 256 - 24
            pixels[pos] = cache.lookup(idx)
            pos += 1
    return pixels, transforms


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _add_pixels(a: int, b: int) -> int:
    """Per-channel modular add of two ARGB words."""
    return (
        (((a >> 24 & 0xFF) + (b >> 24 & 0xFF)) & 0xFF) << 24
        | (((a >> 16 & 0xFF) + (b >> 16 & 0xFF)) & 0xFF) << 16
        | (((a >> 8 & 0xFF) + (b >> 8 & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


# --- inverse transforms ---------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24 & 0xFF) + (b >> 24 & 0xFF)) >> 1) << 24)
        | ((((a >> 16 & 0xFF) + (b >> 16 & 0xFF)) >> 1) << 16)
        | ((((a >> 8 & 0xFF) + (b >> 8 & 0xFF)) >> 1) << 8)
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _clamp_add_subtract_full(l: int, t: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        c = _clamp((l >> shift & 0xFF) + (t >> shift & 0xFF) - (tl >> shift & 0xFF))
        out |= c << shift
    return out


def _clamp_add_subtract_half(ave: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        a = ave >> shift & 0xFF
        b = tl >> shift & 0xFF
        # (a - b) / 2 with C TRUNCATION toward zero (libwebp
        # AddSubtractComponentHalf) — floor-shift differs by 1 for
        # negative odd deltas
        d = a - b
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= _clamp(a + half) << shift
    return out


def _select(t: int, l: int, tl: int) -> int:
    p_alpha = (l >> 24 & 0xFF) + (t >> 24 & 0xFF) - (tl >> 24 & 0xFF)
    p_red = (l >> 16 & 0xFF) + (t >> 16 & 0xFF) - (tl >> 16 & 0xFF)
    p_green = (l >> 8 & 0xFF) + (t >> 8 & 0xFF) - (tl >> 8 & 0xFF)
    p_blue = (l & 0xFF) + (t & 0xFF) - (tl & 0xFF)
    pl = (
        abs(p_alpha - (l >> 24 & 0xFF))
        + abs(p_red - (l >> 16 & 0xFF))
        + abs(p_green - (l >> 8 & 0xFF))
        + abs(p_blue - (l & 0xFF))
    )
    pt = (
        abs(p_alpha - (t >> 24 & 0xFF))
        + abs(p_red - (t >> 16 & 0xFF))
        + abs(p_green - (t >> 8 & 0xFF))
        + abs(p_blue - (t & 0xFF))
    )
    # ties go to TOP (libwebp Select returns its first argument on 0)
    return l if pl < pt else t


def _apply_inverse_predictor(
    pixels: list[int], w: int, h: int, size_bits: int, sub: list[int]
) -> None:
    bw = _subsample_size(w, size_bits)
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[pos - 1]  # L
            elif x == 0:
                pred = pixels[pos - w]  # T
            else:
                mode = (sub[(y >> size_bits) * bw + (x >> size_bits)] >> 8) & 0xFF
                l = pixels[pos - 1]
                t = pixels[pos - w]
                tl = pixels[pos - w - 1]
                # TR reads the linear array with NO right-edge special
                # case (libwebp semantics): at x == w-1 this lands on the
                # current row's first pixel, already decoded in scan order
                tr = pixels[pos - w + 1]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = l
                elif mode == 2:
                    pred = t
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(l, tr), t)
                elif mode == 6:
                    pred = _avg2(l, tl)
                elif mode == 7:
                    pred = _avg2(l, t)
                elif mode == 8:
                    pred = _avg2(tl, t)
                elif mode == 9:
                    pred = _avg2(t, tr)
                elif mode == 10:
                    pred = _avg2(_avg2(l, tl), _avg2(t, tr))
                elif mode == 11:
                    pred = _select(t, l, tl)
                elif mode == 12:
                    pred = _clamp_add_subtract_full(l, t, tl)
                elif mode == 13:
                    pred = _clamp_add_subtract_half(_avg2(l, t), tl)
                else:
                    raise ValueError(f"vp8l: predictor mode {mode}")
            pixels[pos] = _add_pixels(pixels[pos], pred)


def _color_transform_delta(t: int, c: int) -> int:
    """Signed 3.5 fixed-point multiply (spec §4.1.2): both operands as
    int8."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _apply_inverse_color_transform(
    pixels: list[int], w: int, h: int, size_bits: int, sub: list[int]
) -> None:
    bw = _subsample_size(w, size_bits)
    for y in range(h):
        for x in range(w):
            cte = sub[(y >> size_bits) * bw + (x >> size_bits)]
            # ColorTransformElement packing (spec §4.1.2 / libwebp
            # ColorCodeToMultipliers): green_to_red in bits 0-7 (blue
            # channel), green_to_blue in 8-15 (green), red_to_blue in
            # 16-23 (red)
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            p = pixels[y * w + x]
            a = p >> 24 & 0xFF
            r = p >> 16 & 0xFF
            g = p >> 8 & 0xFF
            b = p & 0xFF
            r = (r + _color_transform_delta(g2r, g)) & 0xFF
            b = (b + _color_transform_delta(g2b, g)) & 0xFF
            b = (b + _color_transform_delta(r2b, r)) & 0xFF
            pixels[y * w + x] = (a << 24) | (r << 16) | (g << 8) | b


def _apply_inverse_subtract_green(pixels: list[int]) -> None:
    for i, p in enumerate(pixels):
        g = p >> 8 & 0xFF
        r = ((p >> 16 & 0xFF) + g) & 0xFF
        b = ((p & 0xFF) + g) & 0xFF
        pixels[i] = (p & 0xFF00FF00) | (r << 16) | b


def _apply_inverse_color_indexing(
    pixels: list[int], w: int, h: int, width_bits: int, palette: list[int]
) -> list[int]:
    if width_bits == 0:
        return [
            palette[(p >> 8) & 0xFF] if ((p >> 8) & 0xFF) < len(palette) else 0
            for p in pixels
        ]
    packed_w = _subsample_size(w, width_bits)
    per = 1 << width_bits  # indices per packed pixel
    ibits = 8 >> width_bits  # bits per index
    mask = (1 << ibits) - 1
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            packed = pixels[y * packed_w + (x >> width_bits)]
            green = (packed >> 8) & 0xFF
            idx = (green >> (ibits * (x % per))) & mask
            out[y * w + x] = palette[idx] if idx < len(palette) else 0
    return out


# --- top-level decode -----------------------------------------------------------


def decode_vp8l(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a VP8L chunk payload -> (width, height, ARGB row-major)."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("vp8l: bad signature byte")
    br = _BitReader(payload)
    br.pos = 8
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("vp8l: unknown version")
    pixels, transforms = _decode_image_stream(br, w, h, True)
    # inverse transforms in reverse order of appearance
    cur_w = w
    for t in transforms:
        if t[0] == "color_indexing":
            cur_w = _subsample_size(t[3], t[1])
    for t in reversed(transforms):
        if t[0] == "predictor":
            _apply_inverse_predictor(pixels, cur_w, h, t[1], t[2])
        elif t[0] == "color":
            _apply_inverse_color_transform(pixels, cur_w, h, t[1], t[2])
        elif t[0] == "subtract_green":
            _apply_inverse_subtract_green(pixels)
        elif t[0] == "color_indexing":
            pixels = _apply_inverse_color_indexing(pixels, t[3], h, t[1], t[2])
            cur_w = t[3]
    if len(pixels) != w * h:
        raise ValueError("vp8l: decoded pixel count mismatch")
    return w, h, pixels


def _system_libwebp():
    """The system libwebp via ctypes, or None. Not an installed Python
    package — an OS shared library probed at call time, same class of
    env-gate as the uproot/PIL fallbacks elsewhere. Used ONLY for the
    lossy VP8 path (a DCT codec out of pure-Python scope) and by the
    test suite for cross-validation; lossless VP8L always decodes with
    the pure-Python implementation above."""
    import ctypes

    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPFree.restype = None
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    return lib


def _decode_lossy_libwebp(blob: bytes) -> tuple[int, int, list[int]]:
    import ctypes

    lib = _system_libwebp()
    if lib is None:
        raise NotImplementedError(
            "lossy VP8 (DCT) decode needs a codec library (libwebp not "
            "found); only lossless VP8L decodes stdlib-side"
        )
    w, h = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(blob, len(blob), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise ValueError("libwebp rejected the VP8 stream")
    n = w.value * h.value * 4
    try:
        rgba = bytes(p[:n])
    finally:
        # WebPDecodeRGBA mallocs; the caller must WebPFree — this runs
        # inside long-lived mapInPandas executors, where an unfreed
        # w*h*4 per image is a native leak that OOMs the process
        lib.WebPFree(ctypes.cast(p, ctypes.c_void_p))
    return (
        w.value,
        h.value,
        [
            (rgba[i + 3] << 24)
            | (rgba[i] << 16)
            | (rgba[i + 1] << 8)
            | rgba[i + 2]
            for i in range(0, n, 4)
        ],
    )


def decode_webp(blob: bytes) -> tuple[int, int, list[int]]:
    """RIFF walk -> image chunk -> (width, height, ARGB row-major).
    Lossless VP8L decodes with the pure-Python implementation (bare and
    VP8X-extended files); lossy VP8 decodes through the system libwebp
    when present and raises NotImplementedError otherwise."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            return decode_vp8l(body)
        if tag == b"VP8 ":
            return _decode_lossy_libwebp(blob)
        pos += 8 + size + (size & 1)
    raise ValueError("WebP: no VP8L chunk found")


# --- encoder ---------------------------------------------------------------------


def _complete_lengths(symbols: list[int]) -> dict[int, int]:
    """Kraft-complete code lengths for a symbol set: with n symbols and
    k = ceil(log2 n), the first (2^k - n) get length k-1, the rest k —
    valid (not optimal), always complete, max length 9 for n <= 280."""
    n = len(symbols)
    if n == 1:
        return {symbols[0]: 1}
    k = max((n - 1).bit_length(), 1)
    deficit = (1 << k) - n
    return {s: (k - 1 if i < deficit else k) for i, s in enumerate(sorted(symbols))}


def _write_huffman_code(
    bw: _BitWriter, lengths_by_sym: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Write one prefix code; returns symbol -> (code, length) encoder map."""
    syms = sorted(lengths_by_sym)
    if len(syms) == 1 and syms[0] >= 256:
        # a lone symbol above the simple form's 8-bit range: promote to a
        # complete two-symbol code (a 1-length single entry would be
        # Kraft-incomplete and rejected by strict decoders)
        lengths_by_sym = {0: 1, syms[0]: 1}
        syms = [0, syms[0]]
    if len(syms) == 1 and syms[0] < 256:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if syms[0] < 2:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        else:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        return {syms[0]: (0, 0)}
    if len(syms) == 2 and all(s < 256 for s in syms):
        bw.write(1, 1)  # simple
        bw.write(1, 1)  # two symbols
        if syms[0] < 2:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        else:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        bw.write(syms[1], 8)
        lens = [0] * alphabet_size
        lens[syms[0]] = 1
        lens[syms[1]] = 1
        return _canonical_codes(lens)
    # normal form: code lengths via the code-length code
    lengths = [0] * alphabet_size
    for s, ln in lengths_by_sym.items():
        lengths[s] = ln
    # run-length the lengths into code-length symbols (17/18 for zero
    # runs, trailing zeros implicit)
    cl_syms: list[tuple[int, int, int]] = []  # (symbol, extra, extra_bits)
    last_nonzero = max(j for j in range(alphabet_size) if lengths[j])
    i = 0
    while i <= last_nonzero:
        if lengths[i] == 0:
            run = 1
            while i + run <= last_nonzero and lengths[i + run] == 0:
                run += 1
            rem = run
            while rem >= 11:
                chunk = min(rem, 138)
                cl_syms.append((18, chunk - 11, 7))
                rem -= chunk
            while rem >= 3:
                chunk = min(rem, 10)
                cl_syms.append((17, chunk - 3, 3))
                rem -= chunk
            for _ in range(rem):
                cl_syms.append((0, 0, 0))
            i += run
        else:
            cl_syms.append((lengths[i], 0, 0))
            i += 1
    hist: dict[int, int] = {}
    for s, _e, _b in cl_syms:
        hist[s] = hist.get(s, 0) + 1
    cl_lengths = _complete_lengths(sorted(hist))
    if len(cl_lengths) == 1:
        # the code-length tree cannot be 'simple' — give the lone symbol
        # a partner so the table is 2-symbol complete
        lone = next(iter(cl_lengths))
        partner = 0 if lone != 0 else 1
        cl_lengths = {lone: 1, partner: 1}
    full_cl = [0] * 19
    for s, ln in cl_lengths.items():
        full_cl[s] = ln
    bw.write(0, 1)  # not simple
    # emit in transmission order, trimmed to the last nonzero
    order_positions = {sym: idx for idx, sym in enumerate(_CODE_LENGTH_ORDER)}
    last_needed = max(order_positions[s] for s in range(19) if full_cl[s])
    num_codes = max(4, last_needed + 1)
    bw.write(num_codes - 4, 4)
    for idx in range(num_codes):
        bw.write(full_cl[_CODE_LENGTH_ORDER[idx]], 3)
    # the max-symbol bound is MANDATORY for trailing zeros: without it
    # the reader expects code-length ops for the whole alphabet
    n_ops = len(cl_syms)
    v = n_ops - 2
    nbits_code = 0
    while 2 + 2 * nbits_code < max(v.bit_length(), 1):
        nbits_code += 1
    bw.write(1, 1)  # use max-symbol bound
    bw.write(nbits_code, 3)
    bw.write(v, 2 + 2 * nbits_code)
    cl_codes = _canonical_codes(full_cl)
    for s, extra, ebits in cl_syms:
        code, ln = cl_codes[s]
        bw.write_code(code, ln)
        if ebits:
            bw.write(extra, ebits)
    return _canonical_codes(lengths)


def encode_vp8l(
    width: int,
    height: int,
    argb: list[int],
    use_lz77: bool = True,
) -> bytes:
    """Spec-shaped lossless encoder: no transforms, no color cache, one
    prefix-code group, optional greedy LZ77 over linear distances. Exists
    so every decode path is testable without libwebp; when libwebp IS
    present, tests assert it decodes these frames byte-exactly."""
    if len(argb) != width * height:
        raise ValueError("pixel count mismatch")
    # token stream: ('lit', argb) or ('copy', length, distance)
    tokens: list[tuple] = []
    if use_lz77:
        i = 0
        n = len(argb)
        last: dict[int, int] = {}
        while i < n:
            prev = last.get(argb[i])
            if prev is not None and i - prev <= 1024:
                length = 0
                while (
                    i + length < n
                    and length < 4096
                    and argb[prev + length] == argb[i + length]
                ):
                    length += 1
                if length >= 3:
                    tokens.append(("copy", length, i - prev))
                    for j in range(i, i + length):
                        last[argb[j]] = j
                    i += length
                    continue
            last[argb[i]] = i
            tokens.append(("lit", argb[i]))
            i += 1
    else:
        tokens = [("lit", p) for p in argb]

    g_hist: dict[int, int] = {}
    r_hist: dict[int, int] = {}
    b_hist: dict[int, int] = {}
    a_hist: dict[int, int] = {}
    d_hist: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            g_hist[(p >> 8) & 0xFF] = 1
            r_hist[(p >> 16) & 0xFF] = 1
            b_hist[p & 0xFF] = 1
            a_hist[(p >> 24) & 0xFF] = 1
        else:
            lcode, _lex, _lbits = _lz77_prefix_encode(t[1])
            dval = _distance_to_plane_code(width, t[2])
            dcode, _dex, _dbits = _lz77_prefix_encode(dval)
            g_hist[256 + lcode] = 1
            d_hist[dcode] = 1
    if not d_hist:
        d_hist[0] = 1  # the distance code must still be a valid table
    for hist in (r_hist, b_hist, a_hist):
        if not hist:
            hist[0] = 1

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if any((p >> 24) & 0xFF != 0xFF for p in argb) else 0, 1)
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # single prefix-code group
    g_codes = _write_huffman_code(bw, _complete_lengths(sorted(g_hist)), 280)
    r_codes = _write_huffman_code(bw, _complete_lengths(sorted(r_hist)), 256)
    b_codes = _write_huffman_code(bw, _complete_lengths(sorted(b_hist)), 256)
    a_codes = _write_huffman_code(bw, _complete_lengths(sorted(a_hist)), 256)
    d_codes = _write_huffman_code(bw, _complete_lengths(sorted(d_hist)), 40)
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            bw.write_code(*g_codes[(p >> 8) & 0xFF])
            bw.write_code(*r_codes[(p >> 16) & 0xFF])
            bw.write_code(*b_codes[p & 0xFF])
            bw.write_code(*a_codes[(p >> 24) & 0xFF])
        else:
            lcode, lex, lbits = _lz77_prefix_encode(t[1])
            bw.write_code(*g_codes[256 + lcode])
            if lbits:
                bw.write(lex, lbits)
            dval = _distance_to_plane_code(width, t[2])
            dcode, dex, dbits = _lz77_prefix_encode(dval)
            bw.write_code(*d_codes[dcode])
            if dbits:
                bw.write(dex, dbits)
    payload = bw.finish()
    return _riff_wrap(payload)


def _riff_wrap(vp8l_payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    if len(vp8l_payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# --- the extracted 2D distance map (see module docstring) ----------------------

# derived by scripts/extract_vp8l_distance_table.py from libwebp decode
# behavior (two-width probe, exact solve) and re-derived in
# tests/test_vp8l.py when libwebp is present — (dx, dy) per code 1..120,
# one byte per entry as dy * 17 + (dx + 8) (dx spans 17 values, so a
# nibble split would overflow at dx = 8)
_DIST_MAP_PACKED = (
    "19091a182a0a2b291b172c283b0b3c3a1c163d392d274c0c4d4b1d153e384e4a2e"
    "265d4f493f370d5e5c1e145f5b2f255048605a40366e0e6f6d1f13706c30246159"
    "5147716b41357f0f807e62582012726a5246817d3123827c4234736963571083"
    "7b53452132746843847a645654857975676586787687"
)


def _unpack_dist_map(packed: str) -> list[tuple[int, int]]:
    data = bytes.fromhex(packed)
    return [((b % 17) - 8, b // 17) for b in data]


_DIST_MAP.extend(_unpack_dist_map(_DIST_MAP_PACKED))
