"""Multimodal (binary) column plumbing.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct alongside. The Spark-side machinery — schema, Arrow-batched
``mapInPandas``, partition sizing — is real and tested. Codec status:

- REAL, pure-stdlib/-numpy: BMP 24-bit decode/encode (round 4); PNG
  gray/palette/RGB/RGBA decode + RGB encode, 8/16-bit, sequential and
  Adam7 (rounds 5+7); JPEG baseline + progressive (rounds 6+7,
  operators/jpegcodec.py); GIF first-frame LZW (round 7); WAV PCM +
  G.711 mu-law/A-law + IMA ADPCM sample decode (rounds 5+7); and
  ``probe_media`` — header-level format/dimension/duration metadata for
  PNG/JPEG/GIF/BMP/WAV/WebP/MP4 containers (struct parsing of the public
  formats, no codec library).
- REAL as of round 8: lossless WebP (VP8L) pixel decode
  (operators/vp8lcodec.py — full transform/color-cache/meta-code
  feature set, cross-validated both directions against the system
  libwebp via ctypes).
- STUBBED (``NotImplementedError``) with a clearly-marked deterministic
  fake: lossy-WebP (VP8)/video pixel decode and perceptual audio
  (MP3/AAC) — these need PIL/cv2/ffmpeg, which are not installable in
  this environment.

At 100 TB: blobs ride in their own column so Parquet column pruning skips
them unless asked for; decode runs in ``mapInPandas`` with Arrow batches
(vectorized transfer, one Python worker per core, no shuffle), and outputs
only small metadata/feature columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as STY

BLOB_META_SCHEMA = STY.StructType(
    [
        STY.StructField("doc_id", STY.LongType()),
        STY.StructField("n_bytes", STY.LongType()),
        STY.StructField("md5_hex", STY.StringType()),
        STY.StructField("fake_width", STY.LongType()),
        STY.StructField("fake_height", STY.LongType()),
    ]
)


def attach_blob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate a multimodal table: utf-8 bytes of the text as the opaque
    payload column (stand-in for image bytes)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
    )


def decode_image(blob: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Real codec entry point. Round 4 de-stubbed uncompressed 24-bit BMP;
    round 5 adds PNG (8-bit gray/palette/RGB/RGBA, non-interlaced) — both
    pure-stdlib decoders from the public format specs (BMP: struct
    unpacking of BITMAPFILEHEADER/BITMAPINFOHEADER + bottom-up padded BGR
    rows; PNG: chunk walk, zlib-inflated IDAT, per-scanline unfiltering
    per RFC 2083 §6). Returns (width, height, row-major top-down
    [(r, g, b), ...]); PNG alpha is dropped, gray/palette expanded to RGB.
    Round 6 adds baseline JPEG (operators/jpegcodec.py: full huffman
    entropy decode + numpy IDCT, generic 4:4:4/4:2:0/4:2:2/grayscale
    sampling, restart markers); round 7 adds progressive (SOF2: spectral
    selection + successive approximation, EOB runs) through the same
    dispatch — lossy, so JPEG-decoded pixels feed PSNR-bounded tests
    rather than bit-exact oracles. Round 7 also extends PNG to 16-bit
    samples (high-byte downscale) and Adam7 interlacing, and adds GIF
    (first frame: real LZW, 4-pass interlace, palette). Round 8 adds
    lossless WebP (VP8L: prefix codes, LZ77 + 2D distances, color
    cache, all four transforms — operators/vp8lcodec.py, alpha dropped
    like PNG) and PNG sub-byte depths (1/2/4-bit gray + palette); lossy
    VP8 routes through the system libwebp when present. Remaining
    formats (arithmetic-coded JPEG, video) need a real library (PIL/cv2,
    unavailable in this environment) and raise NotImplementedError;
    tests fall back to fake_decode_meta for those, and probe_media
    still reads their header metadata."""
    if blob[:2] == b"BM":
        return _decode_bmp24(blob)
    if blob[:8] == _PNG_MAGIC:
        return _decode_png(blob)
    if blob[:2] == b"\xff\xd8":
        from bambooanalysis_spark.operators.jpegcodec import decode_jpeg

        return decode_jpeg(blob)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(blob)
    if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        # round 8: lossless VP8L decodes fully stdlib-side
        # (operators/vp8lcodec.py, cross-validated against libwebp);
        # lossy VP8 still raises inside decode_webp
        from bambooanalysis_spark.operators.vp8lcodec import decode_webp

        w, h, argb = decode_webp(blob)
        return w, h, [
            ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF) for p in argb
        ]
    raise NotImplementedError(
        "only BMP/PNG/JPEG (baseline + progressive)/GIF/lossless-WebP "
        "decode stdlib-side; other formats require a codec library (use "
        "fake_decode_meta for the deterministic test path)"
    )


def _decode_bmp24(blob: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    import struct as _struct

    if len(blob) < 54:
        raise ValueError("truncated BMP header")
    data_off = _struct.unpack_from("<I", blob, 10)[0]
    hdr_size, width, height, planes, bpp, compression = _struct.unpack_from(
        "<IiihHI", blob, 14
    )
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if width <= 0 or height == 0:
        raise ValueError(f"invalid BMP dimensions {width}x{height}")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = height < 0
    height = abs(height)
    row_bytes = (width * 3 + 3) // 4 * 4
    if len(blob) < data_off + row_bytes * height:
        raise ValueError("truncated BMP pixel data")
    rows = []
    for r in range(height):
        src_row = r if top_down else height - 1 - r
        off = data_off + src_row * row_bytes
        row = blob[off : off + width * 3]
        # BGR on disk -> (r, g, b)
        rows.extend((row[i + 2], row[i + 1], row[i]) for i in range(0, width * 3, 3))
    return width, height, rows


def encode_bmp24(
    width: int, height: int, pixels: list[tuple[int, int, int]]
) -> bytes:
    """Minimal BMP writer (bottom-up, 24-bit, BI_RGB) — the test-side
    counterpart of _decode_bmp24; also handy for generating fixture
    blobs."""
    import struct as _struct

    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height row-major top-down")
    row_pad = b"\x00" * ((4 - (width * 3) % 4) % 4)
    body = bytearray()
    for r in range(height - 1, -1, -1):  # bottom-up
        for c in range(width):
            pr, pg, pb = pixels[r * width + c]
            body += bytes((pb, pg, pr))
        body += row_pad
    data_off = 14 + 40
    header = b"BM" + _struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    dib = _struct.pack(
        "<IiihHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + dib + bytes(body)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunks(blob: bytes):
    """Walk PNG chunks: yields (type, payload). Stops at IEND/truncation."""
    import struct as _struct

    pos = 8
    while pos + 8 <= len(blob):
        ln, typ = _struct.unpack_from(">I4s", blob, pos)
        payload = blob[pos + 8 : pos + 8 + ln]
        yield typ, payload
        if typ == b"IEND":
            return
        pos += 12 + ln  # length + type + data + crc


def _gif_lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    """GIF-variant LZW (GIF89a spec appendix): variable code width
    starting at min_code_size+1, little-endian bit packing, Clear resets
    the dictionary, End-Of-Information terminates; dictionary caps at 12
    bits (width stops growing until the next Clear)."""
    clear = 1 << min_code_size
    end = clear + 1
    val = int.from_bytes(data, "little")
    pos = 0
    total = len(data) * 8

    def fresh():
        return {i: [i] for i in range(clear)}

    table = fresh()
    width = min_code_size + 1
    out: list[int] = []
    prev: list[int] | None = None
    next_code = end + 1
    while pos + width <= total:
        code = (val >> pos) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = fresh()
            width = min_code_size + 1
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError(f"GIF LZW code {code} out of sequence")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError(
            f"GIF LZW stream ended at {len(out)} of {n_pixels} pixels"
        )
    return out[:n_pixels]


def _decode_gif(blob: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """First frame of a GIF87a/89a to RGB (public spec): logical screen
    descriptor, global/local color tables, extension-block skip, LZW
    image data from 255-byte sub-blocks, 4-pass interlace reorder.
    Transparency is ignored (the first frame is rendered opaque)."""
    import struct as _struct

    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    try:
        return _decode_gif_body(blob)
    except (IndexError, _struct.error) as e:
        raise ValueError(f"truncated GIF: {e}") from None


def _decode_gif_body(blob: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    import struct as _struct

    sw, sh, flags, _bg, _ar = _struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = blob[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(blob):
        b = blob[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b:02x}")
        x0, y0, w, h, iflags = _struct.unpack_from("<HHHHB", blob, pos + 1)
        pos += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            ct = blob[pos : pos + 3 * n]
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image with no color table")
        interlaced = bool(iflags & 0x40)
        min_code = blob[pos]
        pos += 1
        data = bytearray()
        while blob[pos] != 0:
            ln = blob[pos]
            data += blob[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = _gif_lzw_decode(min_code, bytes(data), w * h)
        if interlaced:
            rows = [idx[r * w : (r + 1) * w] for r in range(h)]
            ordered: list[list[int] | None] = [None] * h
            src_r = 0
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                for y in range(start, h, step):
                    ordered[y] = rows[src_r]
                    src_r += 1
            idx = [v for row in ordered for v in row]  # type: ignore[union-attr]
        px = [
            (ct[3 * v], ct[3 * v + 1], ct[3 * v + 2])
            if 3 * v + 2 < len(ct)
            else (0, 0, 0)
            for v in idx
        ]
        return w, h, px
    raise ValueError("GIF has no image block")


def encode_gif(
    width: int, height: int, pixels: list[tuple[int, int, int]],
    interlaced: bool = False,
) -> bytes:
    """Minimal GIF89a writer (single frame, global color table built from
    the distinct pixel colors — max 256, real LZW with dictionary growth)
    — the fixture counterpart of _decode_gif."""
    import struct as _struct

    colors = sorted(set(pixels))
    if len(colors) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    cbits = max(1, (len(colors) - 1).bit_length())
    cmap = {c: i for i, c in enumerate(colors)}
    table_n = 1 << cbits
    ct = bytearray()
    for c in colors:
        ct += bytes(c)
    ct += b"\x00" * (3 * (table_n - len(colors)))

    idx = [cmap[p] for p in pixels]
    if interlaced:
        rows = [idx[r * width : (r + 1) * width] for r in range(height)]
        seq: list[int] = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            for y in range(start, height, step):
                seq.extend(rows[y])
        idx = seq

    # LZW encode with dictionary growth (12-bit cap, Clear on overflow)
    min_code = max(2, cbits)
    clear = 1 << min_code
    end = clear + 1
    out_bits: list[tuple[int, int]] = []
    width_b = min_code + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    out_bits.append((clear, width_b))
    cur: tuple[int, ...] = ()
    for v in idx:
        cand = cur + (v,)
        if cand in table:
            cur = cand
            continue
        out_bits.append((table[cur], width_b))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width_b) and width_b < 12:
            width_b += 1
        elif next_code > 4095:
            out_bits.append((clear, width_b))
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width_b = min_code + 1
        cur = (v,)
    if cur:
        out_bits.append((table[cur], width_b))
    out_bits.append((end, width_b))
    acc = 0
    nbits = 0
    for v, nb in out_bits:
        acc |= v << nbits
        nbits += nb
    stream = acc.to_bytes((nbits + 7) // 8, "little")

    out = bytearray(b"GIF89a")
    out += _struct.pack("<HHBBB", width, height, 0x80 | (cbits - 1), 0, 0)
    out += ct
    out += b"\x2c" + _struct.pack(
        "<HHHHB", 0, 0, width, height, 0x40 if interlaced else 0
    )
    out.append(min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# Adam7 interlace pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_defilter(raw: bytes, pos: int, width_px: int, height: int,
                  bpp: int, stride: int | None = None) -> tuple[list[bytearray], int]:
    """Undo per-scanline filters (0 None, 1 Sub, 2 Up, 3 Average,
    4 Paeth) for one (sub-)image of ``height`` rows of ``width_px``
    pixels at ``bpp`` bytes/pixel; returns the rows and the new offset.
    The Sub/Average/Paeth left-neighbor distance is ``bpp`` BYTES — this
    is what makes the same code correct for 16-bit samples. Sub-byte
    depths pass ``stride`` explicitly (ceil(w*depth/8) bytes) with
    bpp=1: the spec filters at the byte level there."""
    if stride is None:
        stride = width_px * bpp
    if len(raw) < pos + height * (stride + 1):
        raise ValueError("PNG truncated pixel data")
    rows: list[bytearray] = []
    prev = bytearray(stride)
    for _r in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG invalid filter type {ftype}")
        prev = line
        rows.append(line)
    return rows, pos


def _png_row_pixels(line: bytearray, ctype: int, depth: int,
                    plte: bytes | None) -> list[tuple[int, int, int]]:
    """One defiltered scanline -> RGB triples. 16-bit samples downscale
    to 8 by taking the high byte (the standard 16->8 conversion); alpha
    is dropped; gray expands; palette indexes into PLTE."""
    step = depth // 8
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    bpp = nch * step
    out: list[tuple[int, int, int]] = []
    for i in range(0, len(line), bpp):
        if ctype == 2 or ctype == 6:
            out.append((line[i], line[i + step], line[i + 2 * step]))
        elif ctype == 0 or ctype == 4:
            out.append((line[i], line[i], line[i]))
        else:  # palette (depth 8 only; guarded by caller)
            v = line[i]
            out.append((plte[3 * v], plte[3 * v + 1], plte[3 * v + 2]))
    return out


def _png_subbyte_row_pixels(
    line: bytearray, ctype: int, depth: int, plte: bytes | None, width: int
) -> list[tuple[int, int, int]]:
    """Sub-byte scanline (depth 1/2/4, ctype 0 gray or 3 palette) -> RGB:
    samples pack MSB-first within each byte (PNG spec §7.2); trailing
    padding bits in the last byte are dropped. Gray values scale to
    0..255 by v * 255 / (2^depth - 1) — exact for these depths."""
    per = 8 // depth
    mask = (1 << depth) - 1
    maxval = mask
    out: list[tuple[int, int, int]] = []
    for x in range(width):
        byte = line[x // per]
        shift = 8 - depth * (x % per + 1)
        v = (byte >> shift) & mask
        if ctype == 0:
            g = v * 255 // maxval
            out.append((g, g, g))
        else:
            if plte is None or 3 * v + 2 >= len(plte):
                raise ValueError("PNG palette index out of range")
            out.append((plte[3 * v], plte[3 * v + 1], plte[3 * v + 2]))
    return out


def _decode_png(blob: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Pure-stdlib PNG decode (RFC 2083): depths 1/2/4 (gray + palette,
    MSB-first packed samples — round 8), 8 and 16 (high-byte downscale),
    color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
    6 (RGBA); interlace 0 (sequential) and 1 (Adam7 — seven
    independently-filtered sub-images merged onto the pass grid).
    IDAT chunks concatenate into one zlib stream; each scanline starts
    with a filter byte undone bytewise at the bytes-per-pixel distance
    (1 byte for sub-byte depths, per spec)."""
    import struct as _struct
    import zlib as _zlib

    ihdr = plte = None
    idat = bytearray()
    for typ, payload in _png_chunks(blob):
        if typ == b"IHDR":
            ihdr = _struct.unpack(">IIBBBBB", payload[:13])
        elif typ == b"PLTE":
            plte = payload
        elif typ == b"IDAT":
            idat += payload
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if nch is None:
        raise ValueError(f"PNG invalid color type {ctype}")
    subbyte = depth in (1, 2, 4)
    if (
        (depth not in (8, 16) and not subbyte)
        or (depth == 16 and ctype == 3)
        or (subbyte and ctype not in (0, 3))
        or interlace not in (0, 1)
        or comp != 0
        or filt != 0
    ):
        raise NotImplementedError(
            f"PNG depth={depth} ctype={ctype} interlace={interlace}: "
            "stdlib decoder handles 1/2/4-bit gray+palette and "
            "8/16-bit all color types, sequential or Adam7"
        )
    if ctype == 3 and plte is None:
        raise ValueError("PNG palette image missing PLTE")
    bpp = max(nch * (depth // 8), 1)

    def _stride(width_px: int) -> int | None:
        return (width_px * depth + 7) // 8 if subbyte else None

    def _pixels(line: bytearray, width_px: int) -> list[tuple[int, int, int]]:
        if subbyte:
            return _png_subbyte_row_pixels(line, ctype, depth, plte, width_px)
        return _png_row_pixels(line, ctype, depth, plte)

    raw = _zlib.decompress(bytes(idat))
    if interlace == 0:
        rows, _pos = _png_defilter(raw, 0, w, h, bpp, _stride(w))
        px: list[tuple[int, int, int]] = []
        for line in rows:
            px.extend(_pixels(line, w))
        return w, h, px
    # Adam7: de-filter each pass sub-image, scatter onto the full grid
    grid: list[list[tuple[int, int, int] | None]] = [
        [None] * w for _ in range(h)
    ]
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        rows, pos = _png_defilter(raw, pos, pw, ph, bpp, _stride(pw))
        for j, line in enumerate(rows):
            y = y0 + j * dy
            for i, p in enumerate(_pixels(line, pw)):
                grid[y][x0 + i * dx] = p
    px = []
    for row in grid:
        if any(p is None for p in row):
            raise ValueError("PNG Adam7 grid incomplete (corrupt passes)")
        px.extend(row)  # type: ignore[arg-type]
    return w, h, px


def encode_png(
    width: int, height: int, pixels: list[tuple[int, int, int]], level: int = 6,
    bit_depth: int = 8, interlace: int = 0,
) -> bytes:
    """Minimal PNG writer (RGB, filter 0) — the test-side counterpart of
    _decode_png and the fixture generator for the multimodal contract
    query. ``bit_depth=16`` widens each 8-bit sample to v*257 (the exact
    8->16 expansion, so the decoder's high-byte downscale round-trips
    bit-identically); ``interlace=1`` serializes the seven Adam7 pass
    sub-images in pass order, each row filter-0."""
    import struct as _struct
    import zlib as _zlib

    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height row-major top-down")
    if bit_depth not in (8, 16) or interlace not in (0, 1):
        raise ValueError("bit_depth must be 8/16, interlace 0/1")

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            _struct.pack(">I", len(payload))
            + typ
            + payload
            + _struct.pack(">I", _zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    def sample(v: int) -> bytes:
        return bytes([v]) if bit_depth == 8 else _struct.pack(">H", v * 257)

    raw = bytearray()
    if interlace == 0:
        for r in range(height):
            raw.append(0)  # filter: None
            for c in range(width):
                for v in pixels[r * width + c]:
                    raw += sample(v)
    else:
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            for j in range(ph):
                raw.append(0)
                y = y0 + j * dy
                for i in range(pw):
                    for v in pixels[y * width + x0 + i * dx]:
                        raw += sample(v)
    ihdr = _struct.pack(">IIBBBBB", width, height, bit_depth, 2, 0, 0, interlace)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(bytes(raw), level))
        + chunk(b"IEND", b"")
    )


def probe_media(blob: bytes) -> dict | None:
    """Header-level metadata for common media containers — pure struct
    parsing of the public formats, NO codec needed (the 100 TB point:
    format/dimension/duration filters run over every blob cheaply; full
    decode is reserved for the rows that survive). Returns a dict with
    ``format`` plus whatever the container declares (width/height for
    images, channels/sample_rate/bits/n_frames for WAV audio,
    duration_ms for MP4), or None for unrecognized bytes.

    Formats: PNG (IHDR), JPEG (SOF0-15 marker walk), GIF (logical screen),
    BMP (DIB header), WAV (RIFF fmt/data chunks), WebP (VP8X canvas),
    MP4/ISO-BMFF (moov/mvhd timescale+duration)."""
    import struct as _struct

    try:
        if blob[:8] == _PNG_MAGIC:
            for typ, payload in _png_chunks(blob):
                if typ == b"IHDR" and len(payload) >= 13:
                    w, h, depth, ctype = _struct.unpack(">IIBB", payload[:10])
                    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype, 0)
                    return {"format": "png", "width": w, "height": h,
                            "bit_depth": depth, "channels": nch}
            return None
        if blob[:2] == b"\xff\xd8":  # JPEG SOI; walk to a frame header
            pos = 2
            while pos + 4 <= len(blob):
                if blob[pos] != 0xFF:
                    pos += 1
                    continue
                marker = blob[pos + 1]
                if marker == 0xFF:  # legal fill byte before a marker
                    pos += 1
                    continue
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    pos += 2
                    continue
                seglen = _struct.unpack_from(">H", blob, pos + 2)[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    depth, h, w, nch = _struct.unpack_from(">BHHB", blob, pos + 4)
                    return {"format": "jpeg", "width": w, "height": h,
                            "bit_depth": depth, "channels": nch}
                pos += 2 + seglen
            return None
        if blob[:6] in (b"GIF87a", b"GIF89a"):
            w, h = _struct.unpack_from("<HH", blob, 6)
            return {"format": "gif", "width": w, "height": h}
        if blob[:2] == b"BM" and len(blob) >= 26:
            w, h = _struct.unpack_from("<ii", blob, 18)
            depth = _struct.unpack_from("<H", blob, 28)[0] if len(blob) >= 30 else 0
            return {"format": "bmp", "width": w, "height": abs(h),
                    "bit_depth": depth}
        if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
            pos, meta = 12, {"format": "wav"}
            while pos + 8 <= len(blob):
                cid = blob[pos : pos + 4]
                ln = _struct.unpack_from("<I", blob, pos + 4)[0]
                if cid == b"fmt " and ln >= 16:
                    _fmt, nch, rate, _bps, align, bits = _struct.unpack_from(
                        "<HHIIHH", blob, pos + 8
                    )
                    meta.update(channels=nch, sample_rate=rate, bit_depth=bits,
                                block_align=align)
                elif cid == b"data":
                    meta["data_bytes"] = ln
                pos += 8 + ln + (ln & 1)
            if "block_align" in meta and meta.get("block_align") and "data_bytes" in meta:
                meta["n_frames"] = meta["data_bytes"] // meta["block_align"]
            return meta
        if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
            if blob[12:16] == b"VP8X" and len(blob) >= 30:
                w = 1 + int.from_bytes(blob[24:27], "little")
                h = 1 + int.from_bytes(blob[27:30], "little")
                return {"format": "webp", "width": w, "height": h}
            if blob[12:16] == b"VP8L" and len(blob) >= 25 and blob[20] == 0x2F:
                # lossless header: 14-bit (w-1), 14-bit (h-1), LSB-first
                bits = int.from_bytes(blob[21:25], "little")
                return {
                    "format": "webp",
                    "codec": "vp8l",
                    "width": (bits & 0x3FFF) + 1,
                    "height": ((bits >> 14) & 0x3FFF) + 1,
                }
            return {"format": "webp"}
        if len(blob) >= 12 and blob[4:8] == b"ftyp":  # ISO-BMFF (MP4 family)
            meta = {"format": "mp4",
                    "brand": blob[8:12].decode("ascii", "replace")}

            def walk(start: int, end: int, want: bytes):
                # returns (payload_start, payload_end) of the first `want`
                # box; handles the two alternate size encodings real-world
                # MP4s use — size==1 (64-bit largesize follows the type)
                # and size==0 (box extends to end of container)
                pos = start
                while pos + 8 <= end:
                    size = _struct.unpack_from(">I", blob, pos)[0]
                    typ = blob[pos + 4 : pos + 8]
                    hdr = 8
                    if size == 1:
                        if pos + 16 > end:
                            return None
                        size = _struct.unpack_from(">Q", blob, pos + 8)[0]
                        hdr = 16
                    elif size == 0:
                        size = end - pos
                    if size < hdr:
                        return None
                    if typ == want:
                        return (pos + hdr, pos + min(size, end - pos))
                    pos += size
                return None

            moov = walk(0, len(blob), b"moov")
            if moov is not None:
                mvhd = walk(moov[0], moov[1], b"mvhd")
                if mvhd is not None:
                    p = mvhd[0]  # fullbox payload: version(1) + flags(3)
                    ver = blob[p]
                    if ver == 1:
                        scale, dur = _struct.unpack_from(">IQ", blob, p + 20)
                    else:
                        scale, dur = _struct.unpack_from(">II", blob, p + 12)
                    if scale:
                        meta.update(timescale=scale,
                                    duration_ms=dur * 1000 // scale)
            return meta
        mp3 = _probe_mp3(blob)
        if mp3 is not None:
            return mp3
    except (IndexError, _struct.error):
        return None
    return None


# MPEG-1/2/2.5 Layer I-III frame header tables (ISO/IEC 11172-3 /
# 13818-3): bitrate kbps by (version-group, layer, index) and sample
# rates by version. Free-format (index 0) and bad (15) report None.
_MP3_BITRATES = {
    # MPEG-1
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    # MPEG-2 / 2.5 share one table per layer group
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATES = {3: [44100, 48000, 32000],   # version bits 11 = MPEG-1
              2: [22050, 24000, 16000],   # 10 = MPEG-2
              0: [11025, 12000, 8000]}    # 00 = MPEG-2.5


def _probe_mp3(blob: bytes) -> dict | None:
    """MP3 (MPEG audio) header probe: skip an ID3v2 tag (syncsafe size),
    find the 11-bit frame sync, and report version/layer/bitrate/sample
    rate/channel mode plus a CBR duration estimate from the audio byte
    count. Header-only — no entropy decode (perceptual audio decode
    remains library-bound; see module docstring)."""
    pos = 0
    if blob[:3] == b"ID3" and len(blob) >= 10:
        size = (
            (blob[6] & 0x7F) << 21 | (blob[7] & 0x7F) << 14
            | (blob[8] & 0x7F) << 7 | (blob[9] & 0x7F)
        )
        pos = 10 + size
        if blob[5] & 0x10:
            pos += 10  # ID3v2.4 footer flag: a 10-byte '3DI' trailer
    # the sync must appear at the post-tag position (arbitrary byte scans
    # false-positive on random blobs — this is a probe, not a recoverer)
    if pos + 4 > len(blob) or blob[pos] != 0xFF or (blob[pos + 1] & 0xE0) != 0xE0:
        return None
    b1, b2, b3 = blob[pos + 1], blob[pos + 2], blob[pos + 3]
    ver_bits = (b1 >> 3) & 3
    layer_bits = (b1 >> 1) & 3
    if ver_bits == 1 or layer_bits == 0:
        return None  # reserved
    layer = 4 - layer_bits  # bits 11/10/01 -> layers 1/2/3
    version = {3: "1", 2: "2", 0: "2.5"}[ver_bits]
    group = 1 if ver_bits == 3 else 2
    bitrate_idx = (b2 >> 4) & 0xF
    rate_idx = (b2 >> 2) & 3
    if bitrate_idx in (0, 15) or rate_idx == 3:
        return None
    bitrate = _MP3_BITRATES[(group, layer)][bitrate_idx]
    sample_rate = _MP3_RATES[ver_bits][rate_idx]
    mode = (b3 >> 6) & 3
    meta = {
        "format": "mp3",
        "mpeg_version": version,
        "layer": layer,
        "bitrate_kbps": bitrate,
        "sample_rate": sample_rate,
        "channels": 1 if mode == 3 else 2,
        "duration_ms": (len(blob) - pos) * 8 // bitrate,  # CBR estimate
    }
    return meta


# --- G.711 companding + IMA ADPCM (round-7: compressed-audio de-stub) -------
# ITU-T G.711 (mu-law / A-law) and the IMA/DVI ADPCM algorithm are public
# specifications; tables and bit algebra below follow them directly.

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ulaw_to_lin(b: int) -> int:
    b = ~b & 0xFF
    v = (((b & 0xF) << 3) + 0x84) << ((b >> 4) & 7)
    v -= 0x84
    return -v if b & 0x80 else v


def _alaw_to_lin(b: int) -> int:
    b ^= 0x55
    exp = (b >> 4) & 7
    mant = b & 0xF
    v = (mant << 4) + 8 if exp == 0 else ((mant << 4) + 0x108) << (exp - 1)
    # A-law sign convention is inverted vs mu-law: bit 7 SET = positive
    return v if b & 0x80 else -v


def _ima_step(pred: int, idx: int, nib: int) -> tuple[int, int]:
    """One IMA ADPCM nibble -> (new predictor, new index)."""
    step = _IMA_STEPS[idx]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX[nib & 7]))
    return pred, idx


def _decode_ima_adpcm(data: bytes, nch: int, block_align: int) -> list[int]:
    """IMA ADPCM WAV payload -> interleaved 16-bit samples. Per block and
    channel: a 4-byte header (initial sample i16le, step index, reserved)
    that IS the first output sample, then nibble data — mono packs two
    nibbles per byte low-first; stereo interleaves 4-byte (8-nibble)
    groups per channel."""
    import struct as _struct

    out: list[int] = []
    for bstart in range(0, len(data) - (len(data) % block_align or 0), block_align):
        block = data[bstart : bstart + block_align]
        if len(block) < 4 * nch:
            break
        states = []
        chans: list[list[int]] = []
        for c in range(nch):
            pred, idx = _struct.unpack_from("<hB", block, 4 * c)[0], block[4 * c + 2]
            if idx > 88:
                raise ValueError(f"IMA ADPCM step index {idx} > 88")
            states.append((pred, idx))
            chans.append([pred])
        body = block[4 * nch :]
        if nch == 1:
            pred, idx = states[0]
            for byte in body:
                for nib in (byte & 0xF, byte >> 4):
                    pred, idx = _ima_step(pred, idx, nib)
                    chans[0].append(pred)
        else:
            for g in range(0, len(body) - (len(body) % (4 * nch)), 4 * nch):
                for c in range(nch):
                    pred, idx = states[c]
                    for byte in body[g + 4 * c : g + 4 * c + 4]:
                        for nib in (byte & 0xF, byte >> 4):
                            pred, idx = _ima_step(pred, idx, nib)
                            chans[c].append(pred)
                    states[c] = (pred, idx)
        n = min(len(ch) for ch in chans)
        for i in range(n):
            for c in range(nch):
                out.append(chans[c][i])
    return out


def decode_wav(blob: bytes) -> tuple[int, int, int, list[int]]:
    """Pure-stdlib WAV decode (RIFF/WAVE fmt+data chunks): returns
    (channels, sample_rate, bits, interleaved int samples). Handles the
    uncompressed cases (16-bit signed / 8-bit unsigned PCM, wFormatTag
    1) and, round-7, the classic compressed telephony/game codecs whose
    algorithms are public specs: G.711 mu-law (tag 7) and A-law (tag 6)
    -> 16-bit linear, and IMA/DVI ADPCM (tag 0x11) block decode.
    Perceptual codecs (MP3/AAC inside WAV) still raise
    NotImplementedError — they need a real audio library."""
    import struct as _struct

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        ln = _struct.unpack_from("<I", blob, pos + 4)[0]
        if cid == b"fmt ":
            fmt = blob[pos + 8 : pos + 8 + ln]
        elif cid == b"data":
            data = blob[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError(f"WAV fmt chunk truncated ({len(fmt)} < 16 bytes)")
    tag, nch, rate, _bps, align, bits = _struct.unpack_from("<HHIIHH", fmt, 0)
    if tag == 1:
        if bits == 16:
            samples = list(
                _struct.unpack(f"<{len(data) // 2}h", data[: len(data) // 2 * 2])
            )
        elif bits == 8:
            samples = [b - 128 for b in data]  # 8-bit PCM is unsigned
        else:
            raise NotImplementedError(
                f"PCM bit depth {bits} not supported (8/16 only)"
            )
        return nch, rate, bits, samples
    if tag == 7:  # G.711 mu-law
        return nch, rate, 16, [_ulaw_to_lin(b) for b in data]
    if tag == 6:  # G.711 A-law
        return nch, rate, 16, [_alaw_to_lin(b) for b in data]
    if tag == 0x11:  # IMA / DVI ADPCM
        if align < 4 * nch:
            raise ValueError(f"IMA ADPCM block align {align} < header size")
        return nch, rate, 16, _decode_ima_adpcm(data, nch, align)
    raise NotImplementedError(
        f"WAV wFormatTag={tag} needs a real audio library "
        "(PCM/mu-law/A-law/IMA-ADPCM decode stdlib-side)"
    )


def encode_wav_ima_adpcm(
    channels: int, rate: int, samples: list[int], samples_per_block: int = 505
) -> bytes:
    """IMA ADPCM WAV writer (wFormatTag 0x11) — the fixture counterpart
    of the round-7 decode path, using the standard quantize-then-update
    encoder (each nibble is decoded back into the predictor so encoder
    and decoder states stay locked). Lossy by design: tests bound SNR,
    not bit equality. ``samples_per_block`` must be odd (header sample +
    2 nibbles/byte)."""
    import struct as _struct

    if samples_per_block % 2 == 0:
        raise ValueError("samples_per_block must be odd")
    if len(samples) % channels:
        raise ValueError("samples must be a multiple of channels")
    per = [samples[c::channels] for c in range(channels)]
    n = len(per[0])
    block_align = 4 * channels + (samples_per_block - 1) // 2 * channels
    blocks = bytearray()
    for start in range(0, n, samples_per_block):
        chunk_len = min(samples_per_block, n - start)
        states = []
        nibbles: list[list[int]] = [[] for _ in range(channels)]
        for c in range(channels):
            first = per[c][start]
            states.append((first, 0))
            blocks += _struct.pack("<hBB", first, 0, 0)
        for i in range(1, samples_per_block):
            for c in range(channels):
                target = per[c][start + i] if i < chunk_len else states[c][0]
                pred, idx = states[c]
                step = _IMA_STEPS[idx]
                diff = target - pred
                nib = 8 if diff < 0 else 0
                if diff < 0:
                    diff = -diff
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                states[c] = _ima_step(pred, idx, nib)
                nibbles[c].append(nib)
        if channels == 1:
            for i in range(0, len(nibbles[0]), 2):
                blocks.append(nibbles[0][i] | (nibbles[0][i + 1] << 4))
        else:
            for g in range(0, len(nibbles[0]), 8):
                for c in range(channels):
                    grp = nibbles[c][g : g + 8]
                    for i in range(0, 8, 2):
                        blocks.append(grp[i] | (grp[i + 1] << 4))
    fmt = _struct.pack(
        "<HHIIHHHH",
        0x11,
        channels,
        rate,
        rate * block_align // samples_per_block,
        block_align,
        4,
        2,  # cbSize
        samples_per_block,
    )
    return (
        b"RIFF" + _struct.pack("<I", 28 + len(fmt) + len(blocks)) + b"WAVE"
        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(blocks)) + bytes(blocks)
    )


def encode_wav16(channels: int, rate: int, samples: list[int]) -> bytes:
    """Minimal 16-bit PCM WAV writer — test/fixture counterpart of
    decode_wav."""
    import struct as _struct

    data = _struct.pack(f"<{len(samples)}h", *samples)
    align = channels * 2
    return (
        b"RIFF" + _struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + _struct.pack("<I", 16)
        + _struct.pack("<HHIIHH", 1, channels, rate, rate * align, align, 16)
        + b"data" + _struct.pack("<I", len(data)) + data
    )


AUDIO_FEATURES_SCHEMA = STY.StructType(
    [
        STY.StructField("doc_id", STY.LongType()),
        STY.StructField("channels", STY.LongType()),
        STY.StructField("sample_rate", STY.LongType()),
        STY.StructField("bits", STY.LongType()),
        STY.StructField("n_samples", STY.LongType()),
        STY.StructField("peak_abs", STY.LongType()),
        STY.StructField("sum_sq", STY.LongType()),
        STY.StructField("real_decode", STY.BooleanType()),
    ]
)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Arrow-batched audio feature stage over (doc_id, blob): REAL PCM
    decode (decode_wav) into integer loudness features — exact bigints
    (peak |sample|, sum of squares), so downstream quality filters and the
    contract oracle are bit-reproducible. Non-PCM/undecodable blobs
    degrade to a marked row (real_decode=false, zeroed features) instead
    of failing the corpus job."""
    import struct as _struct

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                try:
                    nch, rate, bits, samples = decode_wav(b)
                    peak = max((abs(s) for s in samples), default=0)
                    ssq = sum(s * s for s in samples)
                    out.append(
                        (int(doc_id), nch, rate, bits, len(samples), peak, ssq, True)
                    )
                except (NotImplementedError, ValueError, _struct.error):
                    out.append((int(doc_id), 0, 0, 0, 0, 0, 0, False))
            yield pd.DataFrame(
                out,
                columns=["doc_id", "channels", "sample_rate", "bits",
                         "n_samples", "peak_abs", "sum_sq", "real_decode"],
            )

    return df.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def fake_decode_meta(blob: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: fake (width, height) derived from
    the payload hash — stable across engines and runs."""
    h = hashlib.md5(blob).digest()
    return 64 + h[0] % 64, 64 + h[1] % 64


def frame_sample(
    df: DataFrame, frame_size: int = 16, stride: int = 4
) -> DataFrame:
    """Video-style frame sampling over an opaque blob: chunk the payload
    into fixed-size byte frames and keep every ``stride``-th one. The
    chunk/stride selection is REAL plumbing (pure binary Column exprs,
    JVM-side, zero shuffle, no Python) — only per-frame decode needs a
    codec. Output: (doc_id, frame_idx, n_bytes, frame, frame_md5).

    At 100 TB the point is that frame selection happens BEFORE any decode
    or Python transfer: a stride-4 sample moves 25% of the bytes into the
    expensive stage instead of decoding everything and discarding.
    """
    blob = F.col("blob")
    n_frames = F.ceil(F.length(blob) / F.lit(frame_size)).cast("int")
    # guard: sequence(0, -1) would produce a DESCENDING ramp for empty blobs
    idxs = F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.array().cast("array<int>")
    )
    sampled = F.filter(idxs, lambda i: i % stride == 0)
    frames = F.transform(
        sampled,
        lambda i: F.struct(
            i.alias("idx"),
            blob.substr(i * frame_size + 1, F.lit(frame_size)).alias("frame"),
        ),
    )
    return df.select(
        "doc_id", F.explode(frames).alias("__f")
    ).select(
        "doc_id",
        F.col("__f.idx").alias("frame_idx"),
        F.length(F.col("__f.frame")).cast("long").alias("n_bytes"),
        F.col("__f.frame").alias("frame"),
        F.md5(F.col("__f.frame")).alias("frame_md5"),
    )


FRAME_FEATURES_SCHEMA = STY.StructType(
    [
        STY.StructField("doc_id", STY.LongType()),
        STY.StructField("frame_idx", STY.IntegerType()),
        STY.StructField("byte_mean_e4", STY.LongType()),
        STY.StructField("byte_max", STY.LongType()),
    ]
)


def extract_frame_features(frames: DataFrame) -> DataFrame:
    """Per-frame feature extraction — the Arrow-batched stage where a real
    pipeline would decode pixels and pool activations. The feature here is
    a deterministic byte statistic (mean*1e4, max) so the full path stays
    testable without codec libraries; swap the inner function for a real
    decode when one is available (decode_image raises until then)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                (int(sum(b) * 10000 // len(b)), int(max(b))) if len(b) else (0, 0)
                for b in pdf["frame"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "frame_idx": pdf["frame_idx"].astype("int32"),
                    "byte_mean_e4": pd.Series([m for m, _ in feats], dtype="int64"),
                    "byte_max": pd.Series([x for _, x in feats], dtype="int64"),
                }
            )

    return frames.select("doc_id", "frame_idx", "frame").mapInPandas(
        run, FRAME_FEATURES_SCHEMA
    )


IMAGE_META_SCHEMA = STY.StructType(
    [
        STY.StructField("doc_id", STY.LongType()),
        STY.StructField("n_bytes", STY.LongType()),
        STY.StructField("width", STY.LongType()),
        STY.StructField("height", STY.LongType()),
        STY.StructField("mean_r_e4", STY.LongType()),
        STY.StructField("mean_g_e4", STY.LongType()),
        STY.StructField("mean_b_e4", STY.LongType()),
        STY.StructField("real_decode", STY.BooleanType()),
    ]
)


def extract_image_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched decode stage over (doc_id, blob) with the REAL stdlib
    BMP codec: width/height/channel means come from actual pixel data for
    BMP blobs (real_decode=true); other formats fall back to the
    deterministic fake dims with zeroed means (real_decode=false) until a
    codec library is available. Integer 1e-4 fixed-point means keep the
    output engine-exact. Same 100 TB shape as extract_blob_meta: blobs
    stay in their pruned column, Python sees Arrow batches, the output is
    metadata-sized."""
    import struct as _struct
    import zlib as _zlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                try:
                    w, h, px = decode_image(b)
                    n = max(len(px), 1)
                    sums = [0, 0, 0]
                    for p in px:
                        sums[0] += p[0]
                        sums[1] += p[1]
                        sums[2] += p[2]
                    out.append(
                        (int(doc_id), len(b), w, h,
                         sums[0] * 10000 // n, sums[1] * 10000 // n,
                         sums[2] * 10000 // n, True)
                    )
                except (NotImplementedError, ValueError, IndexError,
                        _struct.error, _zlib.error):
                    # unsupported formats AND malformed blobs (truncated
                    # headers -> struct.error, bad deflate streams ->
                    # zlib.error, out-of-palette indexes -> IndexError)
                    # all degrade to the marked fake path — one bad blob
                    # must not kill a corpus-wide job
                    w, h = fake_decode_meta(b)
                    out.append((int(doc_id), len(b), w, h, 0, 0, 0, False))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_bytes", "width", "height",
                    "mean_r_e4", "mean_g_e4", "mean_b_e4", "real_decode",
                ],
            )

    return df.mapInPandas(run, IMAGE_META_SCHEMA)


MEDIA_PROBE_SCHEMA = STY.StructType(
    [
        STY.StructField("doc_id", STY.LongType()),
        STY.StructField("format", STY.StringType()),
        STY.StructField("width", STY.LongType()),
        STY.StructField("height", STY.LongType()),
        STY.StructField("bit_depth", STY.LongType()),
        STY.StructField("channels", STY.LongType()),
        STY.StructField("sample_rate", STY.LongType()),
        STY.StructField("n_frames", STY.LongType()),
        STY.StructField("duration_ms", STY.LongType()),
    ]
)


def extract_media_probe(df: DataFrame) -> DataFrame:
    """Arrow-batched header probe over (doc_id, blob): real container
    metadata (probe_media) for every recognized format, NULL fields where
    a container doesn't declare them, format=NULL for unrecognized bytes.
    This is the triage stage a 100 TB multimodal pipeline runs FIRST —
    cheap struct parsing per blob, no decode, output metadata-sized — so
    dimension/duration/format filters prune before any codec work."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["format", "width", "height", "bit_depth", "channels",
                "sample_rate", "n_frames", "duration_ms"]
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                m = probe_media(bytes(blob)) or {}
                out.append([int(doc_id)] + [m.get(c) for c in cols])
            yield pd.DataFrame(out, columns=["doc_id"] + cols)

    return df.mapInPandas(run, MEDIA_PROBE_SCHEMA)


def extract_blob_meta(df: DataFrame) -> DataFrame:
    """mapInPandas over (doc_id, blob): the Arrow-batched Python path a real
    decode/feature-extract stage would use. Emits only small columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            wh = [fake_decode_meta(b) for b in blobs]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": blobs.map(len).astype("int64"),
                    "md5_hex": blobs.map(lambda b: hashlib.md5(b).hexdigest()),
                    "fake_width": pd.Series([w for w, _ in wh], dtype="int64"),
                    "fake_height": pd.Series([h for _, h in wh], dtype="int64"),
                }
            )

    return df.mapInPandas(run, BLOB_META_SCHEMA)
