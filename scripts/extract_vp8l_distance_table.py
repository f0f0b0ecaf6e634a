"""Extract VP8L's 120-entry 2D distance-code table from libwebp behavior.

The spec maps distance codes 1..120 to (dx, dy) neighbor offsets with
dist = dy * xsize + dx. Rather than transcribing the table from the spec
text (the zstd size_format lesson: transcription errors mirrored into a
matching decoder survive self-round-trips), this script DERIVES it: for
each code k it hand-crafts a VP8L stream containing one length-1
backward reference with distance code k after a run of all-distinct
literal pixels, decodes the frame with the system libwebp (ctypes), and
reads off which pixel was copied. Two image widths (17 and 29) give two
linear equations per code, so (dx, dy) is solved exactly:

    dist_w = dy * w + dx   =>   dy = (d29 - d17) / 12, dx = d17 - 17*dy

Output: the packed hex string for vp8lcodec._DIST_MAP_PACKED (one byte
per entry: dy * 17 + (dx + 8); dx spans 17 values so a nibble split
would overflow). tests/test_vp8l.py re-runs this derivation when
libwebp is present and asserts the shipped constant matches, so the
table can never drift from real-decoder behavior.
"""

from __future__ import annotations

import ctypes
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bambooanalysis_spark.operators import vp8lcodec as V  # noqa: E402


def _libwebp():
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
    return lib


def _decode(lib, frame: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(frame, len(frame), ctypes.byref(w), ctypes.byref(h))
    if not p:
        return None
    n = w.value * h.value * 4
    return w.value, h.value, bytes(p[:n])


def _probe_frame(width: int, height: int, ref_pos: int, dist_code: int) -> bytes:
    """A VP8L frame: ref_pos distinct literals, one length-1 copy with the
    raw distance value dist_code (<= 120 -> 2D mapped), then literals."""
    n = width * height
    pixels = [0xFF000000 | ((i + 1) * 2654435761 & 0xFFFFFF) for i in range(n)]
    tokens: list[tuple] = [("lit", pixels[i]) for i in range(ref_pos)]
    tokens.append(("rawcopy", 1, dist_code))
    tokens += [("lit", pixels[i]) for i in range(ref_pos + 1, n)]

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
            lcode, _, _ = V._lz77_prefix_encode(t[1])
            dcode, _, _ = V._lz77_prefix_encode(t[2])
            g_hist[256 + lcode] = 1
            d_hist[dcode] = 1

    bw = V._BitWriter()
    bw.write(0x2F, 8)
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # single group
    g_codes = V._write_huffman_code(bw, V._complete_lengths(sorted(g_hist)), 280)
    r_codes = V._write_huffman_code(bw, V._complete_lengths(sorted(r_hist)), 256)
    b_codes = V._write_huffman_code(bw, V._complete_lengths(sorted(b_hist)), 256)
    a_codes = V._write_huffman_code(bw, V._complete_lengths(sorted(a_hist)), 256)
    d_codes = V._write_huffman_code(bw, V._complete_lengths(sorted(d_hist)), 40)
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            bw.write_code(*g_codes[(p >> 8) & 0xFF])
            bw.write_code(*r_codes[(p >> 16) & 0xFF])
            bw.write_code(*b_codes[p & 0xFF])
            bw.write_code(*a_codes[(p >> 24) & 0xFF])
        else:
            lcode, lex, lbits = V._lz77_prefix_encode(t[1])
            bw.write_code(*g_codes[256 + lcode])
            if lbits:
                bw.write(lex, lbits)
            dcode, dex, dbits = V._lz77_prefix_encode(t[2])
            bw.write_code(*d_codes[dcode])
            if dbits:
                bw.write(dex, dbits)
    return V._riff_wrap(bw.finish())


def derive_table(lib) -> list[tuple[int, int]]:
    dists: dict[int, dict[int, int]] = {17: {}, 29: {}}
    for width in (17, 29):
        height = 24
        ref_pos = width * 12 + width // 2
        n = width * height
        pixels = [0xFF000000 | ((i + 1) * 2654435761 & 0xFFFFFF) for i in range(n)]
        rgba_of = {
            pixels[i]: i for i in range(n)
        }
        for code in range(1, 121):
            frame = _probe_frame(width, height, ref_pos, code)
            got = _decode(lib, frame)
            assert got is not None, f"libwebp rejected probe code={code} w={width}"
            _, _, rgba = got
            off = ref_pos * 4
            argb = (
                (rgba[off + 3] << 24)
                | (rgba[off] << 16)
                | (rgba[off + 1] << 8)
                | rgba[off + 2]
            )
            src = rgba_of[argb]
            dists[width][code] = ref_pos - src
    table = []
    for code in range(1, 121):
        d17, d29 = dists[17][code], dists[29][code]
        dy = (d29 - d17) // 12
        dx = d17 - 17 * dy
        assert d29 == dy * 29 + dx, (code, d17, d29)
        table.append((dx, dy))
    return table


def main() -> None:
    lib = _libwebp()
    if lib is None:
        print("libwebp.so.7 not found", file=sys.stderr)
        sys.exit(1)
    table = derive_table(lib)
    packed = bytes(dy * 17 + (dx + 8) for dx, dy in table).hex()
    print(packed)


if __name__ == "__main__":
    main()
