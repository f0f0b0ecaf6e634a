"""Lossless WebP (VP8L) codec: self round-trips over every encoder mode,
cross-validation BOTH directions against the system libwebp (ctypes,
skipped when absent), empirical re-derivation of the 2D distance table,
and the multimodal decode_image / probe_media integration.

The libwebp-encoded corpus is chosen so real-encoder features all fire:
photo-like images (predictor + color transforms + subtract-green +
color cache + meta prefix groups), palette images at every packed
width (2/4/13/200 colors), noise (no transforms), alpha, and edge
geometries (1x1, 1xN, Nx1)."""

import ctypes
import math
import random

import pytest

from bambooanalysis_spark.operators import vp8lcodec as V


def _libwebp():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ]
    return lib


def _lw_decode(lib, frame):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(frame, len(frame), ctypes.byref(w), ctypes.byref(h))
    if not p:
        return None
    return w.value, h.value, bytes(p[: w.value * h.value * 4])


def _lw_encode(lib, rgba, w, h):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lib.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    return bytes(out[:n])


def _rgba_to_argb(rgba):
    return [
        (rgba[i + 3] << 24) | (rgba[i] << 16) | (rgba[i + 1] << 8) | rgba[i + 2]
        for i in range(0, len(rgba), 4)
    ]


def _argb_to_rgba(argb):
    return b"".join(
        bytes([(p >> 16) & 255, (p >> 8) & 255, p & 255, (p >> 24) & 255])
        for p in argb
    )


def _noise(w, h, seed=9, opaque=True):
    rnd = random.Random(seed)
    return bytes(
        x
        for i in range(w * h)
        for x in (
            rnd.randrange(256), rnd.randrange(256), rnd.randrange(256),
            255 if opaque else 128 + (i % 127),
        )
    )


def _gradient(w, h):
    return bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in (
            (x * 255) // max(w - 1, 1),
            (y * 255) // max(h - 1, 1),
            ((x + y) * 255) // max(w + h - 2, 1),
            255,
        )
    )


def _palette(w, h, ncol, seed=5):
    rnd = random.Random(seed)
    cols = [
        (rnd.randrange(256), rnd.randrange(256), rnd.randrange(256), 255)
        for _ in range(ncol)
    ]
    return bytes(x for i in range(w * h) for x in cols[(i * 7 + i // w) % ncol])


def _photo(w, h, seed=9):
    rnd = random.Random(seed)
    out = bytearray()
    for y in range(h):
        for x in range(w):
            r = int(128 + 100 * math.sin(x / 7) + rnd.randrange(8))
            g = int(128 + 100 * math.sin(y / 9) + rnd.randrange(8))
            b = int(128 + 60 * math.sin((x + y) / 11) + rnd.randrange(8))
            out += bytes(
                [max(0, min(255, r)), max(0, min(255, g)), max(0, min(255, b)), 255]
            )
    return bytes(out)


_CASES = {
    "noise": (32, 24, _noise(32, 24)),
    "gradient": (64, 64, _gradient(64, 64)),
    "pal2": (40, 30, _palette(40, 30, 2)),
    "pal4": (40, 30, _palette(40, 30, 4)),
    "pal13": (40, 30, _palette(40, 30, 13)),
    "pal200": (50, 40, _palette(50, 40, 200)),
    "photo": (96, 80, _photo(96, 80)),
    "photo_odd": (97, 81, _photo(97, 81)),
    "alpha": (48, 32, _noise(48, 32, opaque=False)),
    "tiny": (1, 1, bytes([7, 8, 9, 255])),
    "tall": (1, 64, _gradient(1, 64)),
    "wide": (500, 2, _photo(500, 2)),
}


def test_vp8l_self_roundtrip_all_modes():
    for name, (w, h, rgba) in _CASES.items():
        px = _rgba_to_argb(rgba)
        for lz in (False, True):
            frame = V.encode_vp8l(w, h, px, use_lz77=lz)
            ww, hh, out = V.decode_webp(frame)
            assert (ww, hh, out) == (w, h, px), (name, lz)


def test_vp8l_decodes_real_libwebp_frames():
    """Byte-exact decode of frames produced by REAL libwebp — exercises
    predictor/color/subtract-green transforms, color cache, meta prefix
    groups, and every packed palette width, none of which the in-repo
    encoder emits (the zstd self-roundtrip lesson)."""
    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp.so.7 unavailable")
    for name, (w, h, rgba) in _CASES.items():
        frame = _lw_encode(lib, rgba, w, h)
        ww, hh, argb = V.decode_webp(frame)
        assert (ww, hh) == (w, h), name
        assert argb == _rgba_to_argb(rgba), name


def test_vp8l_encoder_output_readable_by_real_libwebp():
    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp.so.7 unavailable")
    for name, (w, h, rgba) in _CASES.items():
        px = _rgba_to_argb(rgba)
        for lz in (False, True):
            frame = V.encode_vp8l(w, h, px, use_lz77=lz)
            got = _lw_decode(lib, frame)
            assert got is not None, (name, lz)
            assert got == (w, h, rgba), (name, lz)


def test_vp8l_distance_table_matches_libwebp():
    """Re-derive the 120-entry 2D distance map from libwebp decode
    behavior and assert the shipped constant matches — the table is
    empirical, never transcribed."""
    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp.so.7 unavailable")
    import scripts.extract_vp8l_distance_table as X

    assert X.derive_table(lib) == V._DIST_MAP


def test_vp8l_decode_image_and_probe_integration():
    from bambooanalysis_spark.operators.multimodal import decode_image, probe_media

    w, h, rgba = _CASES["gradient"]
    frame = V.encode_vp8l(w, h, _rgba_to_argb(rgba))
    ww, hh, pix = decode_image(frame)
    assert (ww, hh) == (w, h)
    assert pix[0] == (rgba[0], rgba[1], rgba[2])
    meta = probe_media(frame)
    assert meta["format"] == "webp"
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["codec"] == "vp8l"


def test_vp8l_error_paths():
    with pytest.raises(ValueError, match="WebP"):
        V.decode_webp(b"RIFF\x00\x00\x00\x00WAVE")
    frame = bytearray(V.encode_vp8l(2, 2, [0xFF000000] * 4))
    frame[20] = 0x30  # signature byte
    with pytest.raises(ValueError, match="signature"):
        V.decode_webp(bytes(frame))
    # truncated payload fails loudly
    good = V.encode_vp8l(16, 16, _rgba_to_argb(_noise(16, 16)))
    with pytest.raises(ValueError):
        V.decode_webp(good[:30])


def test_lossy_vp8_via_system_libwebp():
    """Lossy VP8 routes through the system libwebp when present (env-gated
    like the uproot/PIL paths — no pure-Python DCT codec in scope)."""
    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp.so.7 unavailable")
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ]
    w, h, rgba = _CASES["photo"]
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lib.WebPEncodeRGBA(rgba, w, h, w * 4, 80.0, ctypes.byref(out))
    frame = bytes(out[:n])
    assert b"VP8 " in frame[:20]
    ww, hh, argb = V.decode_webp(frame)
    assert (ww, hh) == (w, h)
    # lossy: bounded error, not exactness — PSNR over the RGB channels
    exp = _rgba_to_argb(rgba)
    se = 0
    for e, g in zip(exp, argb):
        for s in (16, 8, 0):
            d = ((e >> s) & 0xFF) - ((g >> s) & 0xFF)
            se += d * d
    mse = se / (len(exp) * 3)
    psnr = 10 * math.log10(255 * 255 / mse) if mse else 99
    assert psnr > 30, psnr


def test_vp8l_property_random_images_via_libwebp():
    """Property sweep: random images across sizes/alpha/palette-ness
    encoded by REAL libwebp decode byte-exactly here. Catches transform
    interactions the fixed corpus misses (seeded, deterministic)."""
    lib = _libwebp()
    if lib is None:
        pytest.skip("libwebp.so.7 unavailable")
    rnd = random.Random(20260815)
    for trial in range(25):
        w = rnd.randint(1, 70)
        h = rnd.randint(1, 70)
        kind = rnd.randrange(4)
        if kind == 0:  # full noise + alpha
            rgba = bytes(rnd.randrange(256) for _ in range(w * h * 4))
        elif kind == 1:  # small palette
            ncol = rnd.randint(1, 12)
            cols = [bytes(rnd.randrange(256) for _ in range(3)) + b"\xff"
                    for _ in range(ncol)]
            rgba = b"".join(cols[rnd.randrange(ncol)] for _ in range(w * h))
        elif kind == 2:  # smooth ramps (predictor/color transforms)
            rgba = bytes(
                v for y in range(h) for x in range(w)
                for v in ((x * 3 + y) & 255, (x + y * 5) & 255,
                          (x * 2 ^ y) & 255, 255)
            )
        else:  # repetitive tiles (LZ77 + color cache)
            tile = bytes(rnd.randrange(256) for _ in range(16))
            rgba = (tile * ((w * h * 4) // 16 + 1))[: w * h * 4]
        frame = _lw_encode(lib, rgba, w, h)
        ww, hh, argb = V.decode_webp(frame)
        assert (ww, hh) == (w, h), (trial, w, h, kind)
        exp = _rgba_to_argb(rgba)
        if argb != exp:
            # libwebp's encoder zeroes RGB under fully-transparent pixels
            # (documented encoder optimization) — accept only that
            for e, g in zip(exp, argb):
                if e != g:
                    assert (e >> 24) == 0 and (g & 0xFFFFFF) == 0, (
                        trial, w, h, kind, hex(e), hex(g)
                    )
