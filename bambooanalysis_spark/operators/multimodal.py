"""Multimodal (binary) column plumbing.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct alongside. The Spark-side machinery — schema, Arrow-batched
``mapInPandas``, partition sizing — is real and tested; the actual codec
step is STUBBED (``NotImplementedError``) because media libraries are not
in this environment, with a deterministic fake used by tests and the
driver's correctness gate.

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
    """Real codec entry point. Round 4 de-stubs the uncompressed 24-bit
    BMP case with a pure-stdlib decoder (struct unpacking of the
    BITMAPFILEHEADER/BITMAPINFOHEADER layout + bottom-up padded BGR rows —
    public format, no codec library needed): returns
    (width, height, row-major top-down [(r, g, b), ...]). Every other
    format still needs a real library (PIL/cv2, unavailable in this
    environment) and raises NotImplementedError; tests fall back to
    fake_decode_meta for those."""
    if blob[:2] == b"BM":
        return _decode_bmp24(blob)
    raise NotImplementedError(
        "only uncompressed 24-bit BMP decodes stdlib-side; other formats "
        "require a codec library (use fake_decode_meta for the "
        "deterministic test path)"
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
                except (NotImplementedError, ValueError):
                    # non-BMP formats AND malformed/truncated BMPs both
                    # degrade to the marked fake path — one bad blob must
                    # not kill a corpus-wide job
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
