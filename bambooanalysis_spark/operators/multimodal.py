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


def decode_image(blob: bytes) -> "object":
    """Real codec entry point — requires an image library (PIL/cv2) that is
    not available in this environment."""
    raise NotImplementedError(
        "image decoding requires a codec library; use fake_decode_meta for "
        "the deterministic test path"
    )


def fake_decode_meta(blob: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: fake (width, height) derived from
    the payload hash — stable across engines and runs."""
    h = hashlib.md5(blob).digest()
    return 64 + h[0] % 64, 64 + h[1] % 64


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
