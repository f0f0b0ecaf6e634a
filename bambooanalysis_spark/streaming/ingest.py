"""Streaming training-data ingestion — the composed pipeline a continuous
crawl feed runs (Spark-native extension; the reference is batch-only).

One `readStream` in, one `writeStream` out:

    raw document files (parquet dir, arriving continuously)
      -> quality gate (Gopher-style text stats as Column exprs, JVM-side)
         — FIRST, so rejected docs never enter dedup state and a gated-out
         early copy cannot claim a fingerprint a later good copy needs
      -> fingerprint (per-row md5, zero shuffle)
      -> streaming exact dedup (applyInPandasWithState keyed on fp —
         sharded, checkpointable state; one tiny record per distinct doc)
      -> append sink (parquet), ready for sampling/packing

Every stage is the SAME operator the batch path uses (operators/text,
streaming/stateful), so batch reprocessing and the live stream cannot
drift: tests/test_extensions.py::test_streaming_ingest_pipeline_matches_batch
replays the identical files through both and compares row sets.

At 100 TB/day the scale levers are the standard Structured Streaming
ones: `maxFilesPerTrigger` bounds batch size, dedup state shards on the
fp shuffle, and the quality gate runs before the sink so rejected rows
never hit storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import text as T
from .stateful import streaming_exact_dedup


def quality_mask(text: F.Column, min_words: int = 5, max_words: int = 100_000):
    """The streaming-safe quality gate: pure Column exprs (no state, no
    UDF). Word-count bounds plus an alphabetic-ratio floor — the cheap
    Gopher-style prefilter a crawl pipeline applies before anything
    expensive."""
    words = F.size(T.tokens(text))
    alpha_ratio = (
        F.length(F.regexp_replace(text, r"[^A-Za-z]", "")) /
        F.greatest(F.length(text), F.lit(1))
    )
    return (words >= min_words) & (words <= max_words) & (alpha_ratio > 0.5)


def ingest_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
) -> DataFrame:
    """Streaming transformation graph: (id, text, ...) stream in ->
    deduped, quality-gated (id, fp) stream out. The caller owns source
    and sink (readStream/writeStream + checkpointLocation); this function
    is pure plan construction so the identical graph runs on a batch
    DataFrame for reprocessing."""
    gated = docs.where(quality_mask(F.col(text_col), min_words=min_words))
    with_fp = gated.select(
        F.col(id_col).alias("doc_id"),
        T.fingerprint(F.col(text_col)).alias("fp"),
    )
    if not docs.isStreaming:
        # batch reprocessing path: identical semantics via the batch
        # min-id representative (streaming's latest-emission-per-fp)
        return with_fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return streaming_exact_dedup(with_fp)
