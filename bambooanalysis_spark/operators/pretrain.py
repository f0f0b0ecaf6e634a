"""Training-set preparation operators: benchmark decontamination,
sequence packing, and pattern redaction.

These are the stages a pretraining pipeline runs AFTER cleaning/dedup
(operators/text.py, operators/dedup.py) and BEFORE tokenizer sharding:
remove documents that leak evaluation data, lay documents out into
fixed-length context windows, and scrub PII-like spans.

Scale shapes (the 100 TB contract for this module):
- decontamination joins on an 8-byte gram hash, never gram text, and the
  benchmark side is eval-suite-sized (thousands of documents), so it
  broadcasts; the corpus side never shuffles at all in the broadcast
  regime — the flag is computed scan-side.
- packing needs a global prefix sum, which a bare
  ``Window.orderBy(id)`` would serialize onto ONE task. The classic
  two-phase form is used instead: per-bucket running sums in parallel,
  then a metadata-sized per-bucket offset table (one row per bucket —
  the only single-partition window runs over THAT, like the IVF
  centroid codebook) broadcast back. Wall-clock scales with
  corpus/buckets, not corpus.
- redaction is pure per-row regexp (zero shuffle); patterns are written
  in the RE2-compatible subset of Java regex (no lookarounds) so the
  DuckDB oracles replicate them byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _barrier
from .similarity import _maybe_broadcast
from .text import hash64, shingles_from_tokens, token_count, tokens


# --- benchmark decontamination ----------------------------------------------

def ngram_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, gram_h): one row per DISTINCT word-n-gram per document, as a
    62-bit md5-derived hash. ``array_distinct`` collapses within-document
    repeats per-row BEFORE the explode, so the exploded stream (the only
    thing that can reach a shuffle) is already document-deduplicated."""
    staged = _barrier(df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t")))
    return staged.select(
        id_col,
        F.explode(
            F.array_distinct(shingles_from_tokens(F.col("__t"), n))
        ).alias("__g"),
    ).select(id_col, hash64(F.col("__g")).alias("gram_h"))


def contamination_hits(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast_limit: int = 4_000_000,
) -> DataFrame:
    """(id, n_hit_grams): training documents sharing at least one word
    n-gram with the benchmark corpus, with the count of distinct shared
    grams. The standard eval-leakage test (13-gram in public pipeline
    writeups; n is a parameter).

    Join key is the hash (8 bytes), not the gram text; the benchmark gram
    set is distinct-ed (eval suites are tiny next to the corpus) and
    broadcast when provably small, so the corpus side is scan-only."""
    bench = ngram_hashes(benchmark, id_col, text_col, n).select("gram_h").distinct()
    corpus = ngram_hashes(train, id_col, text_col, n)
    return (
        corpus.join(_maybe_broadcast(bench, broadcast_limit), "gram_h")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_grams"))
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast_limit: int = 4_000_000,
) -> DataFrame:
    """Training corpus minus every document flagged by
    ``contamination_hits`` — a left anti-join on the id."""
    hits = contamination_hits(train, benchmark, id_col, text_col, n, broadcast_limit)
    return train.join(hits.select(id_col), id_col, "left_anti")


# --- sequence packing --------------------------------------------------------

def running_token_layout(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_width: int = 4096,
) -> DataFrame:
    """(id, n_tokens, tok_start): each document's token count and its
    starting offset in the infinite token stream formed by concatenating
    all documents in ascending id order — the distributed prefix sum.

    Phase 1 partitions on ``floor(id / bucket_width)`` — a MONOTONE
    function of the sort key, so buckets are contiguous id ranges and
    within-bucket running sums are independent (for non-numeric keys,
    sample range boundaries first; the algebra is identical). Phase 2
    cumulates the per-bucket totals: one row per bucket, so the
    single-partition window there touches corpus/bucket_width rows —
    metadata, not data. Phase 3 joins the offsets back with no forced
    hint: AQE broadcasts the bucket table while it is small and falls
    back to a shuffle join when corpus/bucket_width itself outgrows the
    threshold (a forced hint would pin an unbounded broadcast)."""
    b = F.floor(F.col(id_col) / bucket_width).alias("__b")
    d = docs.select(F.col(id_col), token_count(F.col(text_col)).alias("n_tokens"), b)

    w_in = (
        Window.partitionBy("__b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("__cum_in", F.sum("n_tokens").over(w_in))

    totals = d.groupBy("__b").agg(F.sum("n_tokens").alias("__tot"))
    w_b = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "__b", (F.sum("__tot").over(w_b) - F.col("__tot")).alias("__off")
    )

    return (
        d.join(offsets, "__b")
        .select(
            id_col,
            "n_tokens",
            (F.col("__off") + F.col("__cum_in") - F.col("n_tokens")).alias(
                "tok_start"
            ),
        )
    )


def pack_sequences(
    docs: DataFrame,
    context_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_width: int = 4096,
) -> DataFrame:
    """Concat-and-chunk packing (the standard pretraining layout: join all
    documents into one token stream, slice into ``context_len`` windows):
    (id, n_tokens, tok_start, pack_first, pack_last, n_packs) — which
    context windows each document lands in. Empty documents occupy zero
    tokens and sit wholly in the pack where their offset falls."""
    laid = running_token_layout(docs, id_col, text_col, bucket_width)
    tok_end = F.col("tok_start") + F.col("n_tokens")
    pack_first = F.floor(F.col("tok_start") / context_len)
    pack_last = F.greatest(pack_first, F.floor((tok_end - 1) / context_len))
    return laid.select(
        id_col,
        "n_tokens",
        "tok_start",
        pack_first.cast("long").alias("pack_first"),
        pack_last.cast("long").alias("pack_last"),
        (pack_last - pack_first + 1).cast("long").alias("n_packs"),
    )


# --- pattern redaction -------------------------------------------------------

# RE2-compatible Java regex (no lookarounds): portable to the DuckDB oracle.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "url": (r"https?://[^\s]+", "<URL>"),
    "number": (r"[0-9][0-9 .,-]{5,}[0-9]", "<NUM>"),
}


def redact(
    docs: DataFrame,
    patterns: dict[str, tuple[str, str]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text_redacted, n_<label>...): text with every pattern match
    replaced by its placeholder, plus a per-pattern match count. Patterns
    apply in dict order, each over the PREVIOUS pattern's output (so
    counts are of spans surviving earlier rules). Pure per-row Column
    expressions — zero shuffle, stays in whole-stage codegen."""
    patterns = PII_PATTERNS if patterns is None else patterns
    out: Column = F.col(text_col)
    counts = []
    for label, (pat, repl) in patterns.items():
        counts.append(
            F.size(F.regexp_extract_all(out, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{label}")
        )
        out = F.regexp_replace(out, pat, repl)
    return docs.select(F.col(id_col), out.alias("text_redacted"), *counts)


def fuzzy_decontaminate(
    docs: DataFrame,
    benchmarks: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 8,
    shingle_k: int = 2,
) -> DataFrame:
    """NEAR-duplicate decontamination: drop corpus docs sharing >= 1
    MinHash-LSH band with ANY benchmark document — catches paraphrased /
    lightly-edited eval contamination that exact n-gram decontamination
    (``decontaminate``) misses. Same deterministic md5-derived signature
    machinery as the dedup family, so the result is bit-reproducible.

    Scale shape: the benchmark side is eval-set-sized, so its distinct
    band-key set is BROADCAST; the corpus pays one per-row signature pass
    (zero shuffle) + a broadcast semi-join + the final anti-join on ids.
    Docs too short to shingle never band (sentinel guard) and are kept."""
    from .dedup import (
        _barrier,
        _fan_out,
        hashed_shingles,
        lsh_band_keys,
        minhash_signature_from_hashes,
    )
    from .text import shingles

    rows = k // bands

    def banded(df: DataFrame) -> DataFrame:
        # fan out on narrow local scans so the fused shingle+hash stage
        # uses the cluster, not the scan's 1-2 splits (r11, guide §2.5)
        src = _fan_out(
            df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text")),
            "__id",
        )
        # shingling + hashing fused into ONE stage (r11): a HOF's input
        # argument is evaluated once (only lambda bodies lack CSE), so
        # the intermediate shingle-string array never materializes —
        # see minhash_lsh_pairs
        staged = _barrier(
            src.withColumn(
                "__hsh", hashed_shingles(shingles(F.col("__text"), shingle_k))
            )
        )
        staged = _barrier(
            staged.withColumn(
                "__sig", minhash_signature_from_hashes(F.col("__hsh"), k)
            )
        )
        return staged.select(
            "__id",
            F.explode(
                F.when(
                    F.try_element_at(F.col("__sig"), F.lit(1)) != -1,
                    lsh_band_keys(F.col("__sig"), bands, rows),
                )
            ).alias("band_key"),
        )

    bench_keys = banded(benchmarks).select("band_key").distinct()
    flagged = (
        banded(docs)
        .join(F.broadcast(bench_keys), "band_key", "left_semi")
        .select(F.col("__id").alias(id_col))
        .distinct()
    )
    return docs.join(flagged, id_col, "left_anti")
