"""Data-selection scoring over hashed token features.

Two inference-shaped operators a 100 TB curation pipeline runs corpus-wide:

- ``linear_score``: fasttext-style linear-classifier inference over hashed
  token occurrences (the standard learned quality filter, e.g. the
  CCNet/LLaMA wiki-vs-crawl classifier shape). The model is driver
  metadata — a weight per hash bucket + bias — shipped into the plan as
  ONE literal array; scoring is a per-row integer HOF fold, zero shuffle,
  zero join. Integer weights keep the score exact (training emits floats;
  fixed-point them once at export).

- ``dsir_importance``: DSIR-style importance weights (Xie et al. 2023,
  "Data Selection for Language Models via Importance Resampling", public):
  per-bucket hashed-unigram counts for a target slice vs the whole corpus
  give each document a log-likelihood-ratio weight
  sum_tok [ln p_target(b(tok)) - ln p_source(b(tok))] (add-one smoothed).
  The bucket table is bounded (n_buckets rows) — it aggregates once
  corpus-wide, collects to the driver like a codebook, and re-enters the
  scoring plan as literal arrays: the per-document pass is again a
  zero-join, zero-shuffle HOF fold. Exact-integer sufficient statistics
  (target_hits/source_hits — sums of bucket counts over the document's
  occurrences) ride next to the float log-weight so the oracle can
  hash-check the integers while the float is unit-tested against numpy.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import hash64, tokens


def _long_array_lit(vals: list[int]) -> Column:
    """One SQL text literal (single py4j call) — the codebook pattern from
    operators/similarity.py: per-element F.lit costs seconds of plan-build
    time at thousands of elements."""
    return F.expr("array(%s)" % ",".join(f"{int(v)}L" for v in vals))


def _double_array_lit(vals: list[float]) -> Column:
    # repr() round-trips doubles exactly; 'D' marks a double literal
    return F.expr("array(%s)" % ",".join(f"{float(v)!r}D" for v in vals))


def _bucket_stage(df: DataFrame, id_col: str, text_col: str, n_buckets: int):
    """(id, __bs array<long>) — token occurrences mapped to hash buckets,
    staged once per row (the minhash/hashed_bow pattern)."""
    from .dedup import _barrier  # local import: dedup imports text too

    return _barrier(
        df.select(
            F.col(id_col),
            F.transform(
                tokens(F.col(text_col)), lambda t: hash64(t) % n_buckets
            ).alias("__bs"),
        )
    )


def linear_score(
    df: DataFrame,
    weights: list[int],
    bias: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, score long, label int): score = bias + sum over token
    occurrences of weights[hash64(token) % len(weights)]; label = 1 iff
    score >= 0. Exact integer arithmetic end to end."""
    n = len(weights)
    staged = _bucket_stage(df, id_col, text_col, n)
    wlit = _long_array_lit(weights)
    score = F.lit(int(bias)).cast("long") + F.aggregate(
        F.col("__bs"),
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.element_at(wlit, (b + 1).cast("int")),
    )
    return staged.select(
        F.col(id_col),
        score.alias("score"),
        (score >= 0).cast("int").alias("label"),
    )


def dsir_bucket_stats(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    n_buckets: int = 512,
) -> DataFrame:
    """(bucket, t_cnt, s_cnt): hashed-unigram occurrence counts over the
    target slice and the whole corpus, in ONE aggregation (map-side
    partials collapse the token stream to <= n_buckets rows per task
    before the only shuffle)."""
    occ = df.select(
        target.alias("__t"),
        F.explode(
            F.transform(tokens(F.col(text_col)), lambda t: hash64(t) % n_buckets)
        ).alias("bucket"),
    )
    return occ.groupBy("bucket").agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("t_cnt"),
        F.count(F.lit(1)).alias("s_cnt"),
    )


def dsir_importance(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
) -> DataFrame:
    """(id, n_tokens, target_hits, source_hits, log_weight): DSIR
    importance weight per document plus its exact-integer sufficient
    statistics. Two corpus passes total: one bounded aggregation for the
    bucket table (collected — n_buckets rows, driver metadata), one
    per-row scoring fold with the table as literal arrays."""
    stats = {
        int(r["bucket"]): (int(r["t_cnt"]), int(r["s_cnt"]))
        for r in dsir_bucket_stats(df, target, text_col, n_buckets).collect()
    }
    tcnt = [stats.get(b, (0, 0))[0] for b in range(n_buckets)]
    scnt = [stats.get(b, (0, 0))[1] for b in range(n_buckets)]
    nt, ns = sum(tcnt), sum(scnt)
    lam = [
        math.log((tcnt[b] + 1) / (nt + n_buckets))
        - math.log((scnt[b] + 1) / (ns + n_buckets))
        for b in range(n_buckets)
    ]
    staged = _bucket_stage(df, id_col, text_col, n_buckets)
    tlit, slit, llit = (
        _long_array_lit(tcnt),
        _long_array_lit(scnt),
        _double_array_lit(lam),
    )

    def fold(arr: Column, zero: Column) -> Column:
        return lambda lit: F.aggregate(
            arr, zero, lambda acc, b: acc + F.element_at(lit, (b + 1).cast("int"))
        )

    long_fold = fold(F.col("__bs"), F.lit(0).cast("long"))
    dbl_fold = fold(F.col("__bs"), F.lit(0.0))
    return staged.select(
        F.col(id_col),
        F.size(F.col("__bs")).cast("long").alias("n_tokens"),
        long_fold(tlit).alias("target_hits"),
        long_fold(slit).alias("source_hits"),
        dbl_fold(llit).alias("log_weight"),
    )


def compression_ratio(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", level: int = 6
) -> DataFrame:
    """zlib compression-ratio quality signal (the classic "too
    compressible = boilerplate/repetition, incompressible = noise/binary"
    corpus heuristic): (id, n_raw, n_zlib, ratio_e4) with ratio_e4 =
    floor(1e4 * compressed/raw) and 0 for empty documents.

    Arrow-batched ``mapInPandas`` — the sanctioned Python path (zlib is
    CPU work with no Column-expression form): one python worker pass per
    batch, no per-row UDF round-trips, partition-parallel with no shuffle.
    Deterministic for a fixed zlib version+level (pinned by unit test;
    no cross-engine oracle — DuckDB has no zlib — so the contract entry is
    rows-only)."""
    import pandas as pd  # noqa: F401 (worker-side)

    schema = f"{id_col} long, n_raw long, n_zlib long, ratio_e4 long"

    def batches(it):
        import zlib

        for pdf in it:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            n_raw = raw.str.len()
            n_zlib = raw.map(lambda b: len(zlib.compress(b, level)))
            out = pdf[[id_col]].copy()
            out["n_raw"] = n_raw.astype("int64")
            out["n_zlib"] = n_zlib.astype("int64")
            out["ratio_e4"] = (
                (n_zlib * 10_000 // n_raw.where(n_raw > 0, 1))
                .where(n_raw > 0, 0)
                .astype("int64")
            )
            yield out

    return df.select(id_col, text_col).mapInPandas(batches, schema)
