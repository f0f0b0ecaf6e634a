"""Distributed Bloom filter — the cross-batch membership primitive a
100 TB dedup pipeline uses to ask "did ANY earlier batch contain this
key?" without joining against the full history (the incremental dedup
store answers exactly; this answers approximately in O(m) space with
zero false negatives).

Spark-first shape:

- **build** is one explode to (word_idx, mask) pairs and ONE bit_or
  hash-aggregate — map-side combine collapses the per-partition masks,
  so the shuffle carries at most m/63 rows (the FILTER size, a
  parameter, never the corpus size). The result is a sparse
  (word_idx, word) DataFrame: parameter-sized, persistable as parquet,
  unionable across batches (re-aggregate with bit_or to merge filters).
- **probe** attaches the filter via k BROADCAST joins on word_idx (the
  urlops PSL-probe pattern): k is small and bounded (4 by default), so
  the probed corpus streams through map-side only — no shuffle, no
  per-row groupBy re-assembly.

Exactness: positions are md5-derived (operators/text.hash64 — portable
across engines), words are two's-complement BIGINT bit algebra, so a
DuckDB oracle reproduces the filter AND the probe bit-for-bit. False
positives are therefore deterministic per (m, k, corpus); false
negatives are structurally impossible (pinned by test).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import hash64


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k independent md5-derived bit positions in [0, m_bits)."""
    return [
        hash64(F.concat(key, F.lit(f"#b{i}"))) % m_bits for i in range(k)
    ]


# 63 usable bits per BIGINT word — the sign bit stays clear so the mask
# algebra is portable (DuckDB raises "Overflow in left shift" on
# 1::BIGINT << 63, and staying positive spares every consumer the
# two's-complement wrap)
BITS_PER_WORD = 63


def _word_idx(i: int) -> Column:
    return F.expr(f"CAST(__bf_p{i} DIV {BITS_PER_WORD} AS INT)")


def _mask(i: int) -> Column:
    # variable-distance shift needs the SQL form (F.shiftleft takes a
    # Python int)
    return F.expr(
        "shiftleft(CAST(1 AS BIGINT), "
        f"CAST(__bf_p{i} % {BITS_PER_WORD} AS INT))"
    )


def bloom_build(
    df: DataFrame,
    key_col: str = "fingerprint",
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Build the filter over ``df[key_col]``: returns the sparse word
    table (word_idx int, word long) with at most m_bits/63 rows (63 usable bits per word — see BITS_PER_WORD). Merge
    filters from several batches by unioning the tables and re-running
    the same groupBy/bit_or."""
    staged = df.select(
        *[
            p.alias(f"__bf_p{i}")
            for i, p in enumerate(_positions(F.col(key_col), m_bits, k))
        ]
    )
    pairs = staged.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        _word_idx(i).alias("word_idx"),
                        _mask(i).alias("mask"),
                    )
                    for i in range(k)
                ]
            )
        ).alias("pm")
    ).select("pm.word_idx", "pm.mask")
    return pairs.groupBy("word_idx").agg(F.bit_or("mask").alias("word"))


def bloom_might_contain(
    df: DataFrame,
    filt: DataFrame,
    key_col: str = "fingerprint",
    m_bits: int = 1 << 20,
    k: int = 4,
    out_col: str = "might_contain",
) -> DataFrame:
    """Probe: ``out_col`` is true iff ALL k bits are set — zero false
    negatives, deterministic md5-derived false positives. k broadcast
    joins on word_idx; the probed side never shuffles."""
    orig_cols = df.columns
    out = df
    for i, p in enumerate(_positions(F.col(key_col), m_bits, k)):
        w = filt.select(
            F.col("word_idx").alias(f"__bf_i{i}"),
            F.col("word").alias(f"__bf_w{i}"),
        )
        out = out.withColumn(f"__bf_p{i}", p).join(
            F.broadcast(w), _word_idx(i) == F.col(f"__bf_i{i}"), "left"
        )
    cond = F.lit(True)
    for i in range(k):
        cond = cond & (
            F.coalesce(F.col(f"__bf_w{i}"), F.lit(0)).bitwiseAND(_mask(i))
            != 0
        )
    return out.withColumn(out_col, cond).select(*orig_cols, out_col)
