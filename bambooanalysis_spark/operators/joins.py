"""Scale-oriented join strategies.

The reference surface has no relational joins (SURVEY.md §2.3), but a
100 TB engine must handle the two failure modes of large joins:

- **skew**: a handful of hot keys serializing one reducer. AQE's skew-join
  splitting handles sort-merge cases automatically; `salted_join` is the
  explicit, strategy-independent form — fact keys are salted determin-
  istically, the (small-ish) build side is replicated per salt, so hot keys
  spread over `salt` reducers.
- **repeated co-located joins**: `write_bucketed` persists both sides
  bucketed+sorted by the join key so subsequent joins are shuffle-free
  (verified by plan assertion in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    build: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with deterministic key salting.

    fact rows get salt = positive_mod(xxhash64(whole row), salt) — no RNG,
    so results are reproducible; build rows are exploded once per salt
    value. Join key becomes (key, salt): a key with S% of the fact table
    now occupies `salt` reducers instead of one.

    Only ``inner`` and ``left`` (fact-preserving) joins are supported: the
    build side is REPLICATED per salt value, so right/full-outer would
    emit one spurious null-extended row per unmatched replica (up to
    `salt` copies of each unmatched build row) — rejected loudly instead
    (round-4 review finding).
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — build-side replication "
            "breaks right/full outer semantics; salt the other side or use "
            "a plain join with AQE skew handling"
        )
    if how in ("left_semi", "leftsemi", "left_anti", "leftanti"):
        # semi/anti never expose build columns, so replication is harmless,
        # but the salt column must not leak into the condition semantics:
        # a fact row matches iff its (key, salt) replica exists, which is
        # exactly "key exists" because every salt value is replicated.
        pass
    fact_salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*fact.columns), F.lit(salt)).cast("int")
    )
    build_replicated = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = fact_salted.join(build_replicated, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 16
) -> None:
    """Persist bucketed + sorted by the join key: joins between tables
    bucketed the same way need no shuffle (bucket pruning + sorted merge).
    The 100 TB pattern for dimension-stable fact tables joined repeatedly.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def key_skew_profile(
    df: DataFrame, keys: list[str] | str, top_k: int = 20
) -> DataFrame:
    """The measure-before-you-salt diagnostic: the ``top_k`` heaviest
    join/groupBy key values with their absolute and cumulative weight —
    (rank, key, n, n_total, n_distinct, frac_e6, cum_frac_e6). Read it
    before choosing between a plain join (AQE skew split handles
    moderate cases), `salted_join` (frac of the top key ~ salt/cluster
    ratio), or dropping/broadcasting a degenerate hot key (NULLs and
    sentinel values routinely carry 30%+ of real fact tables).

    frac in e6 fixed-point via integer DIV, so both engines agree
    bit-for-bit and the profile is oracle-checkable. Composite keys are
    profiled as their concat_ws('\\x1f', ...) string form (the same
    value-collision-safe unit separator the dedup family uses).

    Scale shape: ONE map-side-combined groupBy count (the profile of a
    100 TB fact table shuffles at most (distinct keys) bounded-width
    rows), then top-k via TakeOrdered (count desc, key asc — no global
    sort) and a single-partition cumulative window over top_k rows
    only. Totals ride along as a one-row broadcast."""
    from pyspark.sql import Window

    key_cols = [keys] if isinstance(keys, str) else list(keys)
    def _flagged(c: str):
        v = F.col(c).cast("string")
        return F.when(v.isNull(), F.lit("0")).otherwise(F.concat(F.lit("1"), v))

    key = (
        F.col(key_cols[0]).cast("string")
        if len(key_cols) == 1
        else F.concat_ws("\x1f", *[_flagged(c) for c in key_cols])
    )
    counts = df.groupBy(key.alias("key")).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").alias("n_total"), F.count(F.lit(1)).alias("n_distinct")
    )
    top = (
        counts.orderBy(F.desc("n"), F.asc_nulls_first("key"))
        .limit(top_k)
        .join(F.broadcast(totals))
    )
    w = (
        Window.orderBy(F.desc("n"), F.asc_nulls_first("key"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("n"), F.asc_nulls_first("key")))
        .cast("long")
        .alias("rank"),
        "key",
        "n",
        "n_total",
        "n_distinct",
        F.expr("n * 1000000 DIV n_total").alias("frac_e6"),
        F.sum("n").over(w).alias("cum_n"),
    ).withColumn(
        "cum_frac_e6", F.expr("cum_n * 1000000 DIV n_total")
    ).drop("cum_n")
