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
