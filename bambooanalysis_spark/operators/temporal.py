"""Temporal joins and time-bucketed rollups over event streams.

Spark has no built-in as-of join (pandas ``merge_asof`` / DuckDB ``ASOF
JOIN``); the naive formulation is a range join that explodes to
|left| x |matching-range| rows before picking the max. This module uses the
union-tag-window formulation instead: tag both streams, union them, and
propagate the most recent right-side payload onto left rows with
``last(..., ignorenulls=True)`` over a key-partitioned, time-ordered
window. ONE shuffle on the join key, no range expansion, and the sort is
the same sort a shuffle-merge range join would pay anyway — this is the
shape that survives 100 TB event tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: dict[str, str] | None = None,
    tolerance: Column | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the most recent right row
    with the same key and ``right_ts <= left_ts`` (backward as-of, inclusive
    ties — DuckDB ``ASOF JOIN`` / pandas ``merge_asof`` default). No match
    -> NULL payload (left outer semantics).

    ``payload`` maps right-side columns to output names. ``tolerance``
    (an interval Column, e.g. ``F.expr("INTERVAL 10 MINUTES")``) nulls the
    payload when the matched row is older than ``left_ts - tolerance``.

    Plan shape: union of the two tagged streams -> window (partitionBy key,
    orderBy ts, side) -> filter side=left. Right rows sort BEFORE left rows
    at equal timestamps (side 0 < 1), which is what makes ties inclusive.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = payload or {
        c: f"right_{c}" for c in right.columns if c not in keys + [right_ts]
    }

    lhs = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lhs.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
        F.col(right_ts).alias("__rts"),
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = lhs.unionByName(rhs).select(
        "__side",
        "__left",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in payload
        ],
        F.last("__rts", ignorenulls=True).over(w).alias("__mrts"),
    )

    out = matched.where(F.col("__side") == 1)
    in_tol = (
        F.lit(True)
        if tolerance is None
        else F.col("__mrts") >= F.col("__left")[left_ts] - tolerance
    )
    return out.select(
        *[F.col("__left")[c].alias(c) for c in left.columns],
        *[
            F.when(in_tol, F.col(f"__m_{c}")).otherwise(F.lit(None)).alias(name)
            for c, name in payload.items()
        ],
    )


# ISO-8601-truncation granularities, coarse to fine. Each maps to the same
# date_trunc unit name in Spark and DuckDB.
ROLLUP_UNITS = ["day", "hour", "minute"]


def time_rollup(
    events: DataFrame,
    ts: str = "ts",
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    units: list[str] | None = None,
) -> DataFrame:
    """Multi-granularity time-bucketed aggregate (the hypertable continuous-
    aggregate shape): one row per (unit, bucket, *keys) for each granularity
    in ``units``.

    Single scan, single shuffle: the per-unit bucket is exploded from one
    array column BEFORE the groupBy, so Spark aggregates all granularities
    in one exchange instead of one job per unit. At scale this is the
    difference between reading a 100 TB table once and reading it
    len(units) times.
    """
    keys = keys or []
    units = units or ROLLUP_UNITS
    aggs = aggs or [F.count("*").alias("n")]
    buckets = F.array(
        *[
            F.struct(
                F.lit(u).alias("unit"), F.date_trunc(u, F.col(ts)).alias("bucket")
            )
            for u in units
        ]
    )
    src = events.select(
        *events.columns, F.explode(buckets).alias("__b")
    ).select(
        *[c for c in events.columns],
        F.col("__b.unit").alias("unit"),
        F.col("__b.bucket").alias("bucket"),
    )
    return src.groupBy("unit", "bucket", *keys).agg(*aggs)
