"""Event-time processing over the ``events`` table — batch and Structured
Streaming share the same transformation (the Spark-native extension noted
in SURVEY.md §2.10; the reference itself is batch-only).

``windowed_event_stats`` is written against a generic DataFrame: applied to
``spark.read.parquet`` it is a batch aggregation; applied to
``spark.readStream`` (plus the watermark added here) it is an incremental
streaming aggregation with late-data handling. The tests drive both paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time window per event_type: count + exact value sum
    (cents fixed-point: order-independent, engine-exact).

    With ``watermark`` set (streaming), late events beyond the bound are
    dropped and state is GC'd — required for an unbounded source.
    """
    df = events
    if watermark is not None:
        df = df.withWatermark("ts", watermark)
    # exact distinct is illegal on a streaming plan; HLL sketch there —
    # exactly the tradeoff a 100 TB streaming rollup would make
    n_users = (
        F.approx_count_distinct("user_id") if df.isStreaming else F.countDistinct("user_id")
    )
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
            n_users.alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
            "n_users",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessionization: a new session starts when the gap from the
    previous event exceeds ``gap_minutes``. Returns one row per session
    with bounds and event count.

    Batch formulation (window lag + cumulative sum) — the classic scalable
    shape: one shuffle on user_id, linear within partition. The streaming
    equivalent is F.session_window / applyInPandasWithState.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long"), 1).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    with_sess = (
        events.withColumn("is_new", new_session)
        .withColumn(
            "session_idx",
            F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        with_sess.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
