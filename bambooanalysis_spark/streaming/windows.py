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


def sessionize(
    events: DataFrame, gap_minutes: int = 30, salt_minutes: int | None = None
) -> DataFrame:
    """Per-user sessionization: a new session starts when the gap from the
    previous event exceeds ``gap_minutes``. Returns one row per session
    with bounds and event count.

    Batch formulation (window lag + cumulative sum) — the classic scalable
    shape: one shuffle on user_id, linear within partition. The streaming
    form is ``sessionize_windows`` below (F.session_window gap windows).

    **Skew** (VERDICT r2 "What's wrong" #4): the per-user window
    serializes a hot user's whole history into one task. ``salt_minutes``
    (must be >= gap_minutes) activates the two-phase shape: phase 1 runs
    the SAME lag+cumsum partitioned by (user, time-chunk of that width) —
    a hot user's events spread across their chunks; phase 2 merges
    consecutive LOCAL sessions whose boundary gap is within gap_minutes
    with a per-user window over SESSION rows (orders of magnitude fewer
    rows than events — the pack_sequences two-phase-prefix pattern).
    Because a chunk is at least one gap long, a session can only merge
    with its immediate temporal neighbor, so the light pass is exact —
    pinned by tests/test_extensions.py::test_sessionize_salted_matches_unsalted.
    """
    from pyspark.sql import Window

    if salt_minutes is None:
        part_cols = ["user_id"]
        src = events
    else:
        if salt_minutes < gap_minutes:
            raise ValueError(
                "salt_minutes must be >= gap_minutes (a chunk shorter than "
                "the gap lets sessions merge across non-adjacent chunks)"
            )
        src = events.withColumn(
            "__chunk", F.window(F.col("ts"), f"{int(salt_minutes)} minutes")["start"]
        )
        part_cols = ["user_id", "__chunk"]

    w = Window.partitionBy(*part_cols).orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long"), 1).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    with_sess = (
        src.withColumn("is_new", new_session)
        .withColumn(
            "session_idx",
            F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    local = with_sess.groupBy(*part_cols, "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    if salt_minutes is None:
        return local

    # phase 2: merge consecutive local sessions across chunk boundaries —
    # same split rule (boundary gap > gap_minutes starts a new group) over
    # per-SESSION rows, then re-aggregate bounds/counts and recompute the
    # per-user ordinal so the output matches the unsalted grain exactly
    sw = Window.partitionBy("user_id").orderBy("session_start", "session_end")
    bgap = F.col("session_start").cast("long") - F.lag(
        F.col("session_end").cast("long"), 1
    ).over(sw)
    new_grp = F.when(bgap.isNull() | (bgap > gap_minutes * 60), 1).otherwise(0)
    grouped = local.withColumn("is_new", new_grp).withColumn(
        "session_idx",
        F.sum("is_new").over(sw.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return grouped.groupBy("user_id", "session_idx").agg(
        F.min("session_start").alias("session_start"),
        F.max("session_end").alias("session_end"),
        F.sum("n_events").alias("n_events"),
    )


def sessionize_windows(
    events: DataFrame, gap_minutes: int = 30, watermark: str | None = None
) -> DataFrame:
    """Streaming-capable sessionization via ``F.session_window`` — Spark's
    native gap-window aggregation (VERDICT r2 "Next round" #3). One row per
    (user, session) with bounds and event count, same output grain as the
    batch ``sessionize`` (minus the per-user ordinal, which has no meaning
    on an unbounded stream).

    Batch: identical sessions to ``sessionize`` whenever no inter-event gap
    is EXACTLY gap_minutes (session_window merges gap < g, the lag
    formulation splits on gap > g; with microsecond event times an exact-g
    gap is a measure-zero tie) — asserted against the lag formulation in
    test_streaming_sessionize_matches_batch.

    Streaming: with ``watermark`` set this is an incremental session
    aggregation — Spark merges/extends per-user session state as events
    arrive and finalizes a session once the watermark passes its close
    (state GC'd), which is exactly the unbounded-source semantics the
    batch window-lag formulation cannot express. Skew note: state is
    partitioned by (user_id), so one hot user concentrates on one task —
    same exposure (and same AQE/salting remedies) as the batch window,
    see operators/temporal.py.
    """
    df = events
    if watermark is not None:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(
            F.session_window("ts", f"{int(gap_minutes)} minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def view_purchase_funnel(
    views: DataFrame,
    purchases: DataFrame,
    max_lag_minutes: int = 30,
    watermark: str | None = None,
) -> DataFrame:
    """Stream-stream interval join: every (view -> purchase) conversion by
    the same user where the purchase lands within ``max_lag_minutes`` after
    the view. One row per qualifying pair, with the conversion lag.

    Batch: plans as an equi-join on user_id with the time bounds as a
    residual range predicate — one shuffle on the natural key, no
    cross-product. Streaming: the SAME expression with ``watermark`` set on
    both sides becomes Spark's watermarked interval join, the canonical
    Structured Streaming stream-stream join — the time bound plus the
    watermark lets the engine GC buffered state past
    watermark + max_lag, so state stays bounded on an unbounded source.

    Columns are renamed (not aliased tables) so the join output is
    unambiguous under both execution modes.
    """
    v = views.select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if watermark is not None:
        v = v.withWatermark("view_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {int(max_lag_minutes)} MINUTES")
        )
    )
    return v.join(p, cond, "inner").select(
        "user_id",
        "view_id",
        "purchase_id",
        (
            F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("view_ts"))
        ).alias("lag_us"),
        F.round(F.col("purchase_value") * 100).cast("long").alias("purchase_cents"),
    )


def abandoned_views(
    views: DataFrame,
    purchases: DataFrame,
    max_lag_minutes: int = 30,
    watermark: str | None = None,
) -> DataFrame:
    """The outer side of the funnel: views the user did NOT convert within
    ``max_lag_minutes``. Expressed as a LEFT OUTER interval join filtered to
    the unmatched rows — deliberately not an anti-join, because Structured
    Streaming supports watermarked outer joins but not anti-joins: in
    streaming mode an unmatched view is emitted once the watermark passes
    view_ts + max_lag (the engine then KNOWS no purchase can still arrive),
    which is the correct unbounded-source semantics for "abandoned".

    Batch plans it as the same user_id equi-join with the range residual;
    the trailing filter keeps only the NULL purchase side.
    """
    v = views.select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if watermark is not None:
        v = v.withWatermark("view_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {int(max_lag_minutes)} MINUTES")
        )
    )
    return (
        v.join(p, cond, "left_outer")
        .where(F.col("purchase_id").isNull())
        .select(
            "user_id",
            "view_id",
            F.unix_micros(F.col("view_ts")).alias("view_us"),
        )
    )


def windowed_value_counts(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "event_type",
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time counts of a categorical column — the
    (window_start, token, n) table the drift monitor consumes
    (operators/corpus.py:windowed_kl_vs_reference). One transformation,
    both engines: on ``spark.read`` it is a batch rollup; on
    ``spark.readStream`` (+ ``watermark``) it is an incremental
    streaming aggregation whose closed windows feed the drift
    computation batch-side (per-window KL needs per-window totals — a
    second stateful aggregate — so the monitor runs over the sink table
    or in foreachBatch, the standard Structured Streaming split between
    in-stream rollup and post-hoc analytics). NULL values are excluded
    (they have no distribution identity)."""
    src = df
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.where(F.col(value_col).isNotNull())
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(value_col).cast("string").alias("token"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "token", "n")
    )


def windowed_hdr_sketch(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str | None = None,
    sub_bits: int = 4,
) -> DataFrame:
    """Tumbling event-time HDR histogram of a non-negative integer
    column — the (window_start, bucket, cnt) sketch table a
    quantile-drift monitor consumes (operators/retrieval.hdr_quantiles
    with keys=['window_start']). Same split as windowed_value_counts:
    ONE transformation, both engines — a batch rollup on ``spark.read``,
    an incremental streaming aggregation on ``spark.readStream`` (+
    ``watermark``); the quantile read-off runs batch-side over the sink
    table (rank extraction needs the closed window's cumulative counts).
    This is exactly what exact per-window percentiles CANNOT do in a
    stream — percentile_approx is not an incrementally-mergeable
    aggregation state here, while bucket counts sum. NULL values are
    excluded; negative values raise in-plan (hdr_bucket's guard)."""
    from ..operators.retrieval import hdr_bucket

    src = df
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.where(F.col(value_col).isNotNull())
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            hdr_bucket(F.col(value_col), sub_bits).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "bucket", "cnt")
    )
