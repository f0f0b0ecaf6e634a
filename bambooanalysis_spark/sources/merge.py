"""Snapshot MERGE (upsert/delete) and SCD2 history over parquet tables.

A training-data catalog is not append-only: label fixes, takedown/opt-out
deletions, and re-crawled documents all arrive as change batches against a
snapshot that is orders of magnitude larger. Table formats (Delta/Iceberg/
Hudi, all public) solve this with a MERGE operation; this module provides
the same semantics on plain parquet, Spark-first:

- ``merge_snapshot``: one full-outer join of snapshot x changes on the
  key. The changes side is dimension-sized next to a 100 TB snapshot —
  broadcast it (guarded) and the snapshot side streams through without a
  shuffle; with a shuffled fallback both sides exchange once on the key.
  Rows: change wins over snapshot (upsert), ``op = 'D'`` deletes,
  untouched snapshot rows pass through. The result is written as the next
  snapshot version (copy-on-write, like Delta's non-deletion-vector path).

- ``scd2_apply``: slowly-changing-dimension type 2 — instead of replacing
  a row, close its validity interval and open a new one. History rows are
  (key, attrs..., valid_from, valid_to NULL-for-current, is_current). The
  canonical warehouse shape for "what did this record look like when that
  model trained".

Both are pure DataFrame transformations with exact SQL oracles (driver
contract: sources_merge_upsert rides the relational family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_snapshot(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    broadcast_changes: bool = True,
) -> DataFrame:
    """MERGE semantics: upsert every change row with ``op != 'D'``, delete
    keys with ``op == 'D'``, pass through unmatched snapshot rows. Change
    batches must be unique per key (enforce upstream with the latest-wins
    window, see ``latest_per_key``). Column set = snapshot's columns."""
    cols = snapshot.columns
    # anti-join + union, NOT a full-outer join: Spark cannot broadcast a
    # full-outer build side (the hint is silently dropped and the whole
    # snapshot shuffles — round-4 review finding). Equivalent result under
    # the unique-key-per-batch precondition: untouched snapshot rows are
    # the keys with no change row; every surviving change row (op != 'D')
    # contributes itself. The anti join DOES broadcast, so the 100 TB
    # snapshot genuinely streams through with zero shuffle.
    ch_keys = changes.select(F.col(key))
    if broadcast_changes:
        ch_keys = F.broadcast(ch_keys)
    untouched = snapshot.join(ch_keys, key, "left_anti")
    upserts = changes.where(F.col(op_col) != "D").select(
        *[F.col(c) for c in cols]
    )
    return untouched.unionByName(upserts)


def latest_per_key(changes: DataFrame, key: str, version_col: str) -> DataFrame:
    """Collapse a multi-version change batch to the latest row per key
    (highest version wins; the standard CDC compaction step before MERGE).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(version_col).desc())
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str = "ts",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply a change batch to an SCD2 history table.

    ``history`` rows: (key, *attrs, valid_from, valid_to, is_current) with
    exactly one is_current row per live key. ``changes`` rows:
    (key, *attrs, ts). For each changed key: the current row closes
    (valid_to = change ts, is_current = false) and a new current row opens
    (valid_from = change ts). Unchanged keys and already-closed rows pass
    through untouched. Attribute-identical changes still open a new
    version (idempotence filtering is the caller's latest_per_key /
    distinct concern — timestamp semantics differ per pipeline).

    Plan shape: closed rows pass through without any join; only the
    is_current slice joins the (broadcast) change batch — at 100 TB the
    history's dominant closed mass is never shuffled."""
    ch = changes.select(
        F.col(key), *[F.col(a) for a in attrs], F.col(ts_col).alias("__ts")
    )
    if broadcast_changes:
        ch = F.broadcast(ch)
    closed = history.where(~F.col("is_current"))
    current = history.where(F.col("is_current"))
    j = current.alias("h").join(
        ch.alias("c"), F.col(f"h.{key}") == F.col(f"c.{key}"), "left"
    )
    changed = F.col(f"c.{key}").isNotNull()
    still_current = j.select(
        *[F.col(f"h.{col}").alias(col) for col in [key, *attrs, "valid_from"]],
        F.when(changed, F.col("c.__ts")).otherwise(F.col("h.valid_to")).alias(
            "valid_to"
        ),
        F.when(changed, F.lit(False)).otherwise(F.lit(True)).alias("is_current"),
    )
    # every change row opens a new current version, whether its key is
    # brand-new or replaces an existing current row — the former
    # anti/semi-join pair partitioned the batch exactly and computed
    # nothing (round-4 review finding): this is a zero-join projection
    opened = ch.select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col("__ts").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionByName(still_current).unionByName(opened)


def scd2_init(
    df: DataFrame, key: str, attrs: list[str], ts_col: str = "ts"
) -> DataFrame:
    """Bootstrap an SCD2 history from an initial snapshot: every row
    opens as current from its timestamp."""
    return df.select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col(ts_col).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_as_of(history: DataFrame, ts) -> DataFrame:
    """Time-travel read: the rows valid at timestamp ``ts`` —
    valid_from <= ts < valid_to (NULL valid_to = open interval)."""
    t = F.lit(ts).cast("timestamp")
    return history.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change data feed between two snapshot versions: one row per key
    that differs, labeled 'insert' (key only in new), 'delete' (only in
    old) or 'update' (present in both with any compared column changed —
    NULL-safe via the <=> comparison). Unchanged keys are dropped, so the
    output is delta-sized. One full-outer shuffle join on the key — the
    minimal possible work for diffing unsorted snapshots; snapshots
    bucketed on the key diff with zero shuffle (sources/layout.py +
    operators/joins.py bucketed path)."""
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c != key]
    o = old.select(
        F.col(key).alias("__k"), *[F.col(c).alias(f"{c}_old") for c in compare_cols]
    )
    n = new.select(
        F.col(key).alias("__k2"), *[F.col(c).alias(f"{c}_new") for c in compare_cols]
    )
    j = o.join(n, F.col("__k") == F.col("__k2"), "full_outer")
    # Key-only diff (compare_cols == []): no column can change, so only
    # inserts/deletes are emitted.
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
    op = (
        F.when(F.col("__k").isNull(), "insert")
        .when(F.col("__k2").isNull(), "delete")
        .when(changed, "update")
    )
    return (
        j.withColumn("op", op)
        .where(F.col("op").isNotNull())
        .select(
            F.coalesce(F.col("__k"), F.col("__k2")).alias(key),
            "op",
            *[f"{c}_old" for c in compare_cols],
            *[f"{c}_new" for c in compare_cols],
        )
    )
