"""Data-quality validation (expectations-style constraint checking) for
pipeline gating: declare rules, get back one row per rule with exact
violation counts.

Spark-first shape: ALL scalar rules over a table — not-null, range,
accepted-values, uniqueness — are evaluated in ONE aggregation over ONE
scan (conditional `sum(when(...))` counters plus `count_distinct` for
uniqueness, all map-side combined), then unpivoted to rule rows with
`stack`. Referential-integrity rules each add one left-anti join against
the referenced key set (broadcast when the key side is dimension-sized).
At 100 TB this is the cheapest possible audit: the fact table is scanned
once regardless of how many scalar rules are declared.

Every count is an exact integer, so DuckDB oracles replicate the report
bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quality_report(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[Sequence[str]] = (),
    ranges: dict[str, tuple[float, float]] | None = None,
    accepted: dict[str, Sequence[str]] | None = None,
    foreign_keys: Sequence[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """One row per declared rule: (rule, n_violations, n_rows, passed).

    - ``not_null``: columns that must not contain NULL.
    - ``unique``: key column lists; violations = n_rows − distinct keys
      (the surplus duplicate rows; NULL keys count as a key value).
    - ``ranges``: col -> [lo, hi] closed interval; NULL is a violation.
    - ``accepted``: col -> allowed value list; NULL is a violation.
    - ``foreign_keys``: (col, ref_df, ref_col) — rows whose non-NULL col
      has no match in ref (NULL FK is allowed; pair with not_null to
      forbid).
    """
    ranges = ranges or {}
    accepted = accepted or {}
    counters: list[tuple[str, Column]] = [("__n_rows", F.count(F.lit(1)))]

    def _viol(name: str, bad: Column) -> None:
        counters.append((name, F.sum(F.when(bad, 1).otherwise(0)).cast("long")))

    for c in not_null:
        _viol(f"not_null:{c}", F.col(c).isNull())
    for c, (lo, hi) in ranges.items():
        _viol(f"range:{c}", ~F.col(c).between(lo, hi) | F.col(c).isNull())
    for c, vals in accepted.items():
        _viol(f"accepted:{c}", ~F.col(c).isin(list(vals)) | F.col(c).isNull())
    for cols in unique:
        key = F.struct(*[F.col(c) for c in cols])
        counters.append(
            (
                "unique:" + ",".join(cols),
                (F.count(F.lit(1)) - F.count_distinct(key)).cast("long"),
            )
        )

    agg = df.agg(*[c.alias(n) for n, c in counters])
    rules = [n for n, _ in counters if n != "__n_rows"]
    stacked = agg.select(
        F.col("__n_rows"),
        F.expr(
            "stack({}, {})".format(
                len(rules), ", ".join(f"'{r}', `{r}`" for r in rules)
            )
        ).alias("rule", "n_violations"),
    ).select("rule", "n_violations", F.col("__n_rows").alias("n_rows"))

    fk_reports = []
    for col, ref, ref_col in foreign_keys:
        # referenced key sets are usually dimension-sized — but guard the
        # broadcast with the probed-count check instead of assuming
        # (similarity._maybe_broadcast: above the limit the planner falls
        # back to a shuffled anti-join rather than OOMing every executor)
        from .similarity import _maybe_broadcast

        keys = ref.select(F.col(ref_col).alias(col)).distinct()
        missing = (
            df.where(F.col(col).isNotNull())
            .join(_maybe_broadcast(keys, 10_000_000), col, "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .crossJoin(df.agg(F.count(F.lit(1)).alias("n_rows")))
            .select(
                F.lit(f"foreign_key:{col}").alias("rule"), "n_violations", "n_rows"
            )
        )
        fk_reports.append(missing)

    out = stacked
    for r in fk_reports:
        out = out.unionByName(r)
    return out.withColumn("passed", F.col("n_violations") == 0)
