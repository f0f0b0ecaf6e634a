"""Relational operator surface — joins, aggregation, windows, set ops,
sort/limit — on the driver's TPC-H-ish tables.

The reference has no inter-table joins (SURVEY.md §2.3: "equi-joins ...
absent"), but the Spark engine carries the full relational algebra "for
free"; these queries pin down that surface (and feed bench.py's headline
timings) with DuckDB oracles.

Determinism notes:
- additive money aggregates go through DECIMAL (exact, order-independent)
  and are OUTPUT as scaled BIGINT fixed-point (cents / 1e-4 units): integer
  columns survive every engine/pandas/arrow conversion bit-exactly, while
  decimal->double conversions differ by 1 ulp between engines;
- every top-k/order-by has a total tie-break;
- count/count-distinct are exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import read_table, register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- scan + filter + group aggregate (TPC-H Q1 shape): pushdown showcase ----

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary computed over ROLLUP(l_returnflag,
    l_linestatus) — round-3 window consolidation: the grouping-sets
    demonstration (former rel_rollup) rides the same aggregation, adding
    the per-flag and grand-total rows ('ALL' labels) to the Q1 grain.
    Distinct aggregates folded in since the round-3 rel_distinct_agg
    merge; bench.py still times the plain Q1 via q_pricing_summary_plain."""
    li = _t(spark, sf_dir, "lineitem")
    price = "decimal(18,4)"
    disc = "decimal(8,6)"
    return (
        li.where(F.col("l_shipdate") < F.lit("1998-09-01").cast("timestamp"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(price)).cast("bigint").alias("sum_qty"),
            (F.sum(F.col("l_extendedprice").cast(price)) * 100).cast("bigint").alias("sum_base_price_cents"),
            (
                F.sum(
                    (
                        F.col("l_extendedprice").cast(price)
                        * (F.lit(1).cast(disc) - F.col("l_discount").cast(disc))
                    ).cast("decimal(38,10)")
                )
                * 10000
            )
            .cast("bigint")
            .alias("sum_disc_price_e4"),
            F.count(F.lit(1)).alias("count_order"),
            # distinct aggregates folded in (round-3 merge of the former
            # rel_distinct_agg — the driver-window consolidation; bench.py
            # still times the distinct-free Q1 via q_pricing_summary_plain)
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "sum_base_price_cents",
            "sum_disc_price_e4",
            "count_order",
            "n_supp",
            "n_part",
        )
        .orderBy("returnflag", "linestatus")
    )


def q_pricing_summary_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-1/2 benchmarked unit: TPC-H Q1 shape without the distinct
    aggregates (kept so bench.py timings stay comparable across rounds)."""
    li = _t(spark, sf_dir, "lineitem")
    price = "decimal(18,4)"
    disc = "decimal(8,6)"
    return (
        li.where(F.col("l_shipdate") < F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(price)).cast("bigint").alias("sum_qty"),
            (F.sum(F.col("l_extendedprice").cast(price)) * 100).cast("bigint").alias("sum_base_price_cents"),
            (
                F.sum(
                    (
                        F.col("l_extendedprice").cast(price)
                        * (F.lit(1).cast(disc) - F.col("l_discount").cast(disc))
                    ).cast("decimal(38,10)")
                )
                * 10000
            )
            .cast("bigint")
            .alias("sum_disc_price_e4"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_PRICING_SUMMARY = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 100 AS BIGINT) AS sum_base_price_cents,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))
                AS DECIMAL(38,10))) * 10000 AS BIGINT) AS sum_disc_price_e4,
       COUNT(*) AS count_order,
       COUNT(DISTINCT l_suppkey) AS n_supp,
       COUNT(DISTINCT l_partkey) AS n_part
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


# --- multi-way join + aggregation (broadcast-friendly dims) -----------------

def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    dec = "decimal(28,6)"
    # nation is bounded (25 rows) and hinted; customer grows with SF, so
    # it carries NO hint — AQE broadcasts it while small and falls back
    # to a shuffle join at scale (a forced hint is an executor OOM at
    # 100x, not a slow plan)
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            (F.sum(F.col("o_totalprice").cast(dec)) * 100).cast("bigint").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


ORACLE_REVENUE_BY_NATION = """
SELECT n_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) * 100 AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# --- semi / anti joins (EXISTS / NOT EXISTS between tables) -----------------

def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins plus (round 3) the table-maintenance family —
    MERGE upsert/delete and SCD2 history (sources/merge.py) — exercised on
    a deterministic change batch derived from customer and emitted as
    tagged (c_custkey, status) disposition rows in the same union shape.
    The statuses come from the ACTUAL merged snapshot / history
    DataFrames, so a mishandled delete, lost update, or wrong validity
    interval breaks the hash against the directly-derived oracle."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    big = orders.where(F.col("o_totalprice") > 150000.0)
    with_big = customer.join(big, customer.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", F.lit("has_big_order").alias("status")
    )
    without = customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", F.lit("no_orders").alias("status")
    )

    from ..sources.merge import merge_snapshot, scd2_apply, scd2_as_of, scd2_init

    snap = customer.select("c_custkey", "c_nationkey")
    k = F.col("c_custkey")
    chg = (
        snap.where(k % 10 == 0)
        .select("c_custkey", (F.col("c_nationkey") + 100).alias("c_nationkey"), F.lit("U").alias("op"))
        .unionByName(
            snap.where((k % 17 == 3) & (k % 10 != 0)).select(
                "c_custkey", "c_nationkey", F.lit("D").alias("op")
            )
        )
        .unionByName(
            snap.where(k % 97 == 5).select(
                (k + 1000000).alias("c_custkey"),
                F.lit(77).cast(snap.schema["c_nationkey"].dataType).alias("c_nationkey"),
                F.lit("I").alias("op"),
            )
        )
    )
    merged = merge_snapshot(snap, chg, key="c_custkey")
    ups = chg.where(F.col("op") != "D").select("c_custkey")
    # chg/ups derive from customer (1/97 slice) — SF-scaled, so no
    # broadcast hints: AQE picks broadcast while the batch is small
    m_upserted = merged.join(ups, "c_custkey", "left_semi").select(
        "c_custkey",
        F.concat(F.lit("merge_upserted:"), F.col("c_nationkey").cast("string")).alias("status"),
    )
    m_kept = merged.join(chg.select("c_custkey"), "c_custkey", "left_anti").select(
        "c_custkey", F.lit("merge_kept").alias("status")
    )
    m_deleted = (
        chg.where(F.col("op") == "D")
        .select("c_custkey")
        .join(merged, "c_custkey", "left_anti")
        .select("c_custkey", F.lit("merge_deleted").alias("status"))
    )

    hist = scd2_init(
        snap.withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp")),
        "c_custkey",
        ["c_nationkey"],
    )
    hist1 = scd2_apply(
        hist,
        chg.where(F.col("op") != "D").withColumn(
            "ts", F.lit("2024-06-01 00:00:00").cast("timestamp")
        ),
        "c_custkey",
        ["c_nationkey"],
    )
    s_closed = hist1.where(~F.col("is_current") & F.col("valid_to").isNotNull()).select(
        "c_custkey", F.lit("scd2_closed").alias("status")
    )
    s_current = hist1.where(F.col("is_current")).join(
        ups, "c_custkey", "left_semi"
    ).select(
        "c_custkey",
        F.concat(F.lit("scd2_current:"), F.col("c_nationkey").cast("string")).alias("status"),
    )
    s_asof = scd2_as_of(hist1, "2024-03-01 00:00:00").join(
        ups, "c_custkey", "left_semi"
    ).select(
        "c_custkey",
        F.concat(F.lit("scd2_asof_old:"), F.col("c_nationkey").cast("string")).alias("status"),
    )
    return (
        with_big.unionAll(without)
        .unionAll(m_upserted)
        .unionAll(m_kept)
        .unionAll(m_deleted)
        .unionAll(s_closed)
        .unionAll(s_current)
        .unionAll(s_asof)
    )


ORACLE_SEMI_ANTI_JOIN = """
WITH chg AS (
    SELECT c_custkey, c_nationkey + 100 AS c_nationkey, 'U' AS op
    FROM customer WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT c_custkey, c_nationkey, 'D' AS op
    FROM customer WHERE c_custkey % 17 = 3 AND c_custkey % 10 <> 0
    UNION ALL
    SELECT c_custkey + 1000000 AS c_custkey, 77 AS c_nationkey, 'I' AS op
    FROM customer WHERE c_custkey % 97 = 5
)
SELECT c_custkey, 'has_big_order' AS status FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
UNION ALL
SELECT c_custkey, 'no_orders' AS status FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT c_custkey, 'merge_upserted:' || CAST(c_nationkey AS VARCHAR) AS status
FROM chg WHERE op <> 'D'
UNION ALL
SELECT c.c_custkey, 'merge_kept' AS status FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM chg WHERE chg.c_custkey = c.c_custkey)
UNION ALL
SELECT c_custkey, 'merge_deleted' AS status FROM chg WHERE op = 'D'
UNION ALL
SELECT c_custkey, 'scd2_closed' AS status FROM chg
WHERE op <> 'D' AND EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = chg.c_custkey)
UNION ALL
SELECT c_custkey, 'scd2_current:' || CAST(c_nationkey AS VARCHAR) AS status
FROM chg WHERE op <> 'D'
UNION ALL
SELECT chg.c_custkey, 'scd2_asof_old:' || CAST(c.c_nationkey AS VARCHAR) AS status
FROM chg JOIN customer c ON c.c_custkey = chg.c_custkey
WHERE chg.op <> 'D'
"""


# --- window functions: rank within partition + running aggregate ------------

def q_window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "o_custkey",
            "rnk",
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
        )
    )


ORACLE_WINDOW_TOPK = """
SELECT o_custkey, rnk, o_orderkey, totalprice
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice AS totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rnk
    FROM orders
) WHERE rnk <= 3
"""


def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(F.col("o_totalprice").cast("decimal(28,6)")).over(w) * 100)
        .cast("bigint")
        .alias("running_spend_cents"),
    )


ORACLE_WINDOW_RUNNING_SUM = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100 AS BIGINT)
           AS running_spend_cents
FROM orders
"""


def q_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both window-function families over one scan: ranking
    (row_number within customer by price, with total tie-break) and a
    running frame aggregate (cumulative spend in order-date order). Merges
    round-2 rel_window_topk_per_customer + rel_window_running_sum; the
    per-group top-k filter shape stays pinned by rel_shipping_priority_topk
    and the in-query `rnk` column."""
    orders = _t(spark, sf_dir, "orders")
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w_rank).alias("rnk"),
        (F.sum(F.col("o_totalprice").cast("decimal(28,6)")).over(w_run) * 100)
        .cast("bigint")
        .alias("running_spend_cents"),
    )


ORACLE_WINDOWS = """
SELECT o_custkey, o_orderkey,
       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100 AS BIGINT)
           AS running_spend_cents
FROM orders
"""


# --- distinct aggregates -----------------------------------------------------

def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


ORACLE_DISTINCT_AGG = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_supp,
       COUNT(DISTINCT l_partkey) AS n_part,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


# --- set operations ----------------------------------------------------------

def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (EXCEPT/INTERSECT over nation keys) plus the global
    sort+limit top-k demonstration in one labeled-section union (round-3
    window consolidation: folds rel_top_orders in — superset schema with
    NULLs where a section has no value for a column)."""
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust_nations = customer.select(F.col("c_nationkey").alias("nationkey")).distinct()
    supp_nations = supplier.select(F.col("s_nationkey").alias("nationkey")).distinct()
    null_price = F.lit(None).cast("double").alias("totalprice")
    null_prio = F.lit(None).cast("string").alias("orderpriority")
    only_cust = cust_nations.exceptAll(supp_nations).select(
        F.col("nationkey").cast("long").alias("key"),
        F.lit("customers_only").alias("side"),
        null_price,
        null_prio,
    )
    both = cust_nations.intersect(supp_nations).select(
        F.col("nationkey").cast("long").alias("key"),
        F.lit("both").alias("side"),
        null_price,
        null_prio,
    )
    top = (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select(
            F.col("o_orderkey").cast("long").alias("key"),
            F.lit("top_order").alias("side"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
    )
    return only_cust.unionAll(both).unionAll(top)


ORACLE_SET_OPS = """
SELECT CAST(nationkey AS BIGINT) AS key, 'customers_only' AS side,
       CAST(NULL AS DOUBLE) AS totalprice, CAST(NULL AS VARCHAR) AS orderpriority
FROM (
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
)
UNION ALL
SELECT CAST(nationkey AS BIGINT) AS key, 'both' AS side,
       CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)
FROM (
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
)
UNION ALL
SELECT * FROM (
    SELECT CAST(o_orderkey AS BIGINT) AS key, 'top_order' AS side,
           CAST(o_totalprice AS DOUBLE) AS totalprice, o_orderpriority
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
)
"""


# --- sort + limit (global top-k with total tie-break) ------------------------

def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", F.col("o_totalprice").alias("totalprice"), "o_orderpriority")
    )


ORACLE_TOP_ORDERS = """
SELECT o_orderkey, o_totalprice AS totalprice, o_orderpriority
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
"""


# --- rollup (grouping sets) --------------------------------------------------

def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("bigint").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


ORACLE_ROLLUP = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS BIGINT) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- correlated scalar subquery shape: part below-average price per type ----

def q_below_avg_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    avg_by_type = part.groupBy(F.col("p_type").alias("t")).agg(
        # decimal sum (exact, order-free) then double divide: deterministic
        # across engines, unlike avg() over doubles
        (F.sum(F.col("p_retailprice").cast("decimal(18,4)")).cast("double") / F.count(F.lit(1)))
        .alias("avg_price")
    )
    return (
        part.join(F.broadcast(avg_by_type), part.p_type == avg_by_type.t)
        .where(F.col("p_retailprice") < F.col("avg_price"))
        .select("p_partkey", "p_type", F.col("p_retailprice").alias("retailprice"))
    )


ORACLE_BELOW_AVG_PARTS = """
SELECT p_partkey, p_type, p_retailprice AS retailprice
FROM part p
WHERE p_retailprice < (SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) FROM part p2 WHERE p2.p_type = p.p_type)
"""


# Driver-window registration (round-3 consolidation): rel_distinct_agg is
# folded into rel_pricing_summary, the two window queries into rel_windows,
# rel_top_orders into rel_set_ops (labeled 'top_order' section), and
# rel_rollup into rel_pricing_summary (same grain, computed with ROLLUP +
# 'ALL' labels) — the freed slots fund pretrain_chunking, sketch_count_min
# and events_resample_ffill (contract/extensions.py).
register("rel_pricing_summary", q_pricing_summary, ORACLE_PRICING_SUMMARY)
register("rel_join_revenue_by_nation", q_revenue_by_nation, ORACLE_REVENUE_BY_NATION)
register("rel_semi_anti_join", q_semi_anti_join, ORACLE_SEMI_ANTI_JOIN)
register("rel_windows", q_windows, ORACLE_WINDOWS)
register("rel_set_ops", q_set_ops, ORACLE_SET_OPS)
register("rel_below_avg_parts", q_below_avg_parts, ORACLE_BELOW_AVG_PARTS)


# --- exact percentiles (Spark `percentile` == DuckDB quantile_cont,
#     verified bit-exact on this data) ---------------------------------------

def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
            F.min("l_extendedprice").alias("pmin"),
            F.max("l_extendedprice").alias("pmax"),
        )
    )


ORACLE_PERCENTILES = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.95) AS p95,
       MIN(l_extendedprice) AS pmin,
       MAX(l_extendedprice) AS pmax
FROM lineitem GROUP BY l_returnflag
"""


register("rel_percentiles", q_percentiles, ORACLE_PERCENTILES)


# --- sketches: HLL approximate distinct (rows-only: approximate by design) ---

def q_sketch_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch per group — the constant-memory
    path a 100 TB rollup uses where exact COUNT(DISTINCT) would shuffle
    every key. Approximate, so driver records a rows-only check; the unit
    test bounds the error against the exact count."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# registered in contract/approx.py (rows-only queries go after the driver's
# 50-row oracle window)


# --- TPC-H Q3 shape: filtered multi-join + grouped revenue top-k -------------

def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    price = "decimal(18,4)"
    disc = "decimal(8,6)"
    revenue = (
        F.col("l_extendedprice").cast(price)
        * (F.lit(1).cast(disc) - F.col("l_discount").cast(disc))
    ).cast("decimal(38,10)")
    cutoff = F.lit("1995-03-15").cast("timestamp")
    return (
        customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, customer.c_custkey == orders.o_custkey)
        .where(F.col("o_orderdate") < cutoff)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .where(F.col("l_shipdate") > cutoff)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(revenue) * 10000).cast("bigint").alias("revenue_e4"))
        .orderBy(F.col("revenue_e4").desc(), F.col("o_orderkey"))
        .limit(20)
        .select(
            "o_orderkey",
            # o_orderdate arrives TIMESTAMP_NTZ; the UTC-pinned session makes
            # the cast equal DuckDB's naive epoch_us
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_us"),
            "o_orderpriority",
            "revenue_e4",
        )
    )


ORACLE_SHIPPING_PRIORITY = """
SELECT o_orderkey,
       epoch_us(o_orderdate) AS orderdate_us,
       o_orderpriority,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
            * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))
            AS DECIMAL(38,10))) * 10000 AS BIGINT) AS revenue_e4
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_e4 DESC, o_orderkey
LIMIT 20
"""


register("rel_shipping_priority_topk", q_shipping_priority, ORACLE_SHIPPING_PRIORITY)
