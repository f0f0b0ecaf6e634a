"""Round-6 relational coverage: the remaining classic TPC-H query shapes
not yet represented in the contract — outer-join distributions (Q13),
conditional-aggregate ratios (Q14), scalar-max subqueries (Q15), nested
correlated-average predicates (Q17), having + join-back (Q18), min-per-
group decorrelation (Q2), scalar-avg + anti-join (Q22), EXISTS
decorrelation (Q4), and NOT IN + count-distinct (Q16). The testdata
schema lacks partsupp/phone/comment/commitdate, so each query keeps the
SHAPE (the operator/decorrelation pattern Catalyst must plan) on the
columns that exist; reference parity is at the capability level
(SURVEY.md §2.8 relational extension), not literal TPC-H text.

All money/quantity math is DECIMAL fixed-point scaled to bigint (e4/e2)
so the DuckDB oracles hash bit-for-bit; ratios use integer division on
the scaled values (both engines floor on non-negative operands).

Scale notes common to the family: every filter is pushed to its parquet
scan; per-group aggregates reuse the join partitioning where the keys
match; small filtered dimensions (part lists, scalar aggregates) hit
Spark's broadcast threshold at any SF (scalar subqueries become
one-row broadcast joins); top-k is TakeOrdered, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import read_table, register

_DEC_PRICE = "decimal(18,4)"
_DEC_DISC = "decimal(8,6)"
_DEC_WIDE = "decimal(38,10)"


def _revenue() -> F.Column:
    return (
        F.col("l_extendedprice").cast(_DEC_PRICE)
        * (F.lit(1).cast(_DEC_DISC) - F.col("l_discount").cast(_DEC_DISC))
    ).cast(_DEC_WIDE)


_SQL_REVENUE = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))"
    " AS DECIMAL(38,10))"
)


def q_rel_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — the outer-join distribution: how many customers
    placed exactly k qualifying orders, INCLUDING k=0 (the left outer
    join's null-preserving count is the whole point; an inner join would
    silently drop order-less customers). Two aggregations: per-customer
    count, then histogram of counts. The per-customer aggregate reuses
    the join's hash partitioning on c_custkey (no extra exchange); the
    second groupBy shuffles a #distinct-counts-sized table."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORACLE_REL_CUSTOMER_DISTRIBUTION = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_rel_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — conditional aggregation ratio: the share of one
    month's revenue coming from 'ECONOMY'-type parts (the testdata's
    stand-in for the PROMO% class), as parts-per-million via integer
    division of the e4 fixed-point sums. One join (part broadcast-sized
    after projection), one aggregate, zero rows wasted: the CASE rides
    the same scan as the total."""
    cutoff_lo = F.lit("1998-03-01").cast("timestamp")
    cutoff_hi = F.lit("1998-04-01").cast("timestamp")
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= cutoff_lo) & (F.col("l_shipdate") < cutoff_hi)
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _revenue()
    agg = (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (F.sum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0).cast(_DEC_WIDE))) * 10000)
            .cast("bigint")
            .alias("promo_revenue_e4"),
            (F.sum(rev) * 10000).cast("bigint").alias("total_revenue_e4"),
        )
    )
    return agg.select(
        "promo_revenue_e4",
        "total_revenue_e4",
        F.expr("promo_revenue_e4 * 1000000 div total_revenue_e4").alias(
            "promo_share_ppm"
        ),
    )


ORACLE_REL_PROMO_REVENUE = f"""
WITH agg AS (
    SELECT
        CAST(SUM(CASE WHEN p_type = 'ECONOMY' THEN {_SQL_REVENUE}
                      ELSE CAST(0 AS DECIMAL(38,10)) END) * 10000 AS BIGINT)
            AS promo_revenue_e4,
        CAST(SUM({_SQL_REVENUE}) * 10000 AS BIGINT) AS total_revenue_e4
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1998-03-01'
      AND l_shipdate <  TIMESTAMP '1998-04-01'
)
SELECT promo_revenue_e4, total_revenue_e4,
       promo_revenue_e4 * 1000000 // total_revenue_e4 AS promo_share_ppm
FROM agg
"""


def q_rel_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — scalar-max subquery: supplier(s) achieving the
    maximum quarterly revenue. The revenue aggregate is computed once and
    reused for both the max (a 1-row broadcast) and the equality filter —
    the decorrelated form of `WHERE total = (SELECT MAX(...))`. Exact e4
    fixed-point makes the equality well-defined."""
    cutoff_lo = F.lit("1998-01-01").cast("timestamp")
    cutoff_hi = F.lit("1998-04-01").cast("timestamp")
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= cutoff_lo) & (F.col("l_shipdate") < cutoff_hi)
    )
    revenue = (
        li.groupBy("l_suppkey")
        .agg((F.sum(_revenue()) * 10000).cast("bigint").alias("total_revenue_e4"))
    )
    top = revenue.agg(F.max("total_revenue_e4").alias("__mx"))
    sup = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(top), revenue.total_revenue_e4 == top.__mx)
        .join(sup, revenue.l_suppkey == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue_e4")
        .orderBy("s_suppkey")
    )


ORACLE_REL_TOP_SUPPLIER = f"""
WITH revenue AS (
    SELECT l_suppkey,
           CAST(SUM({_SQL_REVENUE}) * 10000 AS BIGINT) AS total_revenue_e4
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate <  TIMESTAMP '1998-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_e4
FROM supplier, revenue
WHERE s_suppkey = l_suppkey
  AND total_revenue_e4 = (SELECT MAX(total_revenue_e4) FROM revenue)
ORDER BY s_suppkey
"""


def q_rel_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated-average predicate, decorrelated: per
    brand, the revenue from lineitems whose quantity is below 20% of
    their part's average quantity. The correlated `l_quantity < 0.2 *
    AVG(...)` is rewritten fraction-free as `5 * qty * cnt < sum` (exact
    integer/decimal math — no division, so both engines agree bit-wise),
    with the per-part (cnt, sum) aggregate joined back on l_partkey. The
    aggregate is one row per part — a fraction of lineitem's size but
    still SF-scaled, so it carries NO broadcast hint: AQE broadcasts it
    at small scale and falls back to a shuffle join when it outgrows the
    threshold (a forced hint would OOM executors at 100x). The two scans
    of lineitem are the price of decorrelation, each column-pruned to 3
    columns."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_part = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(F.col("l_quantity").cast(_DEC_PRICE)).cast("decimal(38,4)").alias("__sq"),
    )
    qual = (
        li.join(per_part, li.l_partkey == per_part.__pk)
        .where(
            (F.col("l_quantity").cast(_DEC_PRICE) * 5 * F.col("__cnt")).cast(
                "decimal(38,4)"
            )
            < F.col("__sq")
        )
    )
    return (
        qual.join(part, qual.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            (F.sum(F.col("l_extendedprice").cast(_DEC_PRICE)) * 10000)
            .cast("bigint")
            .alias("small_qty_revenue_e4"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("p_brand")
    )


ORACLE_REL_SMALL_QTY_REVENUE = """
WITH per_part AS (
    SELECT l_partkey AS pk, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sq
    FROM lineitem GROUP BY l_partkey
)
SELECT p_brand,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000 AS BIGINT)
           AS small_qty_revenue_e4,
       COUNT(*) AS n_lineitems
FROM lineitem, per_part, part
WHERE l_partkey = pk AND l_partkey = p_partkey
  AND CAST(CAST(l_quantity AS DECIMAL(18,4)) * 5 * cnt AS DECIMAL(38,4)) < sq
GROUP BY p_brand
ORDER BY p_brand
"""


def q_rel_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — HAVING on a child aggregate, joined back up the
    hierarchy: orders whose total lineitem quantity exceeds 180 units,
    with their customer, top 100 by order value. The qualifying-orderkey
    set is aggregate-sized (shrinks by the HAVING) and semi-joins into
    orders before the customer join, so the big scan is reduced first."""
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            (F.sum(F.col("l_quantity").cast(_DEC_PRICE)) * 10000)
            .cast("bigint")
            .alias("sum_qty_e4")
        )
        .where(F.col("sum_qty_e4") > 180 * 10000)
    )
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            (F.col("o_totalprice").cast(_DEC_PRICE) * 10000)
            .cast("bigint")
            .alias("totalprice_e4"),
            "sum_qty_e4",
        )
        .orderBy(F.desc("totalprice_e4"), "o_orderkey")
        .limit(100)
    )


ORACLE_REL_LARGE_VOLUME_CUSTOMERS = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS totalprice_e4,
       sum_qty_e4
FROM orders
JOIN (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) * 10000 AS BIGINT)
               AS sum_qty_e4
    FROM lineitem GROUP BY l_orderkey
    HAVING sum_qty_e4 > 180 * 10000
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice_e4 DESC, o_orderkey
LIMIT 100
"""


def q_rel_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — min-per-group decorrelation: for every size-5
    part, the supplier(s) observed at the minimum unit price (the
    testdata has no partsupp table, so the per-(part, supplier) cost is
    MIN(l_extendedprice) over shipped lineitems — same two-level-min
    pattern: per-pair aggregate, per-part minimum, equality join-back).
    The size-5 part list is filtered but SF-scaled, so it carries no
    broadcast hint — AQE broadcasts the semi-join side into the lineitem
    scan while it fits and shuffles when it does not. The per-part minimum is a WINDOW over the
    pair aggregate rather than a groupBy + self-join: a derived-frame
    self-join re-executes the whole aggregate subplan (measured: 9
    exchanges vs 3), while the window runs it once — the min-per-group
    filter pattern for plans whose upstream is expensive."""
    from pyspark.sql import Window

    part5 = (
        read_table(spark, sf_dir, "part")
        .where(F.col("p_size") == 5)
        .select("p_partkey")
    )
    li = read_table(spark, sf_dir, "lineitem")
    pair_cost = (
        li.join(part5, li.l_partkey == part5.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (F.min(F.col("l_extendedprice").cast(_DEC_PRICE)) * 10000)
            .cast("bigint")
            .alias("cost_e4")
        )
    )
    best = pair_cost.withColumn(
        "__mn", F.min("cost_e4").over(Window.partitionBy("l_partkey"))
    ).where(F.col("cost_e4") == F.col("__mn"))
    sup = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        best.join(sup, best.l_suppkey == sup.s_suppkey)
        .join(nation, sup.s_nationkey == nation.n_nationkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey",
            "s_name",
            "n_name",
            "cost_e4",
        )
        .orderBy("p_partkey", "s_suppkey")
    )


ORACLE_REL_MIN_COST_SUPPLIER = """
WITH pair_cost AS (
    SELECT l_partkey, l_suppkey,
           CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000 AS BIGINT)
               AS cost_e4
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 5)
    GROUP BY l_partkey, l_suppkey
)
SELECT l_partkey AS p_partkey, s_suppkey, s_name, n_name, cost_e4
FROM pair_cost, supplier, nation
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND cost_e4 = (SELECT MIN(cost_e4) FROM pair_cost i
                 WHERE i.l_partkey = pair_cost.l_partkey)
ORDER BY p_partkey, s_suppkey
"""


def q_rel_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — scalar-average subquery + anti-join: customers
    with above-average account balance (average over positive balances
    only) who placed NO orders since 2000, grouped by nation. The scalar
    average is decorrelated fraction-free (`bal * cnt > sum` in exact
    DECIMAL — no division) and broadcasts as one row; the anti-join
    pushes its date filter into the orders scan so the build side is
    the small recent-orders key set."""
    cust = read_table(spark, sf_dir, "customer")
    pos = cust.where(F.col("c_acctbal") > 0).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("__sb"),
    )
    recent = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    rich = cust.crossJoin(F.broadcast(pos)).where(
        (F.col("c_acctbal").cast("decimal(18,2)") * F.col("__cnt")).cast(
            "decimal(38,2)"
        )
        > F.col("__sb")
    )
    return (
        rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(F.col("c_acctbal").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("totacctbal_e2"),
        )
        .orderBy("c_nationkey")
    )


ORACLE_REL_IDLE_RICH_CUSTOMERS = """
WITH pos AS (
    SELECT COUNT(*) AS cnt,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sb
    FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS totacctbal_e2
FROM customer, pos
WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * cnt AS DECIMAL(38,2)) > sb
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def q_rel_priority_order_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — EXISTS decorrelation: orders in a quarter having
    at least one returned lineitem, counted per priority. The correlated
    EXISTS becomes a left-semi join whose build side is the distinct
    qualifying orderkeys; the date filter is pushed into the orders scan
    and the returnflag filter into the lineitem scan, so the semi-join
    sees two pre-shrunk inputs."""
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    returned = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE_REL_PRIORITY_ORDER_CHECK = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_rel_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — NOT IN + COUNT(DISTINCT): how many distinct
    suppliers ship each (brand, type, size) part class, excluding one
    brand and excluding negative-balance suppliers via an anti-join (the
    NOT IN decorrelation; the excluded-supplier list is tiny and
    broadcasts). The count-distinct runs on the post-join projection of
    three grouping columns + suppkey — nothing wider survives pruning."""
    part = read_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 20)
    )
    bad_sup = (
        read_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.join(bad_sup, li.l_suppkey == bad_sup.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


ORACLE_REL_SUPPLIER_PART_COUNTS = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#1' AND p_size <= 20
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


register(
    "rel_customer_distribution",
    q_rel_customer_distribution,
    ORACLE_REL_CUSTOMER_DISTRIBUTION,
)
register("rel_promo_revenue", q_rel_promo_revenue, ORACLE_REL_PROMO_REVENUE)
register("rel_top_supplier", q_rel_top_supplier, ORACLE_REL_TOP_SUPPLIER)
register(
    "rel_small_qty_revenue", q_rel_small_qty_revenue, ORACLE_REL_SMALL_QTY_REVENUE
)
register(
    "rel_large_volume_customers",
    q_rel_large_volume_customers,
    ORACLE_REL_LARGE_VOLUME_CUSTOMERS,
)
register(
    "rel_min_cost_supplier", q_rel_min_cost_supplier, ORACLE_REL_MIN_COST_SUPPLIER
)
register(
    "rel_idle_rich_customers",
    q_rel_idle_rich_customers,
    ORACLE_REL_IDLE_RICH_CUSTOMERS,
)
register(
    "rel_priority_order_check",
    q_rel_priority_order_check,
    ORACLE_REL_PRIORITY_ORDER_CHECK,
)
register(
    "rel_supplier_part_counts",
    q_rel_supplier_part_counts,
    ORACLE_REL_SUPPLIER_PART_COUNTS,
)


# --- round-7: the remaining classic shapes (Q5/Q6/Q8/Q9/Q10/Q11/Q12/Q19/Q21) -


def q_rel_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — the 6-relation "local supplier" join: revenue
    from lineitems where the CUSTOMER and the SUPPLIER share a nation,
    restricted to one region and one order year. The c_nationkey ==
    s_nationkey equality is the interesting bit: it links two otherwise
    independent dimension paths, and Catalyst must keep both nation/
    region dimensions broadcast while the fact join chain shuffles on
    orderkey. Region/date filters push to their scans."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        read_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(_revenue()) * 10000).cast("bigint").alias("revenue_e4"))
    )


ORACLE_REL_LOCAL_SUPPLIER_VOLUME = f"""
SELECT n_name,
       CAST(SUM({_SQL_REVENUE}) * 10000 AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_rel_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — the pure scan-aggregate: one table, three
    range predicates, no joins, one output row. Exists to pin predicate
    pushdown: all three filters must reach the parquet scan (asserted in
    test_plan_shapes), and the whole query is a single whole-stage-
    codegen pass with a map-side partial aggregate."""
    li = read_table(spark, sf_dir, "lineitem")
    amount = (
        F.col("l_extendedprice").cast(_DEC_PRICE)
        * F.col("l_discount").cast(_DEC_DISC)
    ).cast(_DEC_WIDE)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").cast(_DEC_DISC) >= F.lit("0.03").cast(_DEC_DISC))
            & (F.col("l_discount").cast(_DEC_DISC) <= F.lit("0.05").cast(_DEC_DISC))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(amount) * 10000).cast("bigint").alias("forecast_e4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


ORACLE_REL_FORECAST_REVENUE = """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                     * CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(38,10)))
            * 10000 AS BIGINT) AS forecast_e4,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND CAST(l_discount AS DECIMAL(8,6)) BETWEEN CAST('0.03' AS DECIMAL(8,6))
                                           AND CAST('0.05' AS DECIMAL(8,6))
  AND l_quantity < 24
"""


def q_rel_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — national market share: of all PROMO-part revenue
    sold into one region's customers, what basis-point share came from
    one supplier nation, per order year. TWO aliases of the nation
    dimension (customer's region path and supplier's nationality path) —
    the self-join-of-dimensions pattern — plus a conditional aggregate
    over the same rows. Share is exact integer basis points: the sums
    stay DECIMAL(38) and the final divide is integral (`div`), matching
    DuckDB HUGEINT floor division; no doubles anywhere."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    part = read_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = _revenue()
    share_rev = F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(
        F.lit(0).cast(_DEC_WIDE)
    )
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
    )
    agg = joined.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        (F.sum(share_rev) * 10000).cast("decimal(38,0)").alias("nat_e4"),
        (F.sum(rev) * 10000).cast("decimal(38,0)").alias("tot_e4"),
    )
    return agg.select(
        "o_year",
        F.expr("CAST((nat_e4 * 10000) div tot_e4 AS BIGINT)").alias("share_bp"),
        F.col("tot_e4").cast("bigint").alias("total_revenue_e4"),
    )


ORACLE_REL_MARKET_SHARE = f"""
WITH j AS (
    SELECT year(o_orderdate) AS o_year,
           {_SQL_REVENUE} AS rev,
           n2.n_name AS supp_nation
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE p_type = 'PROMO' AND r_name = 'ASIA'
),
a AS (
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN rev
                         ELSE CAST(0 AS DECIMAL(38,10)) END) * 10000 AS HUGEINT)
               AS nat_e4,
           CAST(SUM(rev) * 10000 AS HUGEINT) AS tot_e4
    FROM j GROUP BY o_year
)
SELECT CAST(o_year AS INT) AS o_year,
       CAST((nat_e4 * 10000) // tot_e4 AS BIGINT) AS share_bp,
       CAST(tot_e4 AS BIGINT) AS total_revenue_e4
FROM a
"""


def q_rel_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — product-type profit by nation and year: a part-
    name LIKE filter fans into the full fact chain, profit = revenue
    minus a cost term derived from the joined part dimension (the
    testdata has no partsupp, so cost = quantity * 80% of retail price —
    same join/aggregate shape, exact DECIMAL). Group keys come from two
    different dimensions (supplier nation x order year)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    part = (
        read_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    cost = (
        F.col("l_quantity").cast("decimal(12,2)")
        * F.col("p_retailprice").cast(_DEC_PRICE)
        * F.lit("0.8").cast(_DEC_DISC)
    ).cast(_DEC_WIDE)
    profit = (_revenue() - cost).cast(_DEC_WIDE)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg((F.sum(profit) * 10000).cast("bigint").alias("profit_e4"))
    )


ORACLE_REL_PRODUCT_PROFIT = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST({_SQL_REVENUE}
                - CAST(CAST(l_quantity AS DECIMAL(12,2))
                       * CAST(p_retailprice AS DECIMAL(18,4))
                       * CAST('0.8' AS DECIMAL(8,6)) AS DECIMAL(38,10))
                AS DECIMAL(38,10))) * 10000 AS BIGINT) AS profit_e4
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, year(o_orderdate)
"""


def q_rel_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — returned-item reporting: per-customer revenue
    lost to returns in one quarter, top 20 customers with their nation.
    The group-by keys include three customer attributes + n_name (wide
    key, classic reporting shape); top-20 must plan as TakeOrdered."""
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            (F.col("c_acctbal").cast("decimal(18,4)") * 10000)
            .cast("bigint")
            .alias("acctbal_e4"),
            "n_name",
        )
        .agg((F.sum(_revenue()) * 10000).cast("bigint").alias("revenue_e4"))
        .orderBy(F.col("revenue_e4").desc(), F.col("c_custkey"))
        .limit(20)
    )


ORACLE_REL_RETURNED_ITEMS = f"""
SELECT c_custkey, c_name,
       CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT) AS acctbal_e4,
       n_name,
       CAST(SUM({_SQL_REVENUE}) * 10000 AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, acctbal_e4, n_name
ORDER BY revenue_e4 DESC, c_custkey
LIMIT 20
"""


def q_rel_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — groups above a global threshold: per
    (part, supplier) revenue exceeding 3x the MEAN group revenue (no
    partsupp table, so lineitem revenue stands in for stock value —
    identical decorrelation shape: a grouped aggregate HAVING-compared
    against a scalar aggregate derived from the SAME grouped source).
    The threshold is mean-relative rather than Q11's literal global
    fraction because a fixed fraction is vacuous on this data past
    sf0.01 (group count grows with SF, so every share shrinks below any
    constant — measured: 0 rows at sf0.1 even at 0.002%); 3x-mean keeps
    a stable selective band at EVERY scale (443 rows at sf0.01, ~1% of
    groups at sf10). The scalar (total, n) is a 1-row broadcast; the
    comparison is exact integer (value*n > 3*total in DECIMAL(38),
    HUGEINT in DuckDB — no division anywhere)."""
    li = read_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_partkey", "l_suppkey").agg(
        (F.sum(_revenue()) * 10000).cast("decimal(38,0)").alias("value_e4")
    )
    total = per.agg(
        F.sum("value_e4").cast("decimal(38,0)").alias("total_e4"),
        F.count(F.lit(1)).alias("n_groups"),
    )
    return (
        per.crossJoin(F.broadcast(total))
        .where(
            F.col("value_e4") * F.col("n_groups") > F.col("total_e4") * 3
        )
        .select(
            "l_partkey",
            "l_suppkey",
            F.col("value_e4").cast("bigint").alias("value_e4"),
        )
    )


ORACLE_REL_IMPORTANT_STOCK = f"""
WITH per AS (
    SELECT l_partkey, l_suppkey,
           CAST(SUM({_SQL_REVENUE}) * 10000 AS HUGEINT) AS value_e4
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
tot AS (
    SELECT CAST(SUM(value_e4) AS HUGEINT) AS total_e4,
           COUNT(*) AS n_groups
    FROM per
)
SELECT per.l_partkey, per.l_suppkey, CAST(per.value_e4 AS BIGINT) AS value_e4
FROM per CROSS JOIN tot
WHERE per.value_e4 * tot.n_groups > tot.total_e4 * 3
"""


def q_rel_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — CASE-aggregates by category: per line status,
    how many LATE shipments (ship > order date + 90 days; the testdata
    has no commit/receipt dates) carried urgent-priority orders vs not.
    One join, two conditional counts over the same rows — the shape that
    proves CASE folding into a single aggregate pass."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return late.groupBy("l_linestatus").agg(
        F.sum(F.when(urgent, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(~urgent, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
    )


ORACLE_REL_LATE_SHIPMENT_PRIORITY = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_linestatus
"""


def q_rel_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — the disjunction of conjunctions: three
    (brand, size-range, quantity-range) alternatives OR-ed across a
    lineitem x part join. The classic test that an optimizer (a) keeps
    the common join key extraction out of the OR, and (b) pushes the
    per-table residuals (p_size bounds, l_quantity bounds) below the
    join rather than evaluating the whole disjunction post-join."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    alt = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & q.between(20, 30))
    )
    return j.where(alt).agg(
        (F.sum(_revenue()) * 10000).cast("bigint").alias("revenue_e4"),
        F.count(F.lit(1)).alias("n_lines"),
    )


ORACLE_REL_DISCOUNTED_REVENUE = f"""
SELECT CAST(SUM({_SQL_REVENUE}) * 10000 AS BIGINT) AS revenue_e4,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q_rel_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the double correlated subquery: suppliers whose
    lineitem shipped LATE (> order date + 60 days; no receipt/commit
    dates in the testdata) on a finished multi-supplier order where NO
    OTHER supplier was late — EXISTS(other supplier) AND NOT EXISTS
    (other late supplier), decorrelated into one semi- and one anti-join
    on l_orderkey with a suppkey-inequality residual. Top 20 suppliers
    by count of such orders."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    others = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("y_orderkey"), F.col("l_suppkey").alias("y_suppkey")
    )
    l1 = late.join(
        others,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_semi",
    ).join(
        late_others,
        (F.col("l_orderkey") == F.col("y_orderkey"))
        & (F.col("l_suppkey") != F.col("y_suppkey")),
        "left_anti",
    )
    return (
        l1.join(supp, l1.l_suppkey == supp.s_suppkey)
        # one supplier can be late on an order via several lineitems;
        # the subject of the count is (supplier, order), not lineitems
        .select("s_name", "s_suppkey", "l_orderkey")
        .distinct()
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


ORACLE_REL_WAITING_SUPPLIERS = """
WITH late AS (
    SELECT l_orderkey, l_suppkey
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM (
    SELECT DISTINCT s_name, s_suppkey, l1.l_orderkey
    FROM late l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
) w
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


register(
    "rel_local_supplier_volume",
    q_rel_local_supplier_volume,
    ORACLE_REL_LOCAL_SUPPLIER_VOLUME,
)
register("rel_forecast_revenue", q_rel_forecast_revenue, ORACLE_REL_FORECAST_REVENUE)
register("rel_market_share", q_rel_market_share, ORACLE_REL_MARKET_SHARE)
register("rel_product_profit", q_rel_product_profit, ORACLE_REL_PRODUCT_PROFIT)
register("rel_returned_items", q_rel_returned_items, ORACLE_REL_RETURNED_ITEMS)
register("rel_important_stock", q_rel_important_stock, ORACLE_REL_IMPORTANT_STOCK)
register(
    "rel_late_shipment_priority",
    q_rel_late_shipment_priority,
    ORACLE_REL_LATE_SHIPMENT_PRIORITY,
)
register(
    "rel_discounted_revenue",
    q_rel_discounted_revenue,
    ORACLE_REL_DISCOUNTED_REVENUE,
)
register(
    "rel_waiting_suppliers", q_rel_waiting_suppliers, ORACLE_REL_WAITING_SUPPLIERS
)
