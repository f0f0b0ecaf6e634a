"""After-window contract queries: the rows-only approximate family plus
oracle-checked overflow.

Everything here registers AFTER the driver's 50-row CORRECTNESS window on
purpose. Window slots go to oracle-checked queries (a rows-only driver row
carries no hash check); overflow queries — whether rows-only or fully
oracle-checked — run under the identical in-repo gate
``tests/test_contract_oracle.py`` instead of getting a driver row. Each
rows-only query is bounded by a named accuracy/determinism unit test:

- ``sketch_approx_distinct``  — HLL error bound, tests/test_extensions.py
- ``ann_lsh_topk``            — multi-probe recall gate, tests/test_extensions.py
- ``ann_ivf_topk``            — IVF recall gate, tests/test_extensions.py
- ``ann_ivf_quantized_topk``  — quantized-IVF recall gate (round 3)
- ``ann_ivf_pq_topk``         — IVF-PQ (ADC + exact rerank) recall gate (round 3)
- ``retrieval_bm25_topk``     — exact-vs-Python BM25 gate, tests/test_retrieval.py
- ``retrieval_hybrid_rrf``    — hand-computed RRF gate, tests/test_retrieval.py

and every one of them runs (rows+schema materialization) in the in-repo gate
``tests/test_contract_oracle.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import read_table, register
from .extensions import _D_TOKENS, _emb, q_ann_ivf_topk, q_ann_lsh_topk
from .relational import q_sketch_approx_distinct


def q_ann_ivf_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB ANN serving shape: int8-quantized corpus probed through
    IVF cells with exact integer dot products inside each cell (round-3
    composition of ivf_topk + quantized scoring — VERDICT r2 'Next round'
    #4). Approximate (cell pruning), so rows-only; recall gated by
    tests/test_extensions.py::test_ann_ivf_quantized_recall."""
    from ..operators.similarity import ivf_topk_quantized

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5)
    return ivf_topk_quantized(emb, queries, k=10, n_centroids=16, n_probe=6)


def q_ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with exact rerank — the billion-scale ANN memory shape
    (8-byte PQ code rows in the candidate join, 32x smaller than float):
    ADC shortlist inside n_probe coarse cells, then exact int8-cosine
    rerank of the top refine*k. Approximate (cell pruning + shortlist
    truncation), so rows-only; recall gated by
    tests/test_extensions.py::test_ann_ivf_pq_recall."""
    from ..operators.similarity import ivf_pq_topk

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5)
    return ivf_pq_topk(emb, queries, k=10, n_centroids=16, n_probe=6, refine=4)


def q_text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BPE tokenization end-to-end: merges trained on the corpus
    word-frequency table (driver-side greedy loop over a bounded dict),
    applied corpus-wide via Arrow-batched mapInPandas. Deterministic but
    genuinely non-SQL-expressible (unbounded ranked-merge iteration per
    word), so rows-only; the algorithm is pinned by hand-computed examples
    and reconstruction/determinism properties in
    tests/test_extensions.py::test_bpe_*."""
    from ..operators.bpe import bpe_encode, bpe_train

    docs = read_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=64)
    return bpe_encode(docs, merges)


def q_sketch_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles per group (Greenwald-Khanna sketch via
    ``approx_percentile``) — the constant-memory companion to the exact
    ``rel_percentiles`` query: at 100 TB an exact grouped percentile sorts
    every group, the sketch streams with bounded state and mergeable
    partials. Approximate (rank error <= the accuracy parameter), so
    rows-only; error bounded against the exact quantiles by
    tests/test_extensions.py::test_approx_quantiles_error_bound."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)"
        ).alias("approx_p"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(
        "l_returnflag",
        F.col("approx_p")[0].alias("p50_approx"),
        F.col("approx_p")[1].alias("p95_approx"),
        "n_rows",
    )


def q_retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical top-10 for five fixed document-derived queries (the
    first 8 tokens of docs 0-4 as query strings). Scores are IEEE doubles
    (BM25's ln has no engine-portable fixed-point form), so rows-only —
    same policy as tf-idf; the scoring math is pinned exactly against a
    plain-Python reference by
    tests/test_retrieval.py::test_bm25_matches_python_reference."""
    from ..operators.retrieval import bm25_topk
    from ..operators.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    qs = docs.where(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, 8)).alias("qtext"),
    )
    return bm25_topk(docs, qs, k=10)


def q_retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical ranks fused with exact-cosine vector
    ranks by reciprocal-rank fusion (fused score is integer-exact given the
    input ranks, but the upstream ranks are float-derived, so rows-only;
    fusion arithmetic pinned by
    tests/test_retrieval.py::test_rrf_fuse_hand_computed)."""
    from ..operators.retrieval import bm25_topk, rrf_fuse
    from ..operators.similarity import cosine_topk
    from ..operators.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    qs = docs.where(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, 8)).alias("qtext"),
    )
    lex = bm25_topk(docs, qs, k=10)
    emb = _emb(spark, sf_dir)
    vec = cosine_topk(emb, emb.where(F.col("vec_id") < 5), k=10).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return rrf_fuse(lex, vec, k0=60, k=10)


def q_quality_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations-style data-quality audit of the orders table: not-null,
    closed-range, accepted-values and uniqueness rules all evaluated in ONE
    aggregation over ONE scan (conditional counters + count_distinct,
    map-side combined), plus a referential-integrity rule as a broadcast
    anti-join against customer. Exact integer counts — oracle-checked
    (registered after the driver window; the in-repo gate
    tests/test_contract_oracle.py hash-checks it)."""
    from ..operators.quality import quality_report

    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    return quality_report(
        orders,
        not_null=["o_orderkey", "o_totalprice"],
        unique=[["o_orderkey"]],
        ranges={"o_totalprice": (0.0, 1_000_000.0)},
        accepted={
            "o_orderpriority": [
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
            ]
        },
        foreign_keys=[("o_custkey", customer, "c_custkey")],
    )


ORACLE_QUALITY_REPORT_ORDERS = """
WITH n AS (SELECT COUNT(*) AS n_rows FROM orders)
SELECT rule, n_violations, n.n_rows, n_violations = 0 AS passed FROM (
    SELECT 'not_null:o_orderkey' AS rule,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'not_null:o_totalprice',
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'range:o_totalprice',
           CAST(SUM(CASE WHEN o_totalprice IS NULL
                          OR NOT (o_totalprice BETWEEN 0.0 AND 1000000.0)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'accepted:o_orderpriority',
           CAST(SUM(CASE WHEN o_orderpriority IS NULL
                          OR o_orderpriority NOT IN
                             ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique:o_orderkey',
           CAST(COUNT(*) - COUNT(DISTINCT ROW(o_orderkey)) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'foreign_key:o_custkey',
           CAST(COUNT(*) FILTER (WHERE o_custkey IS NOT NULL AND NOT EXISTS (
               SELECT 1 FROM customer c WHERE c.c_custkey = orders.o_custkey
           )) AS BIGINT)
    FROM orders
) r CROSS JOIN n
"""


register("sketch_approx_distinct", q_sketch_approx_distinct)
register("sketch_approx_quantiles", q_sketch_approx_quantiles)
register("ann_lsh_topk", q_ann_lsh_topk)
register("ann_ivf_topk", q_ann_ivf_topk)
register("ann_ivf_quantized_topk", q_ann_ivf_quantized_topk)
def q_ann_ivf_pq_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ served from a PERSISTED index (round-4 Next #8 — the actual
    100 TB lifecycle: build offline once, query many). The index
    (cell-partitioned parquet of PQ codes + int8 vectors + codebook
    sidecar) is built on first use per sf_dir and reused; query time is
    then a pruned index scan + ADC + exact rerank, no corpus re-encode.
    Row-identical to ann_ivf_pq_topk by construction
    (tests/test_extensions.py::test_ivf_pq_persisted_index_matches_inmemory),
    so the same recall gate bounds it."""
    import hashlib
    import os
    import tempfile

    from ..operators.similarity import ivf_pq_query_index, ivf_pq_write_index

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5)
    # tag includes the source file's (mtime, size) so a regenerated corpus
    # invalidates the cached index instead of silently serving stale
    # neighbors; the build goes to a temp dir then os.rename (atomic on
    # one filesystem), so a concurrent process either sees the complete
    # index or builds its own and loses the rename race harmlessly
    src = f"{os.path.abspath(sf_dir)}/embeddings.parquet"
    st = os.stat(src)
    tag = hashlib.md5(
        f"{src}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    index_dir = f"/tmp/bamboo-ivfpq-index-{tag}"
    if not os.path.isdir(f"{index_dir}/meta"):
        build = tempfile.mkdtemp(prefix="bamboo-ivfpq-build-")
        ivf_pq_write_index(emb, build, n_centroids=16, m=8, ksub=16)
        try:
            os.rename(build, index_dir)
        except OSError:
            pass  # lost the race to a concurrent builder: theirs is complete
    return ivf_pq_query_index(
        spark, index_dir, queries, k=10, n_probe=6, refine=4
    )


register("ann_ivf_pq_topk", q_ann_ivf_pq_topk)
register("ann_ivf_pq_served", q_ann_ivf_pq_served)
register("text_bpe_encode", q_text_bpe_encode)
register("retrieval_bm25_topk", q_retrieval_bm25_topk)
register("retrieval_hybrid_rrf", q_retrieval_hybrid_rrf)
def q_rel_windows_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the window-function family over one scan: lag/lead
    (previous/next order price within customer), rank vs dense_rank (ties),
    and ntile(4) spend quartiles. All integer/decimal-exact; deterministic
    via the (o_orderdate, o_orderkey) and (o_totalprice, o_orderkey)
    orderings."""
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    w_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag(cents, 1).over(w_time).alias("prev_cents"),
        F.lead(cents, 1).over(w_time).alias("next_cents"),
        F.rank().over(w_price).cast("long").alias("price_rank"),
        F.dense_rank().over(w_price).cast("long").alias("price_dense_rank"),
        F.ntile(4).over(w_price).cast("long").alias("spend_quartile"),
    )


ORACLE_REL_WINDOWS_EXTENDED = """
SELECT o_custkey, o_orderkey,
       LAG(CAST(ROUND(o_totalprice * 100) AS BIGINT), 1)
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_cents,
       LEAD(CAST(ROUND(o_totalprice * 100) AS BIGINT), 1)
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_cents,
       CAST(RANK() OVER w_price AS BIGINT) AS price_rank,
       CAST(DENSE_RANK() OVER w_price AS BIGINT) AS price_dense_rank,
       CAST(NTILE(4) OVER w_price AS BIGINT) AS spend_quartile
FROM orders
WINDOW w_price AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
"""


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def q_rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): revenue cents per nation x order priority as
    five columns. The value list is EXPLICIT, so Spark skips the extra
    distinct-values job and the plan is a single groupBy with conditional
    aggregates — the same shape the DuckDB oracle spells out with CASE."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    dec = "decimal(28,6)"
    joined = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    out = (
        joined.groupBy("n_name")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg((F.sum(F.col("o_totalprice").cast(dec)) * 100).cast("bigint"))
    )
    renames = {p: f"cents_p{i + 1}" for i, p in enumerate(_PRIORITIES)}
    return out.select(
        "n_name", *[F.col(f"`{p}`").alias(renames[p]) for p in _PRIORITIES]
    )


ORACLE_REL_PIVOT = """
SELECT n.n_name,
       CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
                     THEN CAST(o.o_totalprice AS DECIMAL(28,6)) END) * 100 AS BIGINT) AS cents_p1,
       CAST(SUM(CASE WHEN o.o_orderpriority = '2-HIGH'
                     THEN CAST(o.o_totalprice AS DECIMAL(28,6)) END) * 100 AS BIGINT) AS cents_p2,
       CAST(SUM(CASE WHEN o.o_orderpriority = '3-MEDIUM'
                     THEN CAST(o.o_totalprice AS DECIMAL(28,6)) END) * 100 AS BIGINT) AS cents_p3,
       CAST(SUM(CASE WHEN o.o_orderpriority = '4-NOT SPECIFIED'
                     THEN CAST(o.o_totalprice AS DECIMAL(28,6)) END) * 100 AS BIGINT) AS cents_p4,
       CAST(SUM(CASE WHEN o.o_orderpriority = '5-LOW'
                     THEN CAST(o.o_totalprice AS DECIMAL(28,6)) END) * 100 AS BIGINT) AS cents_p5
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def q_events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the hourly rollup is
    maintained as persisted partials — here the history partial (days
    < 2024-01-16) and the delta partial (the rest) are merged by re-summing
    decomposable aggregates — and the merged result must equal a full
    recompute (the oracle IS the full recompute). History is never
    rescanned; the merge input is aggregate-sized."""
    from ..operators.temporal import merge_rollups, time_rollup

    from .extensions import _events

    ev = _events(spark, sf_dir)
    cut = F.lit("2024-01-16").cast("timestamp")
    aggs = [
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    ]
    hist = time_rollup(ev.where(F.col("ts") < cut), keys=["event_type"],
                       aggs=aggs, units=["hour"])
    delta = time_rollup(ev.where(F.col("ts") >= cut), keys=["event_type"],
                        aggs=aggs, units=["hour"])
    merged = merge_rollups(
        [hist, delta],
        keys=["unit", "bucket", "event_type"],
        sum_cols=["n_events", "value_cents"],
    )
    return merged.select(
        "unit",
        F.unix_micros(F.col("bucket")).alias("bucket_us"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("value_cents").cast("long").alias("value_cents"),
    )


# full recompute — merging partials must be indistinguishable from it
ORACLE_EVENTS_INCREMENTAL_ROLLUP = """
SELECT 'hour' AS unit,
       CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS bucket_us,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY 1, 2, 3
"""


def q_events_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly detection with exact integer
    sufficient statistics — (n·x−s)² > z²·(n·q−s²), no float mean/stddev
    in the decision, so the flags are engine-exact (rolling_anomaly_flags
    docstring has the derivation)."""
    from ..operators.temporal import rolling_anomaly_flags

    from .extensions import _events

    ev = _events(spark, sf_dir).withColumn(
        "value_cents", F.round(F.col("value") * 100).cast("long")
    )
    out = rolling_anomaly_flags(
        ev, key_col="user_id", ts_col="ts", value_col="value_cents",
        window="6 hours", z=2,
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "value_cents",
        F.col("n_win").cast("long").alias("n_win"),
        F.col("sum_win").cast("long").alias("sum_win"),
        F.col("sumsq_win").cast("long").alias("sumsq_win"),
        "is_anomaly",
    )


ORACLE_EVENTS_ANOMALIES = """
WITH e AS (
    SELECT event_id, user_id, ts,
           CAST(ROUND(value * 100) AS BIGINT) AS value_cents
    FROM events
),
s AS (
    SELECT event_id, user_id, ts, value_cents,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_win,
           CAST(SUM(value_cents) OVER w AS BIGINT) AS sum_win,
           CAST(SUM(value_cents * value_cents) OVER w AS BIGINT) AS sumsq_win
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, value_cents,
       n_win, sum_win, sumsq_win,
       (n_win * value_cents - sum_win) * (n_win * value_cents - sum_win)
           > 4 * (n_win * sumsq_win - sum_win * sum_win) AS is_anomaly
FROM s
"""


# oracle-checked overflow (after the driver window; in-repo gate applies)
register("quality_report_orders", q_quality_report_orders, ORACLE_QUALITY_REPORT_ORDERS)
register("rel_windows_extended", q_rel_windows_extended, ORACLE_REL_WINDOWS_EXTENDED)
register("rel_pivot", q_rel_pivot, ORACLE_REL_PIVOT)
register(
    "events_incremental_rollup",
    q_events_incremental_rollup,
    ORACLE_EVENTS_INCREMENTAL_ROLLUP,
)
register("events_anomalies", q_events_anomalies, ORACLE_EVENTS_ANOMALIES)


def q_sampling_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training export: md5 sort key ->
    (shard, pos) addresses; per-shard ROW_NUMBER, never a global sort
    (operators/sampling.training_order)."""
    from ..operators.sampling import training_order

    docs = read_table(spark, sf_dir, "documents")
    return training_order(docs, "doc_id", seed=7, n_shards=16)


ORACLE_SAMPLING_TRAINING_ORDER = """
WITH k AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS key
    FROM documents
)
SELECT doc_id,
       CAST(key % 16 AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY key % 16 ORDER BY key, doc_id) AS BIGINT) AS pos
FROM k
"""


register(
    "sampling_training_order",
    q_sampling_training_order,
    ORACLE_SAMPLING_TRAINING_ORDER,
)


def q_text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal over the corpus — Arrow-batched
    mapInPandas (no per-row UDF, no shuffle). Rows-only: DuckDB has no
    zlib; determinism and arithmetic pinned by
    tests/test_retrieval.py::test_compression_ratio_signal."""
    from ..operators.importance import compression_ratio

    docs = read_table(spark, sf_dir, "documents")
    return compression_ratio(docs)


register("text_compression_ratio", q_text_compression_ratio)


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, d=0.85) over the bipartite part↔supplier
    co-occurrence graph from lineitem — exact integer fixed-point
    (operators/graph.py), so the full iteration history hash-matches the
    unrolled DuckDB oracle."""
    from ..operators.graph import pagerank

    li = read_table(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.col("l_partkey").alias("p"),
        (F.col("l_suppkey") + 10_000_000).alias("s"),
    ).distinct()
    edges = pairs.select(F.col("p").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("p").alias("dst"))
    )
    return pagerank(edges, n_iter=3, damping_e4=8500)


def _oracle_pagerank(n_iter: int = 3, d_e4: int = 8500) -> str:
    ctes = [
        "pairs AS (SELECT DISTINCT l_partkey AS p, l_suppkey + 10000000 AS s FROM lineitem)",
        "e AS (SELECT p AS src, s AS dst FROM pairs UNION ALL SELECT s, p FROM pairs)",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e))",
        "t AS (SELECT COUNT(*) AS n FROM nodes)",
        "od AS (SELECT src, COUNT(*) AS odeg FROM e GROUP BY src)",
        "r0 AS (SELECT node, CAST(1000000000 // t.n AS BIGINT) AS rank_e9 "
        "FROM nodes CROSS JOIN t)",
    ]
    for i in range(1, n_iter + 1):
        prev = f"r{i - 1}"
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node, "
            f"CAST(SUM((r.rank_e9 * {d_e4}) // (10000 * od.odeg)) AS BIGINT) AS s "
            f"FROM e JOIN {prev} r ON r.node = e.src JOIN od ON od.src = e.src "
            f"GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i} AS (SELECT nodes.node, "
            f"CAST({(10000 - d_e4) * 1_000_000_000} // (10000 * t.n) "
            f"+ COALESCE(c{i}.s, 0) AS BIGINT) AS rank_e9 "
            f"FROM nodes CROSS JOIN t LEFT JOIN c{i} ON c{i}.node = nodes.node)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, rank_e9 FROM r{n_iter}"


register("graph_pagerank", q_graph_pagerank, _oracle_pagerank())


def q_sampling_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    quality-weighted subset selection — here the 100 longest-text-biased
    docs via n_chars weights. Priorities are md5-uniform^(1/w) doubles
    (pow), so rows-only; formula pinned exactly vs a numpy replay by
    tests/test_retrieval.py::test_weighted_sample_aes_properties."""
    from ..operators.sampling import weighted_sample

    docs = read_table(spark, sf_dir, "documents")
    return weighted_sample(
        docs.select("doc_id", F.col("n_chars").cast("double").alias("w")),
        k=100,
        weight_col="w",
        salt="r3",
    )


register("sampling_weighted", q_sampling_weighted)


def q_text_fuzzy_term_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-level fuzzy matching over the corpus vocabulary: SymSpell
    deletion-neighborhood candidate join + exact levenshtein rescoring
    (operators/dedup.fuzzy_term_pairs). Both engines ship levenshtein, so
    the result is exactly oracle-checked.

    The fixture's synthetic vocabulary contains no natural distance-1
    pairs at ANY scale, which made the original query vacuous (0 == 0
    hash-matched — the §37 failure mode, caught by the round-8 two-scale
    audit). Typos are therefore PLANTED deterministically — every term
    also enters with its 2nd character deleted, the same perturb-and-link
    pattern as q_linkage_customer_match — so the gate checks real pairs
    at every scale."""
    from ..operators.dedup import fuzzy_term_pairs
    from ..operators.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    vocab = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    typos = vocab.select(
        F.concat(
            F.substring("term", 1, 1), F.expr("substring(term, 3)")
        ).alias("term")
    )
    return fuzzy_term_pairs(vocab.unionByName(typos))


ORACLE_TEXT_FUZZY_TERM_PAIRS = """
WITH base AS (
    SELECT UNNEST(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS term
    FROM documents
),
vocab AS (
    SELECT DISTINCT term FROM (
        SELECT term FROM base
        UNION ALL
        SELECT substring(term, 1, 1) || substring(term, 3) FROM base
    ) WHERE length(term) >= 3
),
v AS (
    SELECT term,
           UNNEST(list_prepend(term,
               list_transform(range(1, length(term) + 1),
                   i -> substring(term, 1, i - 1) || substring(term, i + 1, length(term))))) AS var
    FROM vocab
),
cand AS (
    SELECT DISTINCT a.term AS term_a, b.term AS term_b
    FROM v a JOIN v b ON a.var = b.var AND a.term < b.term
)
SELECT term_a, term_b, CAST(levenshtein(term_a, term_b) AS INT) AS dist
FROM cand WHERE levenshtein(term_a, term_b) <= 1
"""


register(
    "text_fuzzy_term_pairs", q_text_fuzzy_term_pairs, ORACLE_TEXT_FUZZY_TERM_PAIRS
)


def q_linkage_customer_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution demo: a deterministically-perturbed copy of
    customer (one character deleted from each name) is linked back via
    blocking on the unperturbed fields (nation, segment) + levenshtein
    scoring + greedy per-record resolution (operators/linkage.py). All
    integer scores and deterministic tie-breaks — exactly oracle-checked."""
    from ..operators.linkage import blocked_candidates, resolve_best_match, score_pairs

    c = read_table(spark, sf_dir, "customer")
    dirty = c.select(
        (F.col("c_custkey") + 1_000_000).alias("id_l"),
        F.concat(
            F.substring("c_name", 1, 10), F.substring("c_name", 12, 100)
        ).alias("c_name"),
        "c_nationkey",
        "c_mktsegment",
    )
    clean = c.select(
        F.col("c_custkey").alias("id_r"), "c_name", "c_nationkey", "c_mktsegment"
    )
    cand = blocked_candidates(dirty, clean, ["c_nationkey", "c_mktsegment"])
    scored = score_pairs(cand, fuzzy_fields={"c_name": 1})
    best = resolve_best_match(scored, min_score=-2)
    return best.select("id_l", "id_r", "score")


ORACLE_LINKAGE_CUSTOMER_MATCH = """
WITH dirty AS (
    SELECT c_custkey + 1000000 AS id_l,
           substring(c_name, 1, 10) || substring(c_name, 12, length(c_name)) AS name_l,
           c_nationkey AS nk, c_mktsegment AS seg
    FROM customer
),
clean AS (
    SELECT c_custkey AS id_r, c_name AS name_r,
           c_nationkey AS nk, c_mktsegment AS seg
    FROM customer
),
cand AS (
    SELECT d.id_l, c.id_r,
           CAST(-levenshtein(d.name_l, c.name_r) AS BIGINT) AS score
    FROM dirty d JOIN clean c ON d.nk = c.nk AND d.seg = c.seg
),
best AS (
    SELECT id_l, id_r, score,
           ROW_NUMBER() OVER (PARTITION BY id_l ORDER BY score DESC, id_r) AS rn
    FROM cand
)
SELECT id_l, id_r, score FROM best WHERE rn = 1 AND score >= -2
"""


register(
    "linkage_customer_match", q_linkage_customer_match, ORACLE_LINKAGE_CUSTOMER_MATCH
)


def q_rel_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between two deterministic snapshot versions of
    orders (sources/merge.snapshot_diff): inserts/deletes carved out by
    key residues, updates by a price bump — delta-sized output from one
    full-outer join."""
    from ..sources.merge import snapshot_diff

    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    old = o.where(F.col("k") % 7 != 3)
    new = o.where(F.col("k") % 7 != 5).select(
        "k", F.when(F.col("k") % 5 == 0, F.col("p") * 2).otherwise(F.col("p")).alias("p")
    )
    return snapshot_diff(old, new, "k")


ORACLE_REL_SNAPSHOT_DIFF = """
WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
old AS (SELECT * FROM o WHERE k % 7 != 3),
new AS (SELECT k, CASE WHEN k % 5 = 0 THEN p * 2 ELSE p END AS p
        FROM o WHERE k % 7 != 5),
j AS (
    SELECT old.k AS k_old, new.k AS k_new, old.p AS p_old, new.p AS p_new
    FROM old FULL OUTER JOIN new ON old.k = new.k
)
SELECT COALESCE(k_old, k_new) AS k,
       CASE WHEN k_old IS NULL THEN 'insert'
            WHEN k_new IS NULL THEN 'delete'
            WHEN p_old IS DISTINCT FROM p_new THEN 'update' END AS op,
       p_old, p_new
FROM j
WHERE (CASE WHEN k_old IS NULL THEN 'insert'
            WHEN k_new IS NULL THEN 'delete'
            WHEN p_old IS DISTINCT FROM p_new THEN 'update' END) IS NOT NULL
"""


register("rel_snapshot_diff", q_rel_snapshot_diff, ORACLE_REL_SNAPSHOT_DIFF)


def q_rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with GROUPING() markers — the
    full grouping-sets family next to rel_pricing_summary's ROLLUP; the
    grouping id disambiguates aggregate NULLs from data NULLs."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("bigint").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "gid",
            "sum_qty",
            "n_rows",
        )
    )


ORACLE_REL_CUBE = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS BIGINT) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


register("rel_cube", q_rel_cube, ORACLE_REL_CUBE)


def q_rel_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group from EXACT decimal sufficient sums
    (n, Σx, Σy, Σxy, Σx², Σy² — order-free), finished with IEEE double
    arithmetic on identical operands, so the floats are engine-exact.
    Spark's builtin `corr` accumulates doubles in partition order and is
    NOT reproducible — the sufficient-sums form is the 100 TB shape (one
    map-side-combined aggregation) AND the deterministic one."""
    li = read_table(spark, sf_dir, "lineitem")
    d = "decimal(28,6)"
    x = F.col("l_quantity").cast(d)
    y = F.col("l_discount").cast("decimal(8,6)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * y).cast("decimal(38,12)")).alias("sxy"),
        F.sum((x * x).cast("decimal(38,12)")).alias("sxx"),
        F.sum((y * y).cast("decimal(38,12)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    r = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return agg.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        (F.col("sx") * 1000000).cast("bigint").alias("sx_e6"),
        (F.col("sy") * 1000000).cast("bigint").alias("sy_e6"),
        r.alias("corr_qty_disc"),
    )


ORACLE_REL_CORRELATION = """
WITH s AS (
    SELECT l_returnflag,
           COUNT(*) AS n,
           SUM(CAST(l_quantity AS DECIMAL(28,6))) AS sx,
           SUM(CAST(l_discount AS DECIMAL(8,6))) AS sy,
           SUM(CAST(CAST(l_quantity AS DECIMAL(28,6)) * CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(38,12))) AS sxy,
           SUM(CAST(CAST(l_quantity AS DECIMAL(28,6)) * CAST(l_quantity AS DECIMAL(28,6)) AS DECIMAL(38,12))) AS sxx,
           SUM(CAST(CAST(l_discount AS DECIMAL(8,6)) * CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(38,12))) AS syy
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       CAST(sx * 1000000 AS BIGINT) AS sx_e6,
       CAST(sy * 1000000 AS BIGINT) AS sy_e6,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           AS corr_qty_disc
FROM s
"""


register("rel_correlation", q_rel_correlation, ORACLE_REL_CORRELATION)


def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey Markov transitions: per-user lag over the time-ordered
    event stream (deterministic (ts, event_id) tie-break), then exact
    transition counts and floor-e6 row-stochastic probabilities. One
    shuffle on user_id for the lag + one tiny (|event_types|²) aggregate."""
    from pyspark.sql import Window

    from .extensions import _events

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("cur"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("prev").agg(F.sum("n").alias("n_from"))
    return (
        pairs.join(totals, "prev")
        .select(
            "prev",
            "cur",
            F.col("n").cast("long").alias("n"),
            F.floor(F.col("n") * 1_000_000 / F.col("n_from"))
            .cast("long")
            .alias("p_e6"),
        )
    )


ORACLE_EVENTS_TRANSITION_MATRIX = """
WITH seq AS (
    SELECT user_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events
),
pairs AS (
    SELECT prev, event_type AS cur, COUNT(*) AS n
    FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type
),
totals AS (SELECT prev, SUM(n) AS n_from FROM pairs GROUP BY prev)
SELECT p.prev, p.cur, CAST(p.n AS BIGINT) AS n,
       CAST(FLOOR(p.n * 1000000 / t.n_from) AS BIGINT) AS p_e6
FROM pairs p JOIN totals t ON t.prev = p.prev
"""


register(
    "events_transition_matrix",
    q_events_transition_matrix,
    ORACLE_EVENTS_TRANSITION_MATRIX,
)


def q_events_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of event value over time: OLS slope/intercept
    from EXACT integer sufficient sums (x = whole hours since the corpus
    epoch, y = value cents), finished in IEEE doubles on identical
    operands — deterministic, unlike builtin regr_slope's partition-order
    float accumulation. Same one-aggregation shape as rel_correlation."""
    from .extensions import _events

    ev = _events(spark, sf_dir)
    # Integer `div`, not double-divide-then-cast: µs values stay exact at
    # any magnitude (no 2^53 rounding edge) and the truncation matches the
    # oracle's integer `//` bit-for-bit on hour-boundary ± 1µs inputs.
    x = F.expr("unix_micros(ts) div 3600000000")
    y = F.round(F.col("value") * 100).cast("long")
    agg = ev.select(F.col("event_type"), x.alias("x"), y.alias("y")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        slope.alias("slope_cents_per_hour"),
        ((sy - slope * sx) / n).alias("intercept_cents"),
    )


ORACLE_EVENTS_TREND = """
WITH s AS (
    SELECT event_type,
           COUNT(*) AS n,
           SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
    FROM (
        SELECT event_type,
               CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS x,
               CAST(ROUND(value * 100) AS BIGINT) AS y
        FROM events
    ) GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           AS slope_cents_per_hour,
       (CAST(sy AS DOUBLE)
        - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * CAST(sx AS DOUBLE))
       / CAST(n AS DOUBLE) AS intercept_cents
FROM s
"""


register("events_trend", q_events_trend, ORACLE_EVENTS_TREND)


def q_sampling_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (round 4): keep at most 40 docs per
    `source`, longest-first with doc_id as the deterministic order — the
    C4/RefinedWeb-style bound on any one source's share of the training
    mix. One window shuffle; Spark's window-group-limit pushes the
    rank<=cap cutoff into the ranking, so a hot domain never materializes
    its full ranked list."""
    from ..operators.sampling import per_group_cap

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars",
        # unique deterministic order key: length desc, doc_id asc
        (F.col("n_chars") * 1_000_000_000 - F.col("doc_id")).alias("__ord"),
    )
    return (
        per_group_cap(docs, "source", "__ord", cap=40, descending=True)
        .select(
            "doc_id", "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("rank_in_group").cast("long").alias("rank_in_group"),
        )
    )


ORACLE_SAMPLING_DOMAIN_CAP = """
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(rank_in_group AS BIGINT) AS rank_in_group
FROM (
    SELECT doc_id, source, n_chars,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY n_chars * 1000000000 - doc_id DESC
           ) AS rank_in_group
    FROM documents
)
WHERE rank_in_group <= 40
"""

register("sampling_domain_cap", q_sampling_domain_cap, ORACLE_SAMPLING_DOMAIN_CAP)


def q_events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-retention matrix (round 4): users bucketed by first-activity
    day, counted by distinct active-day offset — the standard
    product-analytics rollup, exact integer counts. Two shuffles: per-
    (user, day) distinct, then the matrix groupBy (the per-user min-day
    window rides the distinct's partitioning)."""
    from ..operators.temporal import retention_cohorts
    from .extensions import _events

    ev = _events(spark, sf_dir)
    # timestamp, not DATE: pandas/arrow date columns compare by dtype in
    # the hash gate; timestamps round-trip identically in both engines
    return retention_cohorts(ev).select(
        F.col("cohort_date").cast("timestamp").alias("cohort_date"),
        F.col("day_offset").cast("long").alias("day_offset"),
        F.col("n_users").cast("long").alias("n_users"),
    )


ORACLE_EVENTS_RETENTION_COHORTS = """
WITH days AS (
    SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS d FROM events
),
coh AS (
    SELECT u, d, MIN(d) OVER (PARTITION BY u) AS cohort FROM days
)
SELECT CAST(cohort AS TIMESTAMP) AS cohort_date,
       CAST(date_diff('day', cohort, d) AS BIGINT) AS day_offset,
       COUNT(*) AS n_users
FROM coh
GROUP BY 1, 2
"""

register(
    "events_retention_cohorts",
    q_events_retention_cohorts,
    ORACLE_EVENTS_RETENTION_COHORTS,
)


def q_dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level repeated-substring detection over the corpus (round 4):
    4-gram spans occurring in >= 2 distinct documents, merged into maximal
    per-doc spans — the Lee-et-al-style substring dedup signal. All
    integer/md5 arithmetic, exact DuckDB oracle."""
    from ..operators.dedup import repeated_ngram_spans

    docs = read_table(spark, sf_dir, "documents")
    return repeated_ngram_spans(docs, "doc_id", "text", n=4, min_df=2)


ORACLE_DEDUP_REPEATED_SPANS = """
WITH t AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS tk
    FROM documents
),
p0 AS (
    SELECT doc_id, tk,
           unnest(range(greatest(len(tk) - 4 + 1, 0))) AS pos
    FROM t
),
p AS (
    SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           CAST(('0x' || substr(md5(array_to_string(tk[pos + 1 : pos + 4], ' ')), 1, 15)) AS BIGINT) AS g
    FROM p0
),
r AS (SELECT g FROM p GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
h AS (SELECT p.doc_id, p.pos, LAG(p.pos) OVER (PARTITION BY p.doc_id ORDER BY p.pos) AS prev
      FROM p JOIN r USING (g)),
i AS (
    SELECT doc_id, pos,
           SUM(CASE WHEN pos > prev + 4 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
    FROM h
)
SELECT doc_id,
       MIN(pos) AS span_start,
       MAX(pos) + 4 AS span_end,
       COUNT(*) AS n_grams
FROM i GROUP BY doc_id, island
"""

register("dedup_repeated_spans", q_dedup_repeated_spans, ORACLE_DEDUP_REPEATED_SPANS)


def q_multimodal_media_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 multimodal de-stub, oracle-checked end-to-end: REAL PNG
    container bytes are encoded per document (pure-stdlib encode_png,
    dimensions derived arithmetically from doc_id), carried through the
    binary column + Arrow batch path, and header-probed back
    (extract_media_probe) — so the hash check covers the full
    encode -> binary plumbing -> mapInPandas -> struct-parse loop, with
    the oracle recomputing the declared dimensions directly. Pixels vary
    per doc so the payloads are genuine non-trivial zlib streams."""
    import pandas as pd

    from ..operators.multimodal import encode_png, extract_media_probe

    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 10 == 0)
    )

    def make(batches):
        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 1 + d % 13, 1 + d % 7
                px = [
                    ((d + i) % 256, (d * 3 + i) % 256, (d * 7 + i) % 256)
                    for i in range(w * h)
                ]
                out.append((d, bytearray(encode_png(w, h, px))))
            yield pd.DataFrame(out, columns=["doc_id", "blob"])

    blobs = docs.mapInPandas(make, "doc_id long, blob binary")
    return extract_media_probe(blobs).select(
        "doc_id", "format", "width", "height", "bit_depth", "channels"
    )


ORACLE_MULTIMODAL_MEDIA_PROBE = """
SELECT doc_id,
       'png' AS format,
       1 + doc_id % 13 AS width,
       1 + doc_id % 7 AS height,
       CAST(8 AS BIGINT) AS bit_depth,
       CAST(3 AS BIGINT) AS channels
FROM documents
WHERE doc_id % 10 = 0
"""

register(
    "multimodal_media_probe", q_multimodal_media_probe,
    ORACLE_MULTIMODAL_MEDIA_PROBE,
)


def q_multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 audio de-stub, oracle-checked end-to-end: real 16-bit PCM
    WAV containers are synthesized per document (encode_wav16, sample i =
    ((doc_id*7 + i*13) % 4001) - 2000, n = 50 + doc_id % 50 samples, mono
    8kHz), carried through the binary column + Arrow batch path, decoded
    back (decode_wav — genuine RIFF parsing + struct sample unpack), and
    reduced to exact integer loudness features. The DuckDB oracle
    recomputes peak/sum-of-squares over the same closed-form sample
    series via generate_series — bit-exact, no audio library on either
    side."""
    import pandas as pd

    from ..operators.multimodal import encode_wav16, extract_audio_features

    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 10 == 3)
    )

    def make(batches):
        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 50 + d % 50
                samples = [((d * 7 + i * 13) % 4001) - 2000 for i in range(n)]
                out.append((d, bytearray(encode_wav16(1, 8000, samples))))
            yield pd.DataFrame(out, columns=["doc_id", "blob"])

    blobs = docs.mapInPandas(make, "doc_id long, blob binary")
    return extract_audio_features(blobs).select(
        "doc_id", "channels", "sample_rate", "n_samples", "peak_abs", "sum_sq"
    )


ORACLE_MULTIMODAL_AUDIO_FEATURES = """
WITH s AS (
    SELECT d.doc_id,
           ((d.doc_id * 7 + t.i * 13) % 4001) - 2000 AS v
    FROM documents d, generate_series(0, 98) AS t(i)
    WHERE d.doc_id % 10 = 3 AND t.i < 50 + d.doc_id % 50
)
SELECT doc_id,
       CAST(1 AS BIGINT) AS channels,
       CAST(8000 AS BIGINT) AS sample_rate,
       COUNT(*) AS n_samples,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak_abs,
       CAST(SUM(v * v) AS BIGINT) AS sum_sq
FROM s
GROUP BY doc_id
"""

register(
    "multimodal_audio_features", q_multimodal_audio_features,
    ORACLE_MULTIMODAL_AUDIO_FEATURES,
)


_D_NORM_A = "regexp_replace(lower({t}), '[^a-z0-9 ]', '', 'g')"


def q_dedup_incremental_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion dedup, oracle-checked end-to-end: the corpus
    arrives as two snapshots (doc_id parity), each deduped against the
    PERSISTED fingerprint store of everything kept so far
    (operators/dedup.exact_dedup_incremental — durable-store counterpart
    of the streaming first-claim state). Output: every kept row with the
    snapshot that admitted it. The DuckDB oracle recomputes both rounds
    relationally (min-id within snapshot 1; snapshot 2 minus snapshot 1's
    fingerprints)."""
    import tempfile

    from ..operators.dedup import exact_dedup_incremental

    import shutil

    docs = read_table(spark, sf_dir, "documents")
    store = tempfile.mkdtemp(prefix="bamboo-dedup-store-")
    try:
        b1 = docs.where(F.col("doc_id") % 2 == 0)
        b2 = docs.where(F.col("doc_id") % 2 == 1)
        k1 = exact_dedup_incremental(b1, "doc_id", "text", store).withColumn(
            "batch", F.lit(1).cast("long")
        )
        k2 = exact_dedup_incremental(b2, "doc_id", "text", store).withColumn(
            "batch", F.lit(2).cast("long")
        )
        return k1.unionByName(k2).select("batch", "doc_id", "fp")
    finally:
        # the kept sets are localCheckpointed (eager) inside the operator,
        # so the returned frame never re-reads the store — safe to remove
        # immediately; repeated gate/bench invocations must not accumulate
        # /tmp fingerprint stores
        shutil.rmtree(store, ignore_errors=True)


ORACLE_DEDUP_INCREMENTAL_STORE = f"""
WITH f AS (
    SELECT doc_id, md5({_D_NORM_A.format(t='text')}) AS fp, doc_id % 2 AS par
    FROM documents
),
b1 AS (SELECT fp, MIN(doc_id) AS doc_id FROM f WHERE par = 0 GROUP BY fp),
b2 AS (
    SELECT fp, MIN(doc_id) AS doc_id FROM f WHERE par = 1 GROUP BY fp
)
SELECT CAST(1 AS BIGINT) AS batch, doc_id, fp FROM b1
UNION ALL
SELECT CAST(2 AS BIGINT) AS batch, doc_id, fp
FROM b2 WHERE fp NOT IN (SELECT fp FROM b1)
"""

register(
    "dedup_incremental_store", q_dedup_incremental_store,
    ORACLE_DEDUP_INCREMENTAL_STORE,
)


def q_dedup_lsh_incremental_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion NEAR-dup dedup, oracle-checked end-to-end:
    the corpus arrives as two snapshots (doc_id parity), each deduped
    against the PERSISTED LSH band-key store of everything kept so far
    (operators/dedup.lsh_dedup_incremental — the near-dup counterpart of
    `dedup_incremental_store` above, same snapshot protocol). Output:
    every kept row with the snapshot that admitted it and whether it
    participated in banding. The DuckDB oracle replays both rounds
    relationally over the SAME bit-exact band keys (_lsh_banded_sql):
    round 1 is the pure first-claim rule, round 2 drops history hits
    before voting."""
    import shutil
    import tempfile

    from ..operators.dedup import lsh_dedup_incremental

    docs = read_table(spark, sf_dir, "documents")
    store = tempfile.mkdtemp(prefix="bamboo-lsh-store-")
    try:
        b1 = docs.where(F.col("doc_id") % 2 == 0)
        b2 = docs.where(F.col("doc_id") % 2 == 1)
        k1 = lsh_dedup_incremental(b1, "doc_id", "text", store).withColumn(
            "batch", F.lit(1).cast("long")
        )
        k2 = lsh_dedup_incremental(b2, "doc_id", "text", store).withColumn(
            "batch", F.lit(2).cast("long")
        )
        return k1.unionByName(k2).select("batch", "doc_id", "banded_i")
    finally:
        # kept sets are localCheckpointed (eager) inside the operator —
        # the returned frame never re-reads the store
        shutil.rmtree(store, ignore_errors=True)


def _oracle_lsh_incremental_store() -> str:
    from .extensions import _lsh_banded_sql

    return f"""
WITH {_lsh_banded_sql("documents")},
b1 AS (SELECT doc_id, band_key FROM banded WHERE doc_id % 2 = 0),
b2 AS (SELECT doc_id, band_key FROM banded WHERE doc_id % 2 = 1),
f1 AS (SELECT band_key, MIN(doc_id) AS fid FROM b1 GROUP BY band_key),
k1 AS (
    SELECT b1.doc_id FROM b1 JOIN f1 USING (band_key)
    GROUP BY b1.doc_id
    HAVING MIN(CASE WHEN b1.doc_id = fid THEN 1 ELSE 0 END) = 1
),
t1 AS (
    SELECT doc_id FROM documents
    WHERE doc_id % 2 = 0 AND doc_id NOT IN (SELECT doc_id FROM b1)
),
store1 AS (
    SELECT DISTINCT band_key FROM b1
    WHERE doc_id IN (SELECT doc_id FROM k1)
),
hist2 AS (
    SELECT DISTINCT doc_id FROM b2
    WHERE band_key IN (SELECT band_key FROM store1)
),
s2 AS (
    SELECT doc_id, band_key FROM b2
    WHERE doc_id NOT IN (SELECT doc_id FROM hist2)
),
f2 AS (SELECT band_key, MIN(doc_id) AS fid FROM s2 GROUP BY band_key),
k2 AS (
    SELECT s2.doc_id FROM s2 JOIN f2 USING (band_key)
    GROUP BY s2.doc_id
    HAVING MIN(CASE WHEN s2.doc_id = fid THEN 1 ELSE 0 END) = 1
),
t2 AS (
    SELECT doc_id FROM documents
    WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM b2)
)
SELECT CAST(1 AS BIGINT) AS batch, doc_id, CAST(1 AS BIGINT) AS banded_i FROM k1
UNION ALL
SELECT CAST(1 AS BIGINT) AS batch, doc_id, CAST(0 AS BIGINT) AS banded_i FROM t1
UNION ALL
SELECT CAST(2 AS BIGINT) AS batch, doc_id, CAST(1 AS BIGINT) AS banded_i FROM k2
UNION ALL
SELECT CAST(2 AS BIGINT) AS batch, doc_id, CAST(0 AS BIGINT) AS banded_i FROM t2
"""


register(
    "dedup_lsh_incremental_store", q_dedup_lsh_incremental_store,
    _oracle_lsh_incremental_store(),
)


def q_rel_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — the classic 3-way join + filtered aggregate +
    top-k: BUILDING-segment customers' orders placed before a date, their
    lineitems shipped after it, revenue per order, top 10. Plan notes for
    the 100 TB shape: filters reach all three parquet scans (pushdown),
    customer is broadcast at this size and AQE decides at scale, the
    groupBy key (l_orderkey) inherits the join partitioning so the
    aggregate adds no extra exchange, and the top-10 is TakeOrdered (no
    global sort). Revenue in exact DECIMAL fixed-point (e4 cents) so the
    oracle hash-matches bit-for-bit."""
    cutoff = F.lit("1997-06-30").cast("timestamp")
    cust = (
        read_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = read_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(8,6)") - F.col("l_discount").cast("decimal(8,6)"))
    ).cast("decimal(38,10)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev) * 10000).cast("bigint").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


ORACLE_REL_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))
                AS DECIMAL(38,10))) * 10000 AS BIGINT) AS revenue_e4
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1997-06-30'
  AND l_shipdate > TIMESTAMP '1997-06-30'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_e4 DESC, o_orderdate, l_orderkey
LIMIT 10
"""

register(
    "rel_shipping_priority", q_rel_shipping_priority,
    ORACLE_REL_SHIPPING_PRIORITY,
)


def q_rel_part_surplus_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — the nested semi-join chain: suppliers holding a
    surplus (> 60 units shipped across the window) of any 'small %' part.
    Exercises multi-level IN-subquery planning as joins: part-name filter
    -> semi-join into the lineitem aggregate -> HAVING -> semi-join into
    supplier. All integer/exact (quantity sums in DECIMAL), every filter
    pushed to its scan, the small filtered part list broadcast."""
    part_f = (
        read_table(spark, sf_dir, "part")
        .where(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = read_table(spark, sf_dir, "lineitem")
    surplus = (
        li.join(part_f, li.l_partkey == part_f.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"))
        .where(F.col("q") > 60)
        .select("l_suppkey")
        .distinct()
    )
    sup = read_table(spark, sf_dir, "supplier")
    return (
        sup.join(surplus, sup.s_suppkey == surplus.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


ORACLE_REL_PART_SURPLUS_SUPPLIERS = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 60
)
ORDER BY s_suppkey
"""

register(
    "rel_part_surplus_suppliers", q_rel_part_surplus_suppliers,
    ORACLE_REL_PART_SURPLUS_SUPPLIERS,
)


def q_rel_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — the join-reordering stress: 6-relation chain
    (supplier-lineitem-orders-customer + nation x2) with a symmetric
    two-nation predicate, volume per (supp_nation, cust_nation, year).
    Catalyst's CBO/AQE pick the order; both nation sides broadcast.
    Volume in DECIMAL e4 fixed-point for the bit-exact oracle."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    sup = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    vol = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(8,6)") - F.col("l_discount").cast("decimal(8,6)"))
    ).cast("decimal(38,10)")
    a, b = "NATION_1", "NATION_2"
    pair_ok = (
        (F.col("supp_nation") == a) & (F.col("cust_nation") == b)
    ) | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(n1, sup.s_nationkey == n1.n1_key)
        .join(n2, cust.c_nationkey == n2.n2_key)
        .where(pair_ok)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(vol) * 10000).cast("bigint").alias("volume_e4"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


ORACLE_REL_VOLUME_SHIPPING = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))
                AS DECIMAL(38,10))) * 10000 AS BIGINT) AS volume_e4
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey
  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

register("rel_volume_shipping", q_rel_volume_shipping, ORACLE_REL_VOLUME_SHIPPING)


def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus datasheet: per-(source, lang) rollup of release-grade
    integer statistics in ONE aggregation pass (operators/corpus.
    corpus_datacard). Every value exact -> full DuckDB hash check."""
    from ..operators.corpus import corpus_datacard

    return corpus_datacard(read_table(spark, sf_dir, "documents"))


ORACLE_CORPUS_DATACARD = f"""
WITH base AS (
    SELECT source, lang,
           len(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS toks,
           length(text) AS chars,
           md5({_D_NORM_A.format(t='text')}) AS fp
    FROM documents
)
SELECT COALESCE(source, 'ALL') AS source,
       COALESCE(lang, 'ALL') AS lang,
       COUNT(*) AS n_docs,
       CAST(SUM(toks) AS BIGINT) AS n_tokens,
       CAST(SUM(chars) AS BIGINT) AS n_chars,
       COUNT(DISTINCT fp) AS n_distinct_texts,
       CAST(SUM(CASE WHEN toks < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_short_docs,
       COUNT(*) - COUNT(DISTINCT fp) AS n_exact_dup_docs
FROM base
GROUP BY ROLLUP(source, lang)
ORDER BY 1, 2
"""

register("corpus_datacard", q_corpus_datacard, ORACLE_CORPUS_DATACARD)


def q_text_strip_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl extraction, oracle-checked end-to-end: each document is
    wrapped in a deterministic HTML shell (head/style/script blocks, an
    attribute-bearing tag, entities) and recovered with
    operators/text.strip_html; the oracle performs the identical wrap +
    RE2 strip in SQL. Output keyed by md5 so the hash check covers every
    byte of the recovered text."""
    from ..operators.text import strip_html

    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 7)
    html = F.concat(
        F.lit('<html><head><style>p{color:red}</style></head><body><h1 class="t">'),
        F.substring(F.col("text"), 1, 20),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit(" &amp; tail</p><script>var a=1;</script></body></html>"),
    )
    return docs.select(
        "doc_id",
        F.md5(strip_html(html)).alias("clean_md5"),
        F.length(strip_html(html)).cast("bigint").alias("clean_len"),
    )


ORACLE_TEXT_STRIP_HTML = """
WITH wrapped AS (
    SELECT doc_id,
           '<html><head><style>p{color:red}</style></head><body><h1 class="t">'
           || substring(text, 1, 20) || '</h1><p>' || text
           || ' &amp; tail</p><script>var a=1;</script></body></html>' AS h
    FROM documents WHERE doc_id % 10 = 7
),
stripped AS (
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(h, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
                           '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
                         '<[^>]*>', ' ', 'g'),
                       '&lt;', '<', 'g'),
                     '&gt;', '>', 'g'),
                   '&quot;', '"', 'g'),
                 '&#39;', $$'$$, 'g'),
               '&nbsp;', ' ', 'g')
             , '[ \\t\\n\\r\\f]+', ' ', 'g')) AS clean
    FROM wrapped
)
SELECT doc_id, md5(replace(clean, '&amp;', '&')) AS clean_md5,
       CAST(length(replace(clean, '&amp;', '&')) AS BIGINT) AS clean_len
FROM stripped
"""

register("text_strip_html", q_text_strip_html, ORACLE_TEXT_STRIP_HTML)


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle participation per node (degree-ordered exact counting,
    operators/graph.triangle_counts) over the supplier co-purchase graph:
    suppliers are adjacent when they ship >= 25 common parts. Integer
    counts -> full DuckDB hash check via the naive a<b<c closure."""
    from ..operators.graph import triangle_counts

    li = read_table(spark, sf_dir, "lineitem")
    sp = li.select("l_suppkey", "l_partkey").distinct()
    a = sp.select(F.col("l_suppkey").alias("s1"), "l_partkey")
    b = sp.select(F.col("l_suppkey").alias("s2"), "l_partkey")
    edges = (
        a.join(b, "l_partkey")
        .where(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= 25)
        .select(F.col("s1").alias("src"), F.col("s2").alias("dst"))
    )
    return triangle_counts(edges).orderBy("node")


ORACLE_GRAPH_TRIANGLES = """
WITH sp AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
edges AS (
    SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
    FROM sp a JOIN sp b ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 25
),
tris AS (
    SELECT e1.s1 AS x, e1.s2 AS y, e2.s2 AS z
    FROM edges e1
    JOIN edges e2 ON e2.s1 = e1.s2
    JOIN edges e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
)
SELECT node, COUNT(*) AS n_triangles
FROM (
    SELECT x AS node FROM tris
    UNION ALL SELECT y FROM tris
    UNION ALL SELECT z FROM tris
)
GROUP BY node
ORDER BY node
"""

register("graph_triangles", q_graph_triangles, ORACLE_GRAPH_TRIANGLES)


def q_pretrain_fuzzy_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate decontamination (operators/pretrain.
    fuzzy_decontaminate): every corpus doc sharing an LSH band with the
    pseudo-benchmark slice (doc_id % 97 == 0) is dropped — the fuzzy
    companion to the exact n-gram `pretrain_decontamination`. The
    signatures are md5-deterministic, so the DuckDB oracle replicates the
    band membership exactly."""
    from ..operators.pretrain import fuzzy_decontaminate

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    return fuzzy_decontaminate(docs, bench).select("doc_id").orderBy("doc_id")


def _oracle_fuzzy_decontamination() -> str:
    from .extensions import _lsh_pairs_sql

    base = _lsh_pairs_sql("documents")
    # reuse the banded CTE block, swap the pair join for the
    # benchmark-band semi-join + anti-join
    banded_ctes = base[: base.rindex("SELECT DISTINCT a.doc_id")]
    return f"""{banded_ctes}
, bench_keys AS (
    SELECT DISTINCT band_key FROM banded WHERE doc_id % 97 = 0
),
flagged AS (
    SELECT DISTINCT doc_id FROM banded
    WHERE band_key IN (SELECT band_key FROM bench_keys)
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
ORDER BY doc_id
"""


register(
    "pretrain_fuzzy_decontamination",
    q_pretrain_fuzzy_decontamination,
    _oracle_fuzzy_decontamination(),
)


def q_text_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter (operators/lm.py): train a Laplace-
    smoothed bigram LM on the 80% training slice (doc_id % 10 < 8), score
    the held-out 20% — per held-out doc the bigram count, OOV-bigram
    count, and the exact e6 fixed-point smoothed-probability floor-mean.
    The float perplexity columns the operator also emits are transcendental
    and unit-tested against plain Python instead (test_lm_perplexity_*);
    this query carries the engine-exact integer surface."""
    from ..operators.lm import score_bigram_lm, train_bigram_lm

    docs = read_table(spark, sf_dir, "documents")
    model = train_bigram_lm(docs.where(F.col("doc_id") % 10 < 8))
    held_out = docs.where(F.col("doc_id") % 10 >= 8)
    return (
        score_bigram_lm(held_out, model)
        .select("doc_id", "n_bigrams", "n_oov_bigrams", "lm_score_e6")
        .orderBy("doc_id")
    )


ORACLE_TEXT_LM_QUALITY = f"""
WITH train AS (
    SELECT {_D_TOKENS.format(t='text')} AS toks FROM documents
    WHERE doc_id % 10 < 8
),
tb AS (
    SELECT unnest(list_transform(range(1, len(toks)),
                  i -> [toks[i], toks[i + 1]])) AS pr
    FROM train WHERE len(toks) >= 2
),
cbg AS (SELECT pr[1] AS w1, pr[2] AS w2, COUNT(*) AS c12 FROM tb GROUP BY 1, 2),
cpre AS (SELECT pr[1] AS w1, COUNT(*) AS c1 FROM tb GROUP BY 1),
voc AS (
    SELECT COUNT(DISTINCT tok) AS v
    FROM (SELECT unnest(toks) AS tok FROM train)
),
held AS (
    SELECT doc_id, {_D_TOKENS.format(t='text')} AS toks FROM documents
    WHERE doc_id % 10 >= 8
),
ab AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks)),
                  i -> [toks[i], toks[i + 1]])) AS pr
    FROM held WHERE len(toks) >= 2
),
j AS (
    SELECT ab.doc_id, cbg.c12, cpre.c1, voc.v
    FROM ab
    LEFT JOIN cbg ON ab.pr[1] = cbg.w1 AND ab.pr[2] = cbg.w2
    LEFT JOIN cpre ON ab.pr[1] = cpre.w1
    CROSS JOIN voc
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(CASE WHEN c12 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov_bigrams,
       CAST(SUM((COALESCE(c12, 0) + 1) * 1000000 // (COALESCE(c1, 0) + v))
            // COUNT(*) AS BIGINT) AS lm_score_e6
FROM j GROUP BY doc_id
ORDER BY doc_id
"""

register("text_lm_quality", q_text_lm_quality, ORACLE_TEXT_LM_QUALITY)


# --- weighted cutflow: refine(weight=...) with NON-UNIT weights --------------
# (VERDICT r7 #9 / SURVEY §2.6 [B]): the weight path was implemented and
# exercised via hep_histograms_1d, but always with weight 1 end-to-end in
# a driver-visible slot. This query computes a lumi x xsec-style weighted
# cutflow where parent and child weights DIFFER: the root carries a
# constant 1.5, the dimuon selection multiplies a per-event scale factor
# that depends on event content, and the MET selection halves again.
# Every weight is a dyadic rational (1.5, 0.75, 0.5, 0.375), so each
# per-event product and every partial sum is EXACT in binary floating
# point — the oracle's SUMs match bit-wise in any accumulation order.

def q_hep_weighted_cutflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..analyses.phase2 import define_objects
    from ..operators import collections as op
    from ..plans.cutflow import CutFlowReport
    from ..plans.histogrammer import cutflow_table, run_analysis
    from ..plans.selection import Selection
    from .hep import _hep

    df = define_objects(_hep(spark, sf_dir))
    ident_mu = op.Collection(F.col("identifiedMuons"))
    good_jets = op.Collection(F.col("cleanedGoodJets"))
    met_pt = F.col("metpuppi")["pt"]

    no_sel = Selection.root("noSel", weight=F.lit(1.5))
    # per-event muon scale factor: 0.75 when the event also has >= 2 good
    # jets, 0.5 otherwise (shape of a data/MC correction keyed on topology)
    sf_mu = F.lit(0.5) + F.lit(0.25) * (op.rng_len(good_jets) > 1).cast("double")
    sel1 = no_sel.refine(
        "nmumu",
        cut=(op.rng_len(ident_mu) > 1)
        & (op.product(ident_mu[0].charge, ident_mu[1].charge) < 0),
        weight=sf_mu,
    )
    sel2 = sel1.refine("MET", cut=met_pt > 40, weight=F.lit(0.5))

    cfr = CutFlowReport("wyields")
    cfr.add(no_sel).add(sel1).add(sel2)
    hist = run_analysis(df, [], [cfr])
    cf = cutflow_table(hist, "wyields", ["noSel", "nmumu", "MET"])
    return cf.select("selection", "seq", "num_events", "sum_weights")


def _oracle_weighted_cutflow() -> str:
    from .hep import CHAIN_CTES

    return f"""{CHAIN_CTES}
, w AS (
    -- every factor cast to DOUBLE up front: bare numeric literals are
    -- DECIMAL in DuckDB and decimal-scale rounding diverges from the
    -- (exact, dyadic) double arithmetic the Spark side performs
    SELECT met, pass1,
           CAST(1.5 AS DOUBLE) * (CAST(0.5 AS DOUBLE)
               + CAST(0.25 AS DOUBLE)
                 * CASE WHEN n_jets >= 2 THEN 1 ELSE 0 END) AS w1
    FROM flags
)
SELECT s.selection, s.seq, c.num_events, c.sum_weights
FROM (VALUES ('noSel', 0), ('nmumu', 1), ('MET', 2)) AS s(selection, seq)
JOIN (
    SELECT 0 AS seq, COUNT(*) AS num_events,
           SUM(CAST(1.5 AS DOUBLE)) AS sum_weights FROM w
    UNION ALL
    SELECT 1, COUNT(*) FILTER (WHERE pass1),
           SUM(w1) FILTER (WHERE pass1) FROM w
    UNION ALL
    SELECT 2, COUNT(*) FILTER (WHERE pass1 AND met > 40),
           SUM(w1 * CAST(0.5 AS DOUBLE)) FILTER (WHERE pass1 AND met > 40)
    FROM w
) c ON c.seq = s.seq
WHERE c.num_events > 0
"""


register(
    "hep_weighted_cutflow", q_hep_weighted_cutflow, _oracle_weighted_cutflow()
)


# --- URL pipeline operators (round 8): normalize -> dedup -> domain stats ----
# C4/RefinedWeb-shape web-crawl curation. The documents fixture carries
# no URL column, so each query derives a deterministic synthetic URL
# from doc_id with PLANTED normalization collisions (scheme/case/www/
# tracking-param/param-order variants of the same logical page) — the
# operator under test is the Spark-side parse_url + array algebra in
# operators/urlops.py; the oracle computes the expected canonical form
# directly from doc_id arithmetic, so the two sides share no code path.

def _synthetic_url() -> "F.Column":
    d = F.col("doc_id")
    scheme = F.when(d % 2 == 0, "https").otherwise("http")
    # r9: host class 4 is an IP LITERAL (VERDICT r8 #3 fixture row — the
    # registered_domain IP guard keeps the whole address); path classes
    # d%13 in {0,1,2} plant RFC 3986 §6.2.2 percent-escape collisions
    # (%7e-vs-~ must collide after normalization; %3a stays encoded with
    # uppercased hex)
    host = (
        F.when(d % 5 == 0, "WWW.Example.COM")
        .when(d % 5 == 1, "News.Example.CO.UK")
        .when(d % 5 == 2, "cdn.static.site.org")
        .when(d % 5 == 3, "AbC.xyz")
        .otherwise("192.168.0.1")
    )
    path = (
        F.when(d % 11 == 0, "/")
        .when(d % 13 == 0, F.concat(F.lit("/p%7e/"), (d % 7).cast("string")))
        .when(d % 13 == 1, F.concat(F.lit("/p~/"), (d % 7).cast("string")))
        .when(d % 13 == 2, F.concat(F.lit("/a%3ab/"), (d % 7).cast("string")))
        .otherwise(F.concat(F.lit("/p/"), (d % 7).cast("string")))
    )
    q = (
        F.when(d % 3 == 0,
               F.concat(F.lit("?utm_source=feed&id="), (d % 5).cast("string")))
        .when(d % 3 == 1,
              F.concat(F.lit("?id="), (d % 5).cast("string"),
                       F.lit("&utm_campaign=x")))
        .otherwise(F.lit("?utm_ref=o"))
    )
    return F.concat(scheme, F.lit("://"), host, path, q)


def q_text_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact URL dedup on the canonical form (operators/urlops.py):
    scheme collapsed, host lowercased/de-www-ed, tracking params
    stripped, remaining params sorted — q_kind 0 and 1 (different
    tracking params, different param order) collapse into one canonical
    URL, q_kind 2 (tracking-only query) normalizes to no query at all."""
    from ..operators.urlops import url_dedup

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", _synthetic_url().alias("url")
    )
    return url_dedup(docs).orderBy("canonical_url")


ORACLE_TEXT_URL_DEDUP = """
WITH u AS (
    SELECT doc_id,
        CASE CAST(doc_id % 5 AS INT)
            WHEN 0 THEN 'example.com'
            WHEN 1 THEN 'news.example.co.uk'
            WHEN 2 THEN 'cdn.static.site.org'
            WHEN 3 THEN 'abc.xyz'
            ELSE '192.168.0.1' END AS hostc,
        CASE WHEN doc_id % 11 = 0 THEN ''
             WHEN doc_id % 13 IN (0, 1)
                  THEN '/p~/' || CAST(doc_id % 7 AS VARCHAR)
             WHEN doc_id % 13 = 2
                  THEN '/a%3Ab/' || CAST(doc_id % 7 AS VARCHAR)
             ELSE '/p/' || CAST(doc_id % 7 AS VARCHAR) END AS pathc,
        CASE WHEN doc_id % 3 IN (0, 1)
             THEN '?id=' || CAST(doc_id % 5 AS VARCHAR)
             ELSE '' END AS qc
    FROM documents
)
SELECT hostc || pathc || qc AS canonical_url,
       MIN(doc_id) AS doc_id,
       COUNT(*) AS n_dups
FROM u GROUP BY 1 ORDER BY 1
"""


def q_text_url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain (eTLD+1) aggregation — the crawl-mix curation
    input: multi-label public suffixes keep three labels
    (news.example.co.uk -> example.co.uk), everything else two."""
    from ..operators.urlops import domain_stats

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", _synthetic_url().alias("url")
    )
    return domain_stats(docs).orderBy("registered_domain")


ORACLE_TEXT_URL_DOMAIN_STATS = """
SELECT CASE CAST(doc_id % 5 AS INT)
           WHEN 0 THEN 'example.com'
           WHEN 1 THEN 'example.co.uk'
           WHEN 2 THEN 'site.org'
           WHEN 3 THEN 'abc.xyz'
           ELSE '192.168.0.1' END AS registered_domain,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS first_id
FROM documents GROUP BY 1 ORDER BY 1
"""


register("text_url_dedup", q_text_url_dedup, ORACLE_TEXT_URL_DEDUP)
register(
    "text_url_domain_stats", q_text_url_domain_stats,
    ORACLE_TEXT_URL_DOMAIN_STATS,
)


def q_text_url_registered_domain_psl(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Data-driven eTLD+1 (registered_domain_from, VERDICT r8 #6): the
    suffix list arrives AS A TABLE, so the full Mozilla PSL drops in as
    data. The planted list includes 'static.site.org' — a suffix the
    embedded subset does NOT know — so this query's output DIFFERS from
    text_url_domain_stats on host class 2 (cdn.static.site.org keeps
    three-deep: longest-listed-suffix-wins is what's under test), and
    'uk' alongside 'co.uk' pins longest-over-shortest."""
    from ..operators.urlops import canonical_host, registered_domain_from

    psl = spark.createDataFrame(
        [("com",), ("uk",), ("co.uk",), ("org",), ("static.site.org",),
         ("xyz",)],
        "suffix string",
    )
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", canonical_host(_synthetic_url()).alias("host")
    )
    return (
        registered_domain_from(docs, psl)
        .groupBy("registered_domain")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_id"))
        .orderBy("registered_domain")
    )


ORACLE_TEXT_URL_REGISTERED_DOMAIN_PSL = """
SELECT CASE CAST(doc_id % 5 AS INT)
           WHEN 0 THEN 'example.com'
           WHEN 1 THEN 'example.co.uk'
           WHEN 2 THEN 'cdn.static.site.org'
           WHEN 3 THEN 'abc.xyz'
           ELSE '192.168.0.1' END AS registered_domain,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS first_id
FROM documents GROUP BY 1 ORDER BY 1
"""

register(
    "text_url_registered_domain_psl", q_text_url_registered_domain_psl,
    ORACLE_TEXT_URL_REGISTERED_DOMAIN_PSL,
)


def q_text_url_idn_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDN -> punycode host folding (operators/urlops.fold_idn_hosts):
    planted Unicode hosts fold to their RFC 3490 ACE forms — classes 0
    and 3 (münchen.de and its already-ACE twin) MERGE into one group,
    which is the dedup-recall point of folding; the ASCII class passes
    through the JVM-side branch untouched. The oracle states the
    expected ACE strings directly from doc_id arithmetic (the punycode
    algebra is not re-derived in SQL — both engines would need the
    codec; the CLAIM under test is which class maps to which ACE form
    and that the folded classes collide)."""
    from ..operators.urlops import fold_idn_hosts

    d = F.col("doc_id")
    host = (
        F.when(d % 4 == 0, "münchen.de")
        .when(d % 4 == 1, "bücher.example")
        .when(d % 4 == 2, "plain.example.com")
        .otherwise("xn--mnchen-3ya.de")
    )
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", host.alias("host")
    )
    return (
        fold_idn_hosts(docs)
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_id"))
        .orderBy("host")
    )


ORACLE_TEXT_URL_IDN_FOLD = """
SELECT CASE WHEN doc_id % 4 IN (0, 3) THEN 'xn--mnchen-3ya.de'
            WHEN doc_id % 4 = 1 THEN 'xn--bcher-kva.example'
            ELSE 'plain.example.com' END AS host,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS first_id
FROM documents GROUP BY 1 ORDER BY 1
"""

register("text_url_idn_fold", q_text_url_idn_fold, ORACLE_TEXT_URL_IDN_FOLD)


def q_text_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UT1-style host blocklist filtering with the list AS DATA
    (operators/urlops.flag_blocked_hosts): hosts equal to or under a
    listed domain are flagged via depth-bounded broadcast probes — the
    corpus never shuffles. The planted classes pin the two semantic
    traps: 'safetracker.net' shares a string suffix with listed
    'tracker.net' but NOT a label boundary (must stay clean), and
    'bad.co.uk.evil.org' contains a listed domain mid-host (must stay
    clean — only suffix matches block)."""
    from ..operators.urlops import flag_blocked_hosts

    d = F.col("doc_id")
    host = (
        F.when(d % 6 == 0, "tracker.net")
        .when(d % 6 == 1, "ads.tracker.net")
        .when(d % 6 == 2, "safetracker.net")
        .when(d % 6 == 3, "news.example.co.uk")
        .when(d % 6 == 4, "spam.example")
        .otherwise("bad.co.uk.evil.org")
    )
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", host.alias("host")
    )
    bl = spark.createDataFrame(
        [("tracker.net",), ("spam.example",), ("bad.co.uk",)],
        "domain string",
    )
    return (
        flag_blocked_hosts(docs, bl)
        .groupBy("host", "blocked")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_id"))
        .orderBy("host")
    )


ORACLE_TEXT_URL_BLOCKLIST = """
SELECT CASE CAST(doc_id % 6 AS INT)
           WHEN 0 THEN 'tracker.net'
           WHEN 1 THEN 'ads.tracker.net'
           WHEN 2 THEN 'safetracker.net'
           WHEN 3 THEN 'news.example.co.uk'
           WHEN 4 THEN 'spam.example'
           ELSE 'bad.co.uk.evil.org' END AS host,
       CAST(doc_id % 6 AS INT) IN (0, 1, 4) AS blocked,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS first_id
FROM documents GROUP BY 1, 2 ORDER BY 1
"""

register(
    "text_url_blocklist_filter", q_text_url_blocklist,
    ORACLE_TEXT_URL_BLOCKLIST,
)


def q_text_url_surt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT URL keys (operators/urlops.surt_key — the CDX crawl-index
    sort convention): host labels reversed+comma-joined then ')' + the
    normalize_url path/query canonicalization, so a sorted layout
    clusters every registered domain into one contiguous key range. The
    synthetic classes reuse _synthetic_url, so the same planted traps
    ride along: pct-escape collisions must collide IN SURT FORM too,
    tracking params must be gone, and the IP-literal class must keep its
    octet order (reversing a dotted quad would scatter subnets)."""
    from ..operators.urlops import surt_key

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", _synthetic_url().alias("url")
    )
    return (
        docs.select("doc_id", surt_key(F.col("url")).alias("urlkey"))
        .groupBy("urlkey")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_id"))
        .orderBy("urlkey")
    )


ORACLE_TEXT_URL_SURT = """
WITH u AS (
    SELECT doc_id,
        CASE CAST(doc_id % 5 AS INT)
            WHEN 0 THEN 'com,example'
            WHEN 1 THEN 'uk,co,example,news'
            WHEN 2 THEN 'org,site,static,cdn'
            WHEN 3 THEN 'xyz,abc'
            ELSE '192.168.0.1' END AS revhost,
        CASE WHEN doc_id % 11 = 0 THEN ''
             WHEN doc_id % 13 IN (0, 1)
                  THEN '/p~/' || CAST(doc_id % 7 AS VARCHAR)
             WHEN doc_id % 13 = 2
                  THEN '/a%3Ab/' || CAST(doc_id % 7 AS VARCHAR)
             ELSE '/p/' || CAST(doc_id % 7 AS VARCHAR) END AS pathc,
        CASE WHEN doc_id % 3 IN (0, 1)
             THEN '?id=' || CAST(doc_id % 5 AS VARCHAR)
             ELSE '' END AS qc
    FROM documents
)
SELECT revhost || ')' || pathc || qc AS urlkey,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS first_id
FROM u GROUP BY 1 ORDER BY 1
"""

register("text_url_surt_keys", q_text_url_surt, ORACLE_TEXT_URL_SURT)


_ROBOTS_A = (
    "User-agent: curatorbot\n"
    "Disallow: /private/\n"
    "Allow: /private/open\n"
    "Disallow: /*.pdf$\n"
    "User-agent: *\n"
    "Disallow: /\n"
)
_ROBOTS_B = (
    "User-agent: otherbot\n"
    "Allow: /\n"
    "User-agent: *\n"
    "Disallow: /blog\n"
    "Allow: /blog/public\n"
)


def q_text_url_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots.txt exclusion with the robots bodies AS DATA
    (operators/robots.robots_allowed): per-host rule groups parsed by a
    single JVM-side aggregate fold, compiled to a broadcast rules map,
    corpus streams map-side. The planted classes pin the normative
    traps: longest-match precedence (allow /private/open under disallow
    /private/), the trailing-$ anchor (/doc.pdf blocked, /doc.pdfx
    clean), named-group selection (host A's star group says disallow-/
    but curatorbot's own group must win), star fallback (host B's
    otherbot group must be IGNORED for curatorbot), and absent robots
    (host C) = allow-all."""
    from ..operators.robots import robots_allowed

    d = F.col("doc_id")
    host = (
        F.when(d % 3 == 0, "a.example")
        .when(d % 3 == 1, "b.example")
        .otherwise("norobots.example")
    )
    path = (
        F.when(d % 5 == 0, "/private/sub/x")
        .when(d % 5 == 1, "/private/open/1")
        .when(d % 5 == 2, "/doc.pdf")
        .when(d % 5 == 3, "/blog/x")
        .otherwise("/blog/public/p")
    )
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", host.alias("host"), path.alias("path")
    )
    robots = spark.createDataFrame(
        [("a.example", _ROBOTS_A), ("b.example", _ROBOTS_B)],
        "host string, robots_txt string",
    )
    return (
        robots_allowed(docs, robots, "CuratorBot")
        .groupBy("host", "path", "allowed")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_id"))
        .orderBy("host", "path")
    )


ORACLE_TEXT_URL_ROBOTS = """
WITH u AS (
    SELECT doc_id,
        CASE CAST(doc_id % 3 AS INT)
            WHEN 0 THEN 'a.example'
            WHEN 1 THEN 'b.example'
            ELSE 'norobots.example' END AS host,
        CASE CAST(doc_id % 5 AS INT)
            WHEN 0 THEN '/private/sub/x'
            WHEN 1 THEN '/private/open/1'
            WHEN 2 THEN '/doc.pdf'
            WHEN 3 THEN '/blog/x'
            ELSE '/blog/public/p' END AS path
    FROM documents
)
SELECT host, path,
       CASE WHEN host = 'norobots.example' THEN TRUE
            WHEN host = 'a.example'
                THEN CAST(doc_id % 5 AS INT) IN (1, 3)
                  OR CAST(doc_id % 5 AS INT) = 4
            ELSE CAST(doc_id % 5 AS INT) <> 3 END AS allowed,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS first_id
FROM u GROUP BY 1, 2, 3 ORDER BY 1, 2
"""

register("text_url_robots_filter", q_text_url_robots, ORACLE_TEXT_URL_ROBOTS)


def q_text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML main-content extraction (operators/text.extract_main_text —
    boilerpipe/jusText shallow features: block length + link density,
    pure Column algebra). The planted page has one block per failure
    mode: a nav bar that is LONG enough but all-anchor (density must
    drop it), a footer likewise, a too-short prose block (length must
    drop it), a script (invisible), and headline + content blocks that
    must survive — the content with its inline anchor text kept and its
    &amp; entity decoded. Expected output is the literal headline +
    newline + sentence, so segmentation, the keep rule AND the join are
    all hash-pinned."""
    from ..operators.text import extract_main_text

    n = (F.col("doc_id") % 7).cast("string")
    html = F.concat(
        F.lit("<div><a href=/>Home page link</a> <a href=/a>About the team</a></div>"),
        F.lit("<h1>Headline for document class "), n,
        F.lit(" with enough length</h1>"),
        F.lit("<p>Content sentence number "), n,
        F.lit(" about <a href=/x>analytics engines</a> at scale &amp; speed.</p>"),
        F.lit("<p>ok</p><script>var x = 'invisible text';</script>"),
        F.lit("<div>(c) <a href=/t>Terms of use</a> <a href=/p>Privacy policy</a></div>"),
    )
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", html.alias("html")
    )
    return (
        docs.select(
            "doc_id", extract_main_text(F.col("html")).alias("main_text")
        )
        .groupBy("main_text")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_id"))
        .orderBy("main_text")
    )


ORACLE_TEXT_HTML_EXTRACT = """
SELECT 'Headline for document class ' || CAST(CAST(doc_id % 7 AS INT) AS VARCHAR)
       || ' with enough length' || chr(10) ||
       'Content sentence number ' || CAST(CAST(doc_id % 7 AS INT) AS VARCHAR)
       || ' about analytics engines at scale & speed.' AS main_text,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS first_id
FROM documents GROUP BY 1 ORDER BY 1
"""

register("text_html_extract_main", q_text_html_extract, ORACLE_TEXT_HTML_EXTRACT)


# --- distributed Bloom filter (round 9): cross-batch membership ---------------
# operators/membership.py — build over the even-doc fingerprints, probe
# every document. md5-derived positions + 63-bit BIGINT words make both
# the filter AND every probe decision engine-portable, so the oracle
# reproduces the exact false-positive set (false negatives are
# structurally impossible and separately pinned by unit test). m is
# sized so the sf0.01 fixture (500 docs, 250 members -> 1000 set bits)
# actually PRODUCES false positives (fill ~0.39, FP ~2% -> a handful of
# deterministic FP rows) — at a production m the FP group would be
# empty at driver scale and the oracle would never exercise the
# positive-but-not-member decision path.

_BF_M, _BF_K = 1 << 11, 4


def q_dedup_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.membership import bloom_build, bloom_might_contain
    from ..operators.text import fingerprint

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )
    members = docs.where(F.col("doc_id") % 2 == 0)
    filt = bloom_build(members, "fp", m_bits=_BF_M, k=_BF_K)
    probed = bloom_might_contain(docs, filt, "fp", m_bits=_BF_M, k=_BF_K)
    return (
        probed.select(
            (F.col("doc_id") % 2 == 0).alias("is_member"),
            "might_contain",
            "doc_id",
        )
        .groupBy("is_member", "might_contain")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_id"))
        .orderBy("is_member", "might_contain")
    )


ORACLE_DEDUP_BLOOM_MEMBERSHIP = f"""
WITH fp AS (
    SELECT doc_id,
           md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fp
    FROM documents
),
pos AS (
    SELECT f.doc_id, f.fp,
           (CAST(('0x' || substr(md5(f.fp || '#b' || CAST(i.i AS VARCHAR)),
                                 1, 15)) AS BIGINT) % {_BF_M}) AS p
    FROM fp f, (SELECT unnest([0, 1, 2, 3]) AS i) i
),
words AS (
    SELECT CAST(p // 63 AS INT) AS word_idx,
           bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS word
    FROM pos WHERE doc_id % 2 = 0 GROUP BY 1
),
probe AS (
    SELECT q.doc_id,
           bool_and(
               (COALESCE(w.word, 0)
                & (CAST(1 AS BIGINT) << CAST(q.p % 63 AS INT))) <> 0
           ) AS might_contain
    FROM pos q
    LEFT JOIN words w ON w.word_idx = CAST(q.p // 63 AS INT)
    GROUP BY 1
)
SELECT (doc_id % 2 = 0) AS is_member, might_contain,
       COUNT(*) AS n_docs, MIN(doc_id) AS first_id
FROM probe GROUP BY 1, 2 ORDER BY 1, 2
"""

register(
    "dedup_bloom_membership", q_dedup_bloom_membership,
    ORACLE_DEDUP_BLOOM_MEMBERSHIP,
)


# --- NB quality classifier (round 8): train/apply, integer-exact -------------
# fastText-style corpus-curation classifier (operators/classifier.py):
# label the training slice by a planted content signal (contains
# 'spark'), train multinomial NB counts, score the HELD slice with
# fixed-point Laplace-smoothed means + priors (integer div everywhere),
# predict by deterministic argmax. Both queries are exactly
# oracle-hashed; planted-signal recovery is unit-tested in
# tests/test_classifier.py.

def _nb_parts(spark: SparkSession, sf_dir: str):
    from ..operators.classifier import train_nb

    docs = read_table(spark, sf_dir, "documents")
    labeled = docs.where(F.col("doc_id") % 10 < 8).withColumn(
        "label",
        F.when(F.col("text").contains("spark"), "sparky").otherwise("plain"),
    )
    held = docs.where(F.col("doc_id") % 10 >= 8)
    return train_nb(labeled), held


def q_text_nb_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classifier import nb_scores

    model, held = _nb_parts(spark, sf_dir)
    return nb_scores(model, held).orderBy("doc_id", "label")


def q_text_nb_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classifier import nb_predict

    model, held = _nb_parts(spark, sf_dir)
    return nb_predict(model, held).orderBy("doc_id")


_NB_CTES = f"""
WITH train AS (
    SELECT doc_id,
           CASE WHEN text LIKE '%spark%' THEN 'sparky' ELSE 'plain' END AS label,
           {_D_TOKENS.format(t='text')} AS toks
    FROM documents WHERE doc_id % 10 < 8
),
ttok AS (SELECT doc_id, label, UNNEST(toks) AS tok FROM train),
tc AS (SELECT label, tok, COUNT(*) AS c FROM ttok GROUP BY 1, 2),
ls AS (SELECT label, COUNT(*) AS tok_total,
              COUNT(DISTINCT doc_id) AS n_docs FROM ttok GROUP BY 1),
meta AS (SELECT COUNT(DISTINCT tok) AS v,
                COUNT(DISTINCT doc_id) AS n_docs_total FROM ttok),
held AS (
    SELECT doc_id, {_D_TOKENS.format(t='text')} AS toks
    FROM documents WHERE doc_id % 10 >= 8
),
htok AS (SELECT doc_id, UNNEST(toks) AS tok FROM held),
pairs AS (
    SELECT h.doc_id, l.label, l.tok_total, l.n_docs, tc.c,
           m.v, m.n_docs_total
    FROM htok h
    CROSS JOIN ls l
    LEFT JOIN tc ON tc.label = l.label AND tc.tok = h.tok
    CROSS JOIN meta m
),
scores AS (
    SELECT doc_id, label,
           COUNT(*) AS n_toks,
           CAST(SUM(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM((COALESCE(c, 0) + 1) * 1000000 // (tok_total + v))
                // COUNT(*) AS BIGINT) AS tok_mean_e6,
           CAST(MIN(n_docs * 1000000 // n_docs_total) AS BIGINT) AS prior_e6,
           CAST(SUM((COALESCE(c, 0) + 1) * 1000000 // (tok_total + v))
                // COUNT(*)
                + MIN(n_docs * 1000000 // n_docs_total) AS BIGINT) AS score_e6
    FROM pairs GROUP BY 1, 2
)
"""

ORACLE_TEXT_NB_SCORES = _NB_CTES + """
SELECT doc_id, label, n_toks, n_oov, tok_mean_e6, prior_e6, score_e6
FROM scores ORDER BY doc_id, label
"""

ORACLE_TEXT_NB_PREDICT = _NB_CTES + """,
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score_e6 DESC, label ASC) AS rk
    FROM scores
)
SELECT b.doc_id, b.label AS predicted,
       b.score_e6 AS best_e6,
       CAST(b.score_e6 - COALESCE(s.score_e6, 0) AS BIGINT) AS margin_e6
FROM ranked b
LEFT JOIN ranked s ON s.doc_id = b.doc_id AND s.rk = 2
WHERE b.rk = 1 ORDER BY b.doc_id
"""

register("text_nb_scores", q_text_nb_scores, ORACLE_TEXT_NB_SCORES)
register("text_nb_predict", q_text_nb_predict, ORACLE_TEXT_NB_PREDICT)


# --- true-NB log-space mode (round 10, VERDICT r9 #5) --------------------------
# mode='log' ranks by the actual multinomial-NB log-likelihood. Every ln
# argument is an integer, so ln is shared fixed-point DATA + integer
# CASE algebra (classifier.log_lut / mantissa_shift_sql): the oracle
# carries the SAME 1023-row LUT as a VALUES CTE and the SAME generated
# CASE chains (DuckDB '//' spelling), so the hash match is exact — no
# libm in either engine's plan.

def q_text_nb_predict_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classifier import nb_predict

    model, held = _nb_parts(spark, sf_dir)
    return nb_predict(model, held, mode="log").orderBy("doc_id")


def _oracle_nb_log() -> str:
    from ..operators.classifier import (
        ilog_e6_oracle_sql as ilog,
        log_lut_values_sql,
    )

    return (
        f"WITH lut(m, ln_e6) AS (VALUES {log_lut_values_sql()}),"
        + _NB_CTES.split("WITH", 1)[1]
        + f""",
lstats AS (
    SELECT l.label,
           {ilog('l.tok_total + m.v')} AS ln_tv,
           {ilog('l.n_docs')} - {ilog('m.n_docs_total')} AS prior_log_e6
    FROM ls l CROSS JOIN meta m
),
logscores AS (
    SELECT p.doc_id, p.label,
           COUNT(*) AS n_toks,
           CAST(SUM({ilog('COALESCE(p.c, 0) + 1')})
                - COUNT(*) * MIN(s.ln_tv)
                + MIN(s.prior_log_e6) AS BIGINT) AS score_log_e6
    FROM pairs p JOIN lstats s ON s.label = p.label
    GROUP BY 1, 2
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score_log_e6 DESC, label ASC) AS rk
    FROM logscores
)
SELECT b.doc_id, b.label AS predicted,
       b.score_log_e6 AS best_e6,
       CAST(b.score_log_e6 - COALESCE(s.score_log_e6, 0) AS BIGINT)
           AS margin_e6
FROM ranked b
LEFT JOIN ranked s ON s.doc_id = b.doc_id AND s.rk = 2
WHERE b.rk = 1 ORDER BY b.doc_id
"""
    )


register("text_nb_predict_log", q_text_nb_predict_log, _oracle_nb_log())


# --- winnowing document fingerprints (round 10) --------------------------------
# operators/fingerprint.py — the MOSS local-fingerprinting algorithm
# (k-gram polynomial hashes + rightmost-min windows), the brief's
# "document fingerprinting (rolling hash)" row. Integer algebra end to
# end; the oracle is generated from the SAME dialect-templated
# fragments as the Spark plan (squash/hash/winnow), so the two engines
# share one definition of the selection.

_WIN_K, _WIN_W = 7, 4


def _winnow_ctes(src: str = "documents") -> str:
    from ..operators.fingerprint import (
        hashes_sql,
        squash_sql,
        winnow_positions_sql,
    )

    return f"""
WITH s AS (
    SELECT doc_id, {squash_sql('text', 'duck')} AS sq
    FROM {src} WHERE text IS NOT NULL
),
h AS (SELECT doc_id, {hashes_sql('sq', _WIN_K, 'duck')} AS hs FROM s),
sel AS (SELECT doc_id, hs,
        {winnow_positions_sql('hs', 'len(hs)', _WIN_W, 'duck')} AS sel
        FROM h),
fp AS (SELECT doc_id, CAST(unnest(sel) AS BIGINT) AS pos, hs FROM sel),
fps AS (SELECT doc_id, pos, hs[CAST(pos AS BIGINT)] AS fp_hash FROM fp)
"""


def _winnow_doc_aggregate(fps: DataFrame) -> DataFrame:
    """Shared per-doc summary over a (doc_id, pos, fp_hash) fingerprint
    frame — ONE definition for the HOF and Arrow registrations below, so
    the two entries that claim to be pinned to each other cannot drift
    by a column added to only one aggregate (review finding, r11)."""
    return (
        fps.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.count_distinct("fp_hash").alias("n_distinct"),
            F.min("fp_hash").alias("min_fp"),
            F.max("fp_hash").alias("max_fp"),
            F.min("pos").alias("first_pos"),
            F.max("pos").alias("last_pos"),
        )
        .orderBy("doc_id")
    )


def q_text_winnow_fingerprints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.fingerprint import winnow_fingerprints

    docs = read_table(spark, sf_dir, "documents")
    return _winnow_doc_aggregate(winnow_fingerprints(docs, k=_WIN_K, w=_WIN_W))


ORACLE_TEXT_WINNOW_FINGERPRINTS = _winnow_ctes() + """
SELECT doc_id, COUNT(*) AS n_fps, COUNT(DISTINCT fp_hash) AS n_distinct,
       MIN(fp_hash) AS min_fp, MAX(fp_hash) AS max_fp,
       MIN(pos) AS first_pos, MAX(pos) AS last_pos
FROM fps GROUP BY 1 ORDER BY 1
"""


def q_dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap candidates: >= 3 shared rare fingerprints (df <= 5).
    The fingerprint layer guarantees >= 1 shared fingerprint per
    common squashed substring of length >= k+w-1 = 10; these pair
    thresholds then deliberately trade recall for join safety (pairs
    sharing only one short run, or only boilerplate df>5 grams, are
    not emitted — see winnow_overlap_pairs' docstring)."""
    from ..operators.fingerprint import winnow_overlap_pairs

    docs = read_table(spark, sf_dir, "documents")
    return (
        winnow_overlap_pairs(
            docs, k=_WIN_K, w=_WIN_W, min_shared=3, max_df=5
        )
        .orderBy("i", "j")
    )


def _winnow_pairs_sql(
    src: str = "documents", min_shared: int = 3, max_df: int = 5,
) -> str:
    """Winnow overlap-pair SQL over any (doc_id, text) source — shared
    by the standalone pair oracle and the recall probe's candidate
    side (round 11)."""
    return _winnow_ctes(src) + f""",
d AS (SELECT DISTINCT doc_id AS i, fp_hash FROM fps),
rare AS (SELECT fp_hash FROM d GROUP BY 1 HAVING COUNT(*) <= {max_df}),
keyed AS (SELECT i, d.fp_hash FROM d JOIN rare USING (fp_hash))
SELECT a.i AS i, b.i AS j, COUNT(*) AS n_shared
FROM keyed a JOIN keyed b ON a.fp_hash = b.fp_hash AND a.i < b.i
GROUP BY 1, 2 HAVING COUNT(*) >= {min_shared}
"""


ORACLE_DEDUP_WINNOW_PAIRS = _winnow_pairs_sql() + " ORDER BY 1, 2"


def q_text_winnow_df_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint document-frequency histogram
    (operators/fingerprint.py:fingerprint_df_histogram) — the table one
    reads to CHOOSE winnow_overlap_pairs' max_df (PERFORMANCE §65a: the
    cap must sit above the corpus' duplication factor and below
    boilerplate df; at a replicated corpus a too-low cap silently drops
    whole duplicate families). Pure integer counts over the same
    dialect-templated fingerprint selection, so the histogram is exactly
    oracle-hashed."""
    from ..operators.fingerprint import fingerprint_df_histogram

    docs = read_table(spark, sf_dir, "documents")
    return fingerprint_df_histogram(docs, k=_WIN_K, w=_WIN_W).orderBy("df")


ORACLE_TEXT_WINNOW_DF_PROFILE = _winnow_ctes() + """,
d AS (SELECT DISTINCT doc_id, fp_hash FROM fps),
per_hash AS (SELECT fp_hash, COUNT(*) AS df FROM d GROUP BY 1)
SELECT df, COUNT(*) AS n_hashes, df * COUNT(*) AS n_postings
FROM per_hash GROUP BY df ORDER BY df
"""


register(
    "text_winnow_fingerprints", q_text_winnow_fingerprints,
    ORACLE_TEXT_WINNOW_FINGERPRINTS,
)


def q_text_winnow_fingerprints_arrow(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SAME winnow aggregate through the Arrow-batched numpy
    fingerprint stage (operators/fingerprint.winnow_fingerprints_numpy)
    — the measured scale path for large corpora (PERFORMANCE §70: the
    interpreted HOF constant is ~30 ms/doc vs ~0.1 ms/doc vectorized).
    Checked against the IDENTICAL DuckDB oracle as the HOF registration,
    so the driver's own gate pins the two implementations to each other
    every round. The Python stage appears in the plan as MapInPandas
    (Arrow-batched; the no-Python rule's documented-exception class —
    the budget counters track ArrowEvalPython/BatchEvalPython, which
    stay 0 here)."""
    from ..operators.fingerprint import winnow_fingerprints_numpy

    docs = read_table(spark, sf_dir, "documents")
    return _winnow_doc_aggregate(
        winnow_fingerprints_numpy(docs, k=_WIN_K, w=_WIN_W)
    )


register(
    "text_winnow_fingerprints_arrow", q_text_winnow_fingerprints_arrow,
    ORACLE_TEXT_WINNOW_FINGERPRINTS,
)
register(
    "dedup_winnow_pairs", q_dedup_winnow_pairs, ORACLE_DEDUP_WINNOW_PAIRS,
)
register(
    "text_winnow_df_profile", q_text_winnow_df_profile,
    ORACLE_TEXT_WINNOW_DF_PROFILE,
)


# --- sampling: token-budget mixture solver (water-filling) --------------------

_TBM_BUDGET = 120_000
_TBM_SCALE = 10_000


def q_sampling_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture design (operators/sampling.py:token_budget_mix):
    water-fill a 120k-token training budget across sources with mixture
    weights 1 + (i % 4), availability-capped — low-availability/high-weight
    sources saturate (contribute everything they have), the rest split the
    remaining budget proportionally to weight with largest-remainder
    rounding, so the grand total is exactly min(budget, total available).
    Every step is BIGINT (quantized-ratio sort key, cross-multiplied
    saturation test, floor-division shares), so the DuckDB oracle replicates
    the full fixpoint bit-for-bit — including WHICH strata saturate and
    where the remainder tokens land."""
    from ..operators.sampling import token_budget_mix

    docs = read_table(spark, sf_dir, "documents")
    out = token_budget_mix(
        docs, "source", "n_chars", budget=_TBM_BUDGET, weights=SRC_WEIGHTS,
        ratio_scale=_TBM_SCALE,
    )
    return out.orderBy("strata")


from .mixsql import (  # noqa: F401 — re-exported for existing importers
    _SRC_WEIGHT_SQL,
    SRC_WEIGHTS,
    materialize_ctes_sql,
    tbm_ctes_sql,
)


# shared CTE chain: per-source counts -> water-filling fixpoint -> `alloc`
# (strata, avail_tokens, weight, saturated, alloc_tokens); the materializer
# oracle composes on top of it
_TBM_CTES = "\nWITH " + tbm_ctes_sql(
    "documents", _TBM_BUDGET, _SRC_WEIGHT_SQL, _TBM_SCALE, "n_chars"
) + "\n"

ORACLE_SAMPLING_TOKEN_BUDGET_MIX = _TBM_CTES + """
SELECT strata,
       CAST(avail_tokens AS BIGINT) AS avail_tokens,
       CAST(weight AS BIGINT) AS weight,
       saturated,
       CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
       CAST(CASE WHEN avail_tokens > 0
                 THEN (alloc_tokens * 1000000) // avail_tokens
                 ELSE 0 END AS BIGINT) AS rate_e6
FROM alloc ORDER BY strata
"""


register(
    "sampling_token_budget_mix", q_sampling_token_budget_mix,
    ORACLE_SAMPLING_TOKEN_BUDGET_MIX,
)


# --- dedup: quality-aware canonical selection ----------------------------------

def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best-quality near-dup dedup (operators/dedup.py:
    keep_best_per_cluster): the same banded-LSH -> connected-components
    cluster table as dedup_near_dup_clusters, but the keep policy is
    CCNet/RefinedWeb-style — per cluster, flag the member with the most
    characters (ties by lowest doc_id) instead of the min-id or
    first-claim member. Cluster membership AND the quality ranking are
    exact integer decisions, so the oracle reproduces the kept set
    bit-for-bit via the same recursive-CTE components plus a window."""
    from ..operators import dedup as D

    docs = read_table(spark, sf_dir, "documents")
    clusters = D.near_dup_clusters(
        docs.select("doc_id", "text"), "doc_id", "text",
        k=16, bands=8, shingle_k=2,
    )
    withq = clusters.select("doc_id", "cluster_id").join(
        docs.select("doc_id", F.col("n_chars").cast("long").alias("n_chars")),
        "doc_id",
    )
    return (
        D.keep_best_per_cluster(withq, "cluster_id", "n_chars", "doc_id")
        .select("doc_id", "cluster_id", "n_chars", "kept_best_i")
        .orderBy("doc_id")
    )


def _oracle_keep_best() -> str:
    from .extensions import _lsh_pairs_sql

    return f"""
WITH RECURSIVE pairs AS ({_lsh_pairs_sql('documents')}),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(id, anc) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.id
),
clusters AS (
    SELECT id AS doc_id, MIN(anc) AS cluster_id FROM reach GROUP BY id
),
q AS (
    SELECT c.doc_id, c.cluster_id, CAST(d.n_chars AS BIGINT) AS n_chars
    FROM clusters c JOIN documents d USING (doc_id)
)
SELECT doc_id, cluster_id, n_chars,
       CAST(CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id
            ) = 1 THEN 1 ELSE 0 END AS BIGINT) AS kept_best_i
FROM q ORDER BY doc_id
"""


register("dedup_keep_best", q_dedup_keep_best, _oracle_keep_best())


# --- classifier: threshold sweep (cutoff selection) ---------------------------

def q_text_nb_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter cutoff selection (operators/classifier.py:
    threshold_sweep): score the held slice with the NB 'sparky' class
    score, take the planted content signal (text contains 'spark') as
    truth, and emit the full precision/recall/F1 table over every
    occurring score threshold — the table one reads to pick the
    keep-documents-above-X cutoff. Counts and fixed-point ratios are all
    BIGINT, so the sweep is exactly oracle-hashed on top of the same NB
    CTEs as text_nb_scores."""
    from ..operators.classifier import nb_scores, threshold_sweep

    model, held = _nb_parts(spark, sf_dir)
    scored = (
        nb_scores(model, held)
        .where(F.col("label") == "sparky")
        .select("doc_id", "score_e6")
    )
    truth = held.select(
        "doc_id",
        F.col("text").contains("spark").cast("long").alias("is_sparky"),
    )
    joined = scored.join(truth, "doc_id")
    return threshold_sweep(joined, "score_e6", "is_sparky").orderBy(
        "threshold"
    )


ORACLE_TEXT_NB_THRESHOLD_SWEEP = _NB_CTES + """,
truth AS (
    SELECT doc_id,
           CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS is_sparky
    FROM documents WHERE doc_id % 10 >= 8
),
pts AS (
    SELECT s.score_e6 AS threshold, t.is_sparky
    FROM scores s JOIN truth t USING (doc_id)
    WHERE s.label = 'sparky'
),
perth AS (
    SELECT threshold,
           SUM(is_sparky) AS n_pos,
           SUM(1 - is_sparky) AS n_neg
    FROM pts GROUP BY 1
),
cum AS (
    SELECT threshold,
           SUM(n_pos) OVER (ORDER BY threshold DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
           SUM(n_neg) OVER (ORDER BY threshold DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
           SUM(n_pos) OVER () AS tot_pos,
           SUM(n_neg) OVER () AS tot_neg
    FROM perth
)
SELECT CAST(threshold AS BIGINT) AS threshold,
       CAST(tp AS BIGINT) AS tp,
       CAST(fp AS BIGINT) AS fp,
       CAST(tot_pos - tp AS BIGINT) AS fn,
       CAST(tot_neg - fp AS BIGINT) AS tn,
       CAST((tp * 1000000) // (tp + fp) AS BIGINT) AS precision_e6,
       CAST(CASE WHEN tot_pos > 0 THEN (tp * 1000000) // tot_pos
                 ELSE 0 END AS BIGINT) AS recall_e6,
       CAST((2 * tp * 1000000) // (2 * tp + fp + (tot_pos - tp))
            AS BIGINT) AS f1_e6
FROM cum ORDER BY threshold
"""


register(
    "text_nb_threshold_sweep", q_text_nb_threshold_sweep,
    ORACLE_TEXT_NB_THRESHOLD_SWEEP,
)


# --- sampling: token-mix materialization (greedy hash-prefix) -----------------

def q_sampling_materialize_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the water-filled allocation end-to-end
    (operators/sampling.py:materialize_token_mix): the solver's
    per-source token budgets are materialized as a deterministic
    md5-ordered document prefix per source — full corpus flagged, greedy
    (never exceeds the allocation, undershoots by less than one
    document). The two-grain cumulative sum (bucket totals, then
    per-document only inside the cutoff bucket) is all integer, so the
    oracle reproduces the kept flag for every document."""
    from ..operators.sampling import materialize_token_mix, token_budget_mix

    docs = read_table(spark, sf_dir, "documents").where(
        F.col("source").isNotNull()
    )
    alloc = token_budget_mix(
        docs, "source", "n_chars", budget=_TBM_BUDGET, weights=SRC_WEIGHTS,
        ratio_scale=_TBM_SCALE,
    )
    flagged = materialize_token_mix(
        docs, alloc, "source", "n_chars", "doc_id", salt="mix"
    )
    return flagged.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        "kept_i",
    ).orderBy("doc_id")


ORACLE_SAMPLING_MATERIALIZE_MIX = _TBM_CTES + ",\n" + materialize_ctes_sql(
    "documents", "mix", "n_chars"
) + """
SELECT doc_id, source, t AS n_chars, kept_i
FROM mixed ORDER BY doc_id
"""


register(
    "sampling_materialize_mix", q_sampling_materialize_mix,
    ORACLE_SAMPLING_MATERIALIZE_MIX,
)


# --- corpus: snapshot drift (fixed-point KL decomposition) ---------------------

def q_corpus_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift monitoring (operators/corpus.py:corpus_kl_drift):
    split the documents table into two snapshots (doc_id % 3) and emit
    the per-token KL(P_a || P_b) decomposition over Laplace-smoothed
    unigrams. Every logarithm is the classifier module's 1023-row
    fixed-point LUT consumed as data, so the full drift table —
    including the signed per-token contributions — is exactly
    oracle-hashed."""
    from ..operators.corpus import corpus_kl_drift

    docs = read_table(spark, sf_dir, "documents")
    a = docs.where(F.col("doc_id") % 3 != 0)
    b = docs.where(F.col("doc_id") % 3 == 0)
    return corpus_kl_drift(a, b, "text").orderBy("token")


def _oracle_kl_drift() -> str:
    from ..operators.classifier import (
        ilog_e6_oracle_sql as ilog,
        log_lut_values_sql,
    )

    toks = _D_TOKENS.format(t="text")
    return f"""
WITH lut(m, ln_e6) AS (VALUES {log_lut_values_sql()}),
ta AS (SELECT UNNEST({toks}) AS token FROM documents WHERE doc_id % 3 <> 0),
tb AS (SELECT UNNEST({toks}) AS token FROM documents WHERE doc_id % 3 = 0),
ca AS (SELECT token, COUNT(*) AS count_a FROM ta GROUP BY 1),
cb AS (SELECT token, COUNT(*) AS count_b FROM tb GROUP BY 1),
j AS (
    SELECT COALESCE(ca.token, cb.token) AS token,
           COALESCE(count_a, 0) AS count_a,
           COALESCE(count_b, 0) AS count_b
    FROM ca FULL OUTER JOIN cb ON ca.token = cb.token
),
tot AS (
    SELECT COUNT(*) AS v, SUM(count_a) AS na, SUM(count_b) AS nb FROM j
),
d AS (
    SELECT j.token, j.count_a, j.count_b,
           CAST({ilog('j.count_a + 1')} - {ilog('j.count_b + 1')}
                + {ilog('t.nb + t.v')} - {ilog('t.na + t.v')}
                AS BIGINT) AS delta_log_e6,
           CAST(t.na + t.v AS BIGINT) AS norm_a
    FROM j CROSS JOIN tot t
)
SELECT token,
       CAST(count_a AS BIGINT) AS count_a,
       CAST(count_b AS BIGINT) AS count_b,
       delta_log_e6,
       CAST((count_a + 1) * delta_log_e6 AS BIGINT) AS contrib_num,
       norm_a
FROM d ORDER BY token
"""


register("corpus_kl_drift", q_corpus_kl_drift, _oracle_kl_drift())


# --- dedup: LSH recall probe (sampled generator validation) --------------------

_RP_FRAC_BUCKETS, _RP_T = 5000, 6000  # sample_frac=0.5, threshold 0.6


def q_dedup_lsh_recall_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled validation of the banded-LSH candidate generator
    (operators/dedup.py:lsh_recall_probe): on a deterministic half
    sample, exact distinct-shingle Jaccard truth at t=0.6 vs the
    k=16/bands=8 band collisions — the confusion counts and fixed-point
    recall/precision one reads before trusting the generator at a scale
    where exact all-pairs is unrunnable. Every label is md5/integer, so
    the single-row result is exactly oracle-hashed."""
    from ..operators.dedup import lsh_recall_probe

    return lsh_recall_probe(
        read_table(spark, sf_dir, "documents"),
        "doc_id", "text",
        threshold_e4=_RP_T, sample_frac=_RP_FRAC_BUCKETS / 10_000,
        k=16, bands=8, shingle_k=2, salt="recall",
    )


def _recall_probe_oracle(cands_sql: str) -> str:
    """Shared sampled-recall-probe oracle scaffold (review r11): ONE
    definition of the sample, the exact distinct-2-shingle Jaccard
    truth, and the confusion/ratio arithmetic — the generators differ
    only in ``cands_sql`` (a SELECT producing (doc_a, doc_b, c) over
    the ``sampled`` CTE), so the two probes can never drift onto
    different truths."""
    from .extensions import _D_BUCKET, _D_TOKENS

    bucket = _D_BUCKET.format(k="doc_id", salt="recall")
    toks = _D_TOKENS.format(t="text")
    return f"""
WITH sampled AS (
    SELECT doc_id, text FROM documents WHERE {bucket} < {_RP_FRAC_BUCKETS}
),
std AS (SELECT doc_id, {toks} AS toks FROM sampled),
shl AS (
    SELECT DISTINCT doc_id,
           unnest(list_transform(range(1, GREATEST(len(toks), 1)),
                                 i -> concat_ws(' ', toks[i], toks[i + 1]))) AS sh
    FROM std
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shl GROUP BY 1),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
    FROM shl a JOIN shl b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
truth AS (
    SELECT doc_a, doc_b, 1 AS t FROM inter
    JOIN sizes sa ON sa.doc_id = inter.doc_a
    JOIN sizes sb ON sb.doc_id = inter.doc_b
    WHERE (i * 10000) // (sa.n + sb.n - i) >= {_RP_T}
),
cands AS ({cands_sql}),
u AS (
    SELECT t.t, c.c FROM truth t
    FULL OUTER JOIN cands c
      ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
),
s AS (
    SELECT CAST(COALESCE(SUM(t), 0) AS BIGINT) AS n_truth,
           CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_candidates,
           CAST(COALESCE(SUM(t * c), 0) AS BIGINT) AS n_hit
    FROM u
)
SELECT n_truth, n_candidates, n_hit,
       CAST(CASE WHEN n_truth > 0 THEN (n_hit * 1000000) // n_truth
                 ELSE 1000000 END AS BIGINT) AS recall_e6,
       CAST(CASE WHEN n_candidates > 0 THEN (n_hit * 1000000) // n_candidates
                 ELSE 1000000 END AS BIGINT) AS precision_e6
FROM s
"""


def _oracle_recall_probe() -> str:
    from .extensions import _lsh_pairs_sql

    return _recall_probe_oracle(
        f'SELECT doc_a, doc_b, 1 AS c FROM ({_lsh_pairs_sql("sampled")})'
    )


register(
    "dedup_lsh_recall_probe", q_dedup_lsh_recall_probe, _oracle_recall_probe()
)


def q_dedup_winnow_recall_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The winnow candidate generator measured on the SAME sampled
    exact-Jaccard truth as the LSH probe (VERDICT r10 #6):
    winnow_overlap_pairs at the registered production thresholds
    (min_shared=3, max_df=5, k=7/w=4) vs distinct-2-shingle Jaccard
    >= 0.6 on the deterministic half sample. Winnow's no-miss guarantee
    is about shared LITERAL RUNS, not Jaccard mass, and its pair layer
    deliberately drops one-run and boilerplate-only overlaps — this row
    is where that recall price is measured instead of asserted
    (tradeoff numbers recorded in PERFORMANCE.md §65)."""
    from ..operators.dedup import lsh_recall_probe

    return lsh_recall_probe(
        read_table(spark, sf_dir, "documents"),
        "doc_id", "text",
        threshold_e4=_RP_T, sample_frac=_RP_FRAC_BUCKETS / 10_000,
        shingle_k=2, salt="recall",
        generator="winnow",
        winnow_k=_WIN_K, winnow_w=_WIN_W,
        winnow_min_shared=3, winnow_max_df=5,
    )


def _oracle_winnow_recall_probe() -> str:
    return _recall_probe_oracle(
        "SELECT i AS doc_a, j AS doc_b, 1 AS c\n"
        f"    FROM ({_winnow_pairs_sql('sampled', min_shared=3, max_df=5)})"
    )


register(
    "dedup_winnow_recall_probe", q_dedup_winnow_recall_probe,
    _oracle_winnow_recall_probe(),
)


# --- streaming-adjacent: windowed distribution drift vs reference --------------

def q_events_type_drift_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour drift of the event_type distribution against the
    whole-corpus reference (operators/corpus.py:windowed_kl_vs_reference over
    streaming/windows.py:windowed_value_counts — the SAME transformation
    pair a streaming deployment runs with a watermark, driven batch here
    so the per-window KL table is exactly oracle-hashed; the streaming
    path is gated by test_windowed_value_counts_streaming_matches_batch)."""
    from ..operators.corpus import windowed_kl_vs_reference
    from ..streaming.windows import windowed_value_counts
    from .extensions import _events

    ev = _events(spark, sf_dir)
    wc = windowed_value_counts(ev, "ts", "event_type", "1 hour")
    ref = (
        ev.where(F.col("event_type").isNotNull())
        .groupBy(F.col("event_type").cast("string").alias("token"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = windowed_kl_vs_reference(wc, ref)
    return out.select(
        F.unix_micros(F.col("window_start")).alias("window_start_us"),
        "n_tokens",
        "v_union",
        "kl_e9",
    ).orderBy("window_start_us")


def _type_drift_ctes() -> str:
    """Shared CTE chain through the per-(window, token) drift rows `d` —
    the aggregate and top-movers oracles compose on it, mirroring the
    operators' shared _windowed_drift_rows plan builder."""
    from ..operators.classifier import (
        ilog_e6_oracle_sql as ilog,
        log_lut_values_sql,
    )

    return f"""
WITH lut(m, ln_e6) AS (VALUES {log_lut_values_sql()}),
wc AS (
    SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS ws,
           CAST(event_type AS VARCHAR) AS token, COUNT(*) AS n_win
    FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
),
ref AS (
    SELECT CAST(event_type AS VARCHAR) AS token, COUNT(*) AS n_ref
    FROM events WHERE event_type IS NOT NULL GROUP BY 1
),
wins AS (SELECT DISTINCT ws FROM wc),
expanded AS (SELECT w.ws, r.token, r.n_ref FROM wins w CROSS JOIN ref r),
j0 AS (
    SELECT COALESCE(e.ws, c.ws) AS ws, COALESCE(e.token, c.token) AS token,
           COALESCE(c.n_win, 0) AS n_win, COALESCE(e.n_ref, 0) AS n_ref
    FROM expanded e FULL OUTER JOIN wc c ON e.ws = c.ws AND e.token = c.token
),
tot AS (
    SELECT ws, COUNT(*) AS v, SUM(n_win) AS nw, SUM(n_ref) AS nr
    FROM j0 GROUP BY 1
),
d AS (
    SELECT j0.ws, j0.token, j0.n_win, j0.n_ref,
           CAST({ilog('j0.n_win + 1')} - {ilog('j0.n_ref + 1')}
                + {ilog('t.nr + t.v')} - {ilog('t.nw + t.v')} AS BIGINT) AS delta,
           t.v, t.nw
    FROM j0 JOIN tot t ON t.ws = j0.ws
)
"""


def _oracle_type_drift() -> str:
    return _type_drift_ctes() + """,
agg AS (
    SELECT ws, MAX(nw) AS n_tokens, MAX(v) AS v_union,
           SUM((n_win + 1) * delta) AS s, MAX(nw) + MAX(v) AS norm
    FROM d GROUP BY 1
)
SELECT ws AS window_start_us,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(v_union AS BIGINT) AS v_union,
       CAST((GREATEST(s, 0) // norm) * 1000
            + ((GREATEST(s, 0) % norm) * 1000) // norm AS BIGINT) AS kl_e9
FROM agg ORDER BY 1
"""


register(
    "events_type_drift_windowed", q_events_type_drift_windowed,
    _oracle_type_drift(),
)


def q_events_type_drift_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The detail behind the drift alert (operators/corpus.py:
    windowed_kl_top_movers): per hour window, the 2 event types
    contributing most divergence from the whole-corpus reference — what
    one reads after events_type_drift_windowed fires. Same exact
    fixed-point rows (shared plan builder), so the ranked detail table
    is oracle-hashed too."""
    from ..operators.corpus import windowed_kl_top_movers
    from ..streaming.windows import windowed_value_counts
    from .extensions import _events

    ev = _events(spark, sf_dir)
    wc = windowed_value_counts(ev, "ts", "event_type", "1 hour")
    ref = (
        ev.where(F.col("event_type").isNotNull())
        .groupBy(F.col("event_type").cast("string").alias("token"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = windowed_kl_top_movers(wc, ref, k=2)
    return out.select(
        F.unix_micros(F.col("window_start")).alias("window_start_us"),
        "token",
        "n_win",
        "n_ref",
        "delta_log_e6",
        "contrib_num",
        "mover_rank",
    ).orderBy("window_start_us", "mover_rank")


def _oracle_type_drift_movers() -> str:
    return _type_drift_ctes() + """,
ranked AS (
    SELECT ws, token, n_win, n_ref, delta,
           (n_win + 1) * delta AS contrib,
           ROW_NUMBER() OVER (PARTITION BY ws
               ORDER BY ABS((n_win + 1) * delta) DESC, token) AS rk
    FROM d
)
SELECT ws AS window_start_us, token,
       CAST(n_win AS BIGINT) AS n_win,
       CAST(n_ref AS BIGINT) AS n_ref,
       delta AS delta_log_e6,
       CAST(contrib AS BIGINT) AS contrib_num,
       CAST(rk AS BIGINT) AS mover_rank
FROM ranked WHERE rk <= 2 ORDER BY 1, 7
"""


register(
    "events_type_drift_movers", q_events_type_drift_movers,
    _oracle_type_drift_movers(),
)


# --- drift: numeric-column KS between cohorts ----------------------------------

def q_events_value_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric drift (operators/corpus.py:ks_drift): the exact
    Kolmogorov–Smirnov statistic between the even- and odd-user cohorts'
    event-value distributions (cents fixed-point) — CDFs compared
    cross-multiplied in DECIMAL(38,0), final ratio by integral division,
    so the single-row result (including WHERE the max gap sits) is
    exactly oracle-hashed."""
    from ..operators.corpus import ks_drift
    from .extensions import _events

    ev = _events(spark, sf_dir).withColumn(
        "vc", F.round(F.col("value") * 100).cast("long")
    )
    return ks_drift(
        ev.where("user_id % 2 = 0"), ev.where("user_id % 2 <> 0"), "vc"
    )


ORACLE_EVENTS_VALUE_KS_DRIFT = """
WITH base AS (
    SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS vc
    FROM events WHERE value IS NOT NULL
),
ca AS (SELECT vc AS v, COUNT(*) AS c_a FROM base WHERE user_id % 2 = 0 GROUP BY 1),
cb AS (SELECT vc AS v, COUNT(*) AS c_b FROM base WHERE user_id % 2 <> 0 GROUP BY 1),
j AS (
    SELECT COALESCE(ca.v, cb.v) AS v,
           COALESCE(c_a, 0) AS c_a, COALESCE(c_b, 0) AS c_b
    FROM ca FULL OUTER JOIN cb ON ca.v = cb.v
),
s AS (
    SELECT v,
           SUM(c_a) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
           SUM(c_b) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
           SUM(c_a) OVER () AS n_a,
           SUM(c_b) OVER () AS n_b
    FROM j
),
d AS (SELECT *, ABS(cum_a * n_b - cum_b * n_a) AS diff FROM s)
-- degenerate arms mirror operators/corpus.py ks_drift exactly (ADVICE
-- r10): both cohorts empty -> ks 0 (d has no rows; MAX/COUNT must not
-- surface NULL/0-division), exactly one empty -> ks 1e6 (total drift,
-- where the cross-multiplied ratio would divide by n*0)
SELECT CAST(COALESCE(MAX(n_a), 0) AS BIGINT) AS n_a,
       CAST(COALESCE(MAX(n_b), 0) AS BIGINT) AS n_b,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       CAST(CASE
            WHEN COALESCE(MAX(n_a), 0) = 0 AND COALESCE(MAX(n_b), 0) = 0
                 THEN 0
            WHEN COALESCE(MAX(n_a), 0) = 0 OR COALESCE(MAX(n_b), 0) = 0
                 THEN 1000000
            ELSE (MAX(diff) * 1000000) // (MAX(n_a) * MAX(n_b))
            END AS BIGINT) AS ks_e6,
       CAST(MIN(CASE WHEN diff = (SELECT MAX(diff) FROM d) THEN v END)
            AS BIGINT) AS ks_at_value
FROM d
"""


register(
    "events_value_ks_drift", q_events_value_ks_drift,
    ORACLE_EVENTS_VALUE_KS_DRIFT,
)


def q_events_windowed_value_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-window value quantiles from the mergeable HDR sketch
    (streaming/windows.windowed_hdr_sketch + retrieval.hdr_quantiles):
    hourly p50/p90/p99/max of the event value in integer cents — the
    quantile-drift monitor a stream can actually maintain (bucket
    counts are an incrementally-mergeable aggregation state;
    percentile_approx per open window is not). The SAME rollup runs as
    a real Structured Streaming query in
    test_windowed_hdr_sketch_streaming_matches_batch. Cents via
    round(value*100) — both engines round the near-integer double to
    the same BIGINT (a bare CAST would truncate on Spark and round on
    DuckDB)."""
    from ..operators.retrieval import hdr_quantiles
    from ..streaming.windows import windowed_hdr_sketch

    from .extensions import _events

    ev = _events(spark, sf_dir).withColumn(
        "vc", F.round(F.col("value") * 100).cast("long")
    )
    sk = windowed_hdr_sketch(ev, "ts", "vc", "1 hour")
    out = hdr_quantiles(sk, ["window_start"], [0.5, 0.9, 0.99, 1.0])
    return out.select(
        F.unix_micros(F.col("window_start")).alias("window_start_us"),
        "q_e6",
        "value_low",
        F.col("n").cast("long").alias("n"),
    ).orderBy("window_start_us", "q_e6")


ORACLE_EVENTS_WINDOWED_VALUE_QUANTILES = """
WITH v AS (
    SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS ws,
           CAST(round(value * 100) AS BIGINT) AS vc
    FROM events WHERE value IS NOT NULL
),
b AS (
    SELECT ws,
           CASE WHEN vc < 32 THEN vc
                ELSE (length(bin(vc)) - 5) * 16 + (vc >> (length(bin(vc)) - 5))
           END AS bucket
    FROM v
),
sk AS (SELECT ws, bucket, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
cum AS (
    SELECT ws, bucket,
           SUM(cnt) OVER (PARTITION BY ws ORDER BY bucket) AS cum,
           SUM(cnt) OVER (PARTITION BY ws) AS n
    FROM sk
),
qs AS (SELECT * FROM (VALUES (500000), (900000), (990000), (1000000)) t(q_e6)),
hit AS (
    SELECT ws, q_e6, MIN(bucket) AS bucket, MAX(n) AS n
    FROM cum CROSS JOIN qs
    WHERE cum >= (q_e6 * n + 999999) // 1000000
    GROUP BY 1, 2
)
SELECT ws AS window_start_us, CAST(q_e6 AS BIGINT) AS q_e6,
       CAST(CASE WHEN bucket < 32 THEN bucket
            ELSE ((bucket % 16) + 16) * (1::BIGINT << (bucket // 16 - 1))
            END AS BIGINT) AS value_low,
       CAST(n AS BIGINT) AS n
FROM hit ORDER BY 1, 2
"""


register(
    "events_windowed_value_quantiles", q_events_windowed_value_quantiles,
    ORACLE_EVENTS_WINDOWED_VALUE_QUANTILES,
)


def q_rel_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measure-before-you-salt diagnostic (operators/joins.
    key_skew_profile): heaviest event_type values with absolute and
    cumulative corpus share in e6 fixed-point — the table that decides
    between plain AQE, `salted_join`, or special-casing a degenerate
    hot key. ONE map-side-combined count + TakeOrdered top-k; the
    cumulative window runs over top_k rows only."""
    from ..operators.joins import key_skew_profile

    ev = read_table(spark, sf_dir, "events")
    return key_skew_profile(ev, "event_type", top_k=5)


ORACLE_REL_KEY_SKEW_PROFILE = """
WITH c AS (
    SELECT CAST(event_type AS VARCHAR) AS key, COUNT(*) AS n
    FROM events GROUP BY 1
),
t AS (SELECT SUM(n) AS n_total, COUNT(*) AS n_distinct FROM c),
top AS (SELECT key, n FROM c ORDER BY n DESC, key ASC NULLS FIRST LIMIT 5),
r AS (
    SELECT ROW_NUMBER() OVER (ORDER BY n DESC, key ASC NULLS FIRST) AS rank,
           key, n,
           SUM(n) OVER (ORDER BY n DESC, key ASC NULLS FIRST
                        ROWS UNBOUNDED PRECEDING) AS cum_n
    FROM top
)
SELECT CAST(rank AS BIGINT) AS rank, key, n,
       CAST(t.n_total AS BIGINT) AS n_total,
       CAST(t.n_distinct AS BIGINT) AS n_distinct,
       CAST(n * 1000000 // t.n_total AS BIGINT) AS frac_e6,
       CAST(cum_n * 1000000 // t.n_total AS BIGINT) AS cum_frac_e6
FROM r CROSS JOIN t
"""


register(
    "rel_key_skew_profile", q_rel_key_skew_profile,
    ORACLE_REL_KEY_SKEW_PROFILE,
)


def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level corpus snapshot diff (operators/corpus.
    corpus_snapshot_diff): snapshot OLD = documents minus every 10th id;
    snapshot NEW = documents minus every 7th id, with every 3rd id's
    text edited (' v2' appended — inside [a-z0-9 ], so it registers as
    'changed' through the canonical fingerprint). Output: one row per
    id in either snapshot with status + both fingerprints, plus the
    4-row summary exercised by the same oracle via its own gate. Scale:
    two zero-shuffle fingerprint maps + one full-outer join on
    (id, 36-byte fp)."""
    from ..operators.corpus import corpus_snapshot_diff

    docs = read_table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 10 != 0).select("doc_id", "text")
    new = docs.where(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    return corpus_snapshot_diff(old, new).orderBy("doc_id")


ORACLE_CORPUS_SNAPSHOT_DIFF = f"""
WITH o AS (
    SELECT doc_id, md5({_D_NORM_A.format(t='text')}) AS fp_old
    FROM documents WHERE doc_id % 10 <> 0
),
n AS (
    SELECT doc_id,
           md5({_D_NORM_A.format(t="CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END")}) AS fp_new
    FROM documents WHERE doc_id % 7 <> 0
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN fp_old IS NULL THEN 'added'
            WHEN fp_new IS NULL THEN 'removed'
            WHEN fp_old = fp_new THEN 'unchanged'
            ELSE 'changed' END AS status,
       fp_old, fp_new
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
ORDER BY 1
"""


register(
    "corpus_snapshot_diff", q_corpus_snapshot_diff,
    ORACLE_CORPUS_SNAPSHOT_DIFF,
)
