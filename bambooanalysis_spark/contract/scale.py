"""Round-6 scale-path operators: bucketized interval (range-containment)
joins and distributed PCA over embeddings.

Registered AFTER the driver's 50-slot window (policy in contract/__init__):
`events_interval_join` carries an exact DuckDB oracle under the in-repo
gate; `embedding_pca_project` is rows-only by design (eigendecomposition
is not SQL-expressible) and is bounded by numpy-parity/property tests in
tests/test_scale_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import read_table, register


def q_events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incident-window attribution: every 50th error event opens a
    10-minute incident window; count the events, distinct users and
    purchases landing inside each window.

    The containment join runs through
    `operators.temporal.interval_join` — the bucketized range-join
    rewrite (bucket = the max window length, so each interval covers at
    most 2 buckets) that turns Spark's only native plan for `ts BETWEEN
    lo AND hi` (BroadcastNestedLoopJoin, O(n*m), driver-OOM once the
    interval side outgrows the broadcast limit) into a hash-partitionable
    equi-join on the bucket id. All aggregates are exact integers."""
    from ..operators.temporal import interval_join
    from .extensions import _events

    ev = _events(spark, sf_dir)  # NTZ/nanos-tolerant events read
    inc = ev.filter(
        (F.col("event_type") == "error") & (F.col("event_id") % 50 == 0)
    ).select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("hi"),
    )
    # validate=False: every interval is exactly `lo + 10 minutes` by
    # construction, and validation would re-scan the events table.
    joined = interval_join(
        ev, inc, ts_col="ts", bucket="10 minutes", validate=False
    )
    return joined.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("n_purchases"),
        F.min("event_id").alias("min_event_id"),
    )


ORACLE_EVENTS_INTERVAL_JOIN = """
WITH inc AS (
  SELECT event_id AS incident_id, ts AS lo, ts + INTERVAL 10 MINUTE AS hi
  FROM events
  WHERE event_type = 'error' AND event_id % 50 = 0
)
SELECT i.incident_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users,
       CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchases,
       MIN(e.event_id) AS min_event_id
FROM inc i JOIN events e ON e.ts >= i.lo AND e.ts < i.hi
GROUP BY 1
"""


def q_embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit an 8-component PCA on the embedding table (partial-moments
    tree-reduce + driver eigh, operators/decomp.py) and project every
    vector; emit the first two principal coordinates plus the model's
    explained-variance ratio as fixed columns. Rows-only: the driver
    checks row count + schema; numeric fidelity is pinned by the numpy
    parity/property tests."""
    from ..operators.decomp import pca_fit, pca_project

    emb = read_table(spark, sf_dir, "embeddings")
    model = pca_fit(emb, vec_col="embedding", k=8)
    out = pca_project(emb, model, vec_col="embedding", out_col="pc")
    ratio = model.explained_ratio
    return out.select(
        "vec_id",
        "label",
        F.element_at("pc", 1).alias("pc1"),
        F.element_at("pc", 2).alias("pc2"),
        F.lit(float(ratio[:2].sum())).alias("top2_var_ratio"),
    )


def q_embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sketch with an EXACT oracle: int8-quantize
    (the existing bit-reproducible op), then 8 signed integer
    projections from a sha256-derived ±1 matrix — the ANN/dedup
    prefilter that reads 8 longs instead of 64 floats per row. All
    integer math, whole-stage codegen, no shuffle."""
    from ..operators.decomp import signed_projection

    emb = read_table(spark, sf_dir, "embeddings")
    return signed_projection(emb, out_dim=8, in_dim=64)


def _oracle_random_projection() -> str:
    from ..operators.decomp import jl_sign_matrix

    from .extensions import _D_QUANT

    signs = jl_sign_matrix(8, 64)
    # CAST: DuckDB's list_aggregate(..., 'sum') returns HUGEINT, which
    # pandas renders as float64; Spark emits BIGINT. Same values, so pin
    # the oracle dtype to match (ADVICE r6).
    cols = ",\n       ".join(
        "CAST(list_aggregate(list_transform(range(1, 65), "
        f"j -> qvec[j] * ([{', '.join(str(s) for s in signs[i])}])[j]), 'sum') "
        f"AS BIGINT) AS rp{i}"
        for i in range(8)
    )
    return f"""
WITH q AS ({_D_QUANT})
SELECT vec_id, scale_e9,
       {cols}
FROM q
"""


def q_sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) sketch set operations: per-returnflag sketches of
    the ~10k-distinct l_orderkey sets, then pairwise union/intersection/
    Jaccard estimates — the mergeable-sketch capability HLL cannot
    provide (set intersection), at O(k) state per group. Deterministic
    (xxhash64 order statistics) but not SQL-expressible in DuckDB, so
    rows-only; error bounded by
    tests/test_scale_ops.py::test_kmv_error_bounds and the mergeability
    property by test_kmv_union_merge_property."""
    from ..operators.retrieval import kmv_set_ops, kmv_sketch

    li = read_table(spark, sf_dir, "lineitem")
    sk = kmv_sketch(li, ["l_returnflag"], "l_orderkey", k=256)
    a = sk.select(F.col("l_returnflag").alias("flag_a"), "kmv", "m")
    b = sk.select(F.col("l_returnflag").alias("flag_b"), "kmv", "m")
    return kmv_set_ops(a, b, k=256).where(F.col("flag_a") < F.col("flag_b"))


def q_embedding_pca_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with the coarse stage in PCA space (operators/decomp.
    ivf_topk_pca): centroid training, cell assignment and probe routing
    run on 8 PCA components instead of 64 dims (the per-row cost that
    dominates index builds at large codebooks — 2x measured at C=256,
    PERFORMANCE.md §36), candidates reranked with the exact full-dim
    cosine. Rows-only (eigendecomposition is not SQL-expressible);
    exactness of the rerank and the n_probe==n_centroids == brute-force
    equivalence are pinned in tests/test_scale_ops.py."""
    from ..operators.decomp import ivf_topk_pca

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(50)
    return ivf_topk_pca(
        emb, queries, k=10, n_centroids=16, n_probe=4, pca_dim=8, n_iter=2
    )




def q_embedding_prototype_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4-style prototypicality pruning (operators/similarity.
    prototype_prune): within each exact-integer k-means cell, the 20%
    most-centroid-similar vectors are dropped (the diversification pass
    that pairs with semantic dedup in modern pretraining pipelines).
    Fully oracle-checked despite the iterative fit — the oracle unrolls
    the same Lloyd's iterations and replays the same int-dot/sqrt score,
    rank and integer drop rule."""
    from ..operators.similarity import prototype_prune

    emb = read_table(spark, sf_dir, "embeddings")
    return prototype_prune(emb, k=8, n_iter=2, frac_e2=20)


def _oracle_prototype_prune() -> str:
    from .extensions import _KM_DIM, _KM_ITERS, _oracle_kmeans

    nn = "list_aggregate(list_transform(c.c, x -> x * x), 'sum')"
    score = (
        f"CAST(list_aggregate(list_transform(range(1, {_KM_DIM + 1}), "
        f"j -> v.qvec[j] * c.c[j]), 'sum') AS DOUBLE) / "
        f"(CASE WHEN {nn} = 0 THEN 1.0 ELSE sqrt(CAST({nn} AS DOUBLE)) END)"
    )
    final = f"""
SELECT vec_id, CAST(cell AS INT) AS cell, CAST(rn AS BIGINT) AS proto_rank,
       CAST(CASE WHEN rn * 100 <= 20 * cn THEN 0 ELSE 1 END AS BIGINT) AS kept_i
FROM (
  SELECT v.vec_id, a.cid AS cell,
         ROW_NUMBER() OVER (PARTITION BY a.cid
                            ORDER BY {score} DESC, v.vec_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY a.cid) AS cn
  FROM qz v
  JOIN afinal a USING (vec_id)
  JOIN c{_KM_ITERS} c ON a.cid = c.cid
)
"""
    return _oracle_kmeans(final=final)

def q_sketch_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch end-to-end (operators/retrieval.
    hdr_sketch/hdr_merge/hdr_quantiles — HdrHistogram's exponential
    buckets with 2^4 linear subdivisions): per-language document-length
    sketches built on two DISJOINT shards (doc_id parity), merged by
    summing bucket counts, then p50/p90/p99/max read off the merged
    sketch. The shard split exercises mergeability inside the oracle
    gate itself — the DuckDB oracle sketches the whole table in one
    pass, so any key mishandling in the merge breaks the hash match.
    Everything is integer arithmetic (floor(log2) via length(bin)), so
    the oracle is exact, not tolerance-based."""
    from ..operators.retrieval import hdr_merge, hdr_quantiles, hdr_sketch

    docs = read_table(spark, sf_dir, "documents")
    a = hdr_sketch(docs.where(F.col("doc_id") % 2 == 0), ["lang"], "n_chars")
    b = hdr_sketch(docs.where(F.col("doc_id") % 2 == 1), ["lang"], "n_chars")
    merged = hdr_merge([a, b], ["lang"])
    return hdr_quantiles(merged, ["lang"], [0.5, 0.9, 0.99, 1.0]).select(
        "lang", "q_e6", "value_low", F.col("n").cast("long").alias("n")
    )


ORACLE_SKETCH_HDR_QUANTILES = """
WITH v AS (
    SELECT lang,
           CASE WHEN n_chars < 32 THEN n_chars
                ELSE (length(bin(n_chars)) - 5) * 16
                     + (n_chars >> (length(bin(n_chars)) - 5))
           END AS bucket
    FROM documents WHERE n_chars IS NOT NULL
),
sk AS (SELECT lang, bucket, COUNT(*) AS cnt FROM v GROUP BY lang, bucket),
cum AS (
    SELECT lang, bucket,
           SUM(cnt) OVER (PARTITION BY lang ORDER BY bucket) AS cum,
           SUM(cnt) OVER (PARTITION BY lang) AS n
    FROM sk
),
qs AS (SELECT * FROM (VALUES (500000), (900000), (990000), (1000000)) t(q_e6)),
hit AS (
    SELECT lang, q_e6, MIN(bucket) AS bucket, MAX(n) AS n
    FROM cum CROSS JOIN qs
    WHERE cum >= (q_e6 * n + 999999) // 1000000
    GROUP BY lang, q_e6
)
SELECT lang, CAST(q_e6 AS BIGINT) AS q_e6,
       CAST(CASE WHEN bucket < 32 THEN bucket
            ELSE ((bucket % 16) + 16) * (1::BIGINT << (bucket // 16 - 1))
            END AS BIGINT) AS value_low,
       CAST(n AS BIGINT) AS n
FROM hit
"""


def _register() -> None:
    register(
        "events_interval_join", q_events_interval_join, ORACLE_EVENTS_INTERVAL_JOIN
    )
    register("embedding_pca_project", q_embedding_pca_project)
    register("embedding_pca_ivf_topk", q_embedding_pca_ivf_topk)
    register(
        "embedding_prototype_prune",
        q_embedding_prototype_prune,
        _oracle_prototype_prune(),
    )
    register(
        "embedding_random_projection",
        q_embedding_random_projection,
        _oracle_random_projection(),
    )
    register("sketch_kmv_set_ops", q_sketch_kmv_set_ops)
    register(
        "sketch_hdr_quantiles", q_sketch_hdr_quantiles,
        ORACLE_SKETCH_HDR_QUANTILES,
    )


_register()
