"""Retrieval-stack operators for LLM data pipelines: RAG chunking, BM25
lexical search, reciprocal-rank fusion for hybrid (lexical + vector)
retrieval, and a count-min frequency sketch.

Spark-first shapes:

- ``chunk_documents`` is a pure per-row HOF projection + one ``posexplode``
  — zero shuffle; at 100 TB the chunk table inherits the source's
  partitioning and the fan-out factor is bounded by ceil(len/stride).
- ``bm25_topk`` is the classic postings formulation: corpus statistics
  (df, avgdl) are aggregate-sized; the scoring join is postings ⋈ query
  terms, which broadcasts the (tiny) query side, so the only shuffle is the
  final per-query top-k aggregation keyed on (query_id) — skew-free for
  realistic query loads because the heavy axis (documents) is the
  distributed one.
- ``cm_sketch`` produces a depth×width table: the groupBy count is
  map-side-combined down to at most depth*width rows per task before the
  single shuffle, independent of corpus size — the sketch is mergeable
  across partitions/days by summing counts, which is the whole point at
  100 TB (a 3×4096 sketch summarizes any stream in ~100 KB).
- ``cm_estimate`` broadcasts the sketch (bounded size) — no shuffle of the
  probe side.

Determinism: chunking and the count-min family are integer/md5-exact, so
DuckDB oracles replicate them bit-for-bit. BM25 scores are IEEE doubles
(ln required) — ordering is made deterministic by the (score DESC, doc_id)
tie-break, and correctness is gated by a numpy reference test instead of a
SQL-hash oracle (same policy as tf-idf).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _barrier, _fan_out
from .text import hash64, tokens


# --- RAG document chunking ---------------------------------------------------

def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into token-window chunks of ``size`` tokens
    starting every ``stride`` tokens (stride < size ⇒ overlapping chunks,
    the standard RAG indexing shape). Returns
    (id, chunk_id, chunk_start, n_chunk_tokens, chunk_text); empty
    documents produce no chunks; the last chunk may be shorter.

    Per-row HOF + posexplode only — no shuffle, no UDF. The token array is
    staged behind an optimization barrier (PERFORMANCE.md §1-2: HOF lambda
    bodies get no CSE, CollapseProject would re-inline the split).
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    staged = _barrier(df.withColumn("__toks", tokens(F.col(text_col))))
    n = F.size("__toks")
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.cast("long").alias("start"),
            F.concat_ws(" ", F.slice(F.col("__toks"), s + 1, size)).alias("ctext"),
            F.least(F.lit(size), n - s).cast("long").alias("ntok"),
        ),
    )
    return staged.select(
        id_col, F.posexplode(chunks).alias("chunk_id", "__c")
    ).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("__c.start").alias("chunk_start"),
        F.col("__c.ntok").alias("n_chunk_tokens"),
        F.col("__c.ctext").alias("chunk_text"),
    )


# --- count-min sketch --------------------------------------------------------

def _cm_bucket(key: Column, row: Column, width: int) -> Column:
    """Row-seeded md5 bucket in [0, width): the same family the DuckDB
    oracle reproduces exactly (('0x' || substr(md5(i||':'||key),1,15)))."""
    return F.pmod(hash64(F.concat(row.cast("string"), F.lit(":"), key)), F.lit(width))


def cm_sketch(
    df: DataFrame, key_col: str, depth: int = 3, width: int = 1024
) -> DataFrame:
    """Count-min sketch of the frequency of ``key_col`` values: a
    (d, bucket, c) table with at most depth×width rows. Each input row
    increments one bucket per hash row; partial aggregation collapses every
    task's contribution to ≤ depth×width rows before the single shuffle, so
    shuffle volume is independent of input size. Sketches over shards/days
    merge by summing `c` on (d, bucket) — see ``cm_merge``.
    """
    rows = F.array(*[F.lit(i) for i in range(depth)])
    return (
        df.select(F.col(key_col).alias("__k"))
        .select(F.explode(rows).alias("d"), "__k")
        .groupBy("d", _cm_bucket(F.col("__k"), F.col("d"), width).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with the same (depth, width): union +
    re-sum. The mergeability is what makes the sketch a 100 TB citizen —
    per-day/per-shard sketches combine without touching the raw data."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("c").alias("c"))


def cm_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int | None = None,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for each probe key: est(k) = min over hash
    rows of the bucket count (0 when a bucket is empty — only possible for
    keys never inserted). Guaranteed ≥ the true count. The sketch (≤
    depth×width rows) is broadcast; the probe side never shuffles.

    The hash rows to probe are derived FROM THE SKETCH (its distinct ``d``
    values), so the estimate depth can never exceed the build depth — a
    mismatched ``depth`` argument larger than the build's would otherwise
    probe rows that match nothing and silently return est=0 for inserted
    keys, violating the ≥-true-count guarantee. ``depth`` is retained for
    API compatibility and ignored. Persist/cache the sketch before
    estimating if it isn't already materialized — both the d-row derivation
    and the broadcast read it."""
    dvals = sketch.select("d").distinct()
    keys = probes.select(F.col(key_col).alias("__k")).distinct()
    probed = keys.crossJoin(F.broadcast(dvals)).withColumn(
        "bucket", _cm_bucket(F.col("__k"), F.col("d"), width)
    )
    est = (
        probed.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("__k")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
    # left-join back so an EMPTY sketch still yields est=0 for every probe
    # (the crossJoin above would otherwise drop all probe rows)
    return keys.join(est, "__k", "left").select(
        F.col("__k").alias(key_col),
        F.coalesce(F.col("est"), F.lit(0)).cast("long").alias("est"),
    )


# --- BM25 lexical retrieval --------------------------------------------------

def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 (Robertson/Spärck Jones, the Lucene `k1/b` variant) scores for
    every (query, doc) pair sharing ≥1 term:
    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Plan shape: one postings aggregation over the corpus (doc, term, tf —
    the shuffle is the inverted index build, map-side combined), corpus
    stats (N, avgdl) as a 1-row cross-joined aggregate, per-term df as a
    term-keyed aggregate JOINED onto postings, then a broadcast join with
    the (tiny) query-term table and a final (query, doc) sum.

    df deliberately comes from a join, NOT a count-over-term window: a
    window would reuse the term exchange but serializes each term into
    one task — on a Zipfian vocabulary the 'the' partition alone is a few
    percent of the corpus, and AQE can skew-split a JOIN but never a
    window (PERFORMANCE.md §17). The df aggregate's map-side combine
    collapses to vocab-sized rows before its shuffle, so the extra
    evaluation of the postings subplan shares its exchange via runtime
    reuse; the query side is broadcast so scoring adds no corpus shuffle.
    """
    toks = _fan_out(docs.select(id_col, text_col), id_col).select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("__toks")
    )
    staged = _barrier(toks)
    postings = (
        staged.select("doc", F.size("__toks").alias("dl"), F.explode("__toks").alias("term"))
        .groupBy("doc", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = staged.select(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.size("__toks")) / F.count(F.lit(1))).alias("avgdl"),
    )
    df_t = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = queries.select(
        F.col(query_id_col).alias("qid"), F.explode(tokens(F.col(query_text_col))).alias("term")
    ).distinct()
    scored = (
        postings.join(df_t, "term")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qterms), "term")
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (1.0 + k1))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return scored.groupBy("qid", "doc").agg(F.sum("contrib").alias("score")).select(
        F.col("qid").alias(query_id_col),
        F.col("doc").alias(id_col),
        "score",
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-k BM25 docs per query with a deterministic (score DESC, doc_id)
    tie-break. The rank window partitions by query — parallel across
    queries, and per-query cardinality is already bounded by the docs that
    share a query term."""
    id_col = kwargs.get("id_col", "doc_id")
    query_id_col = kwargs.get("query_id_col", "query_id")
    s = bm25_scores(docs, queries, **kwargs)
    w = Window.partitionBy(query_id_col).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        s.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", F.col("rank").cast("long").alias("rank"))
    )


# --- reciprocal-rank fusion (hybrid lexical + vector retrieval) --------------

def rrf_fuse(
    lexical: DataFrame,
    vector: DataFrame,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    k0: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.): fused(d) = Σ_lists
    floor(1e6/(k0+rank)). Takes two ranked lists with integer `rank`
    columns (1-based; e.g. ``bm25_topk`` and ``similarity.cosine_topk``),
    full-outer-joins them per (query, doc) — both inputs are top-k-sized,
    so this is join work proportional to the result lists, not the corpus —
    and emits the top-k by fused score with an (id) tie-break.

    Fixed-point e6 floor keeps the fused score integer-exact: rank-derived,
    so engines agree bit-for-bit even though the upstream scores were
    floats.
    """
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.floor(F.lit(1_000_000) / (F.lit(k0) + r)).cast("long"), F.lit(0).cast("long")
    )
    lx = lexical.select(
        F.col(query_id_col).alias("qid"), F.col(id_col).alias("doc"),
        F.col("rank").alias("__rl"),
    )
    vx = vector.select(
        F.col(query_id_col).alias("qid"), F.col(id_col).alias("doc"),
        F.col("rank").alias("__rv"),
    )
    fused = (
        lx.join(vx, ["qid", "doc"], "full_outer")
        .select(
            "qid",
            "doc",
            (contrib(F.col("__rl")) + contrib(F.col("__rv"))).alias("rrf_e6"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("rrf_e6").desc(), F.col("doc"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .where(F.col("fused_rank") <= k)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("doc").alias(id_col),
            "rrf_e6",
            F.col("fused_rank").cast("long").alias("fused_rank"),
        )
    )


# --- HLL sketch partials (mergeable distinct counts) -------------------------

def hll_partials(
    df: DataFrame, keys: Sequence[str], col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group HyperLogLog sketch partials (Apache DataSketches via
    Spark's `hll_sketch_agg`): the persistable building block for
    incremental distinct-count maintenance — per-day/shard partials merge
    with `hll_merge_estimate` without rescanning history, the piece a
    plain COUNT(DISTINCT) fundamentally can't give you at 100 TB (it is
    not decomposable; the sketch union is)."""
    return df.groupBy(*keys).agg(F.hll_sketch_agg(col, F.lit(lg_k)).alias("hll"))


def hll_merge_estimate(parts: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Union sketch partials on the group keys and estimate: returns
    keys + n_distinct_est (exact for cardinalities well under 2^lg_k)."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (
        out.groupBy(*keys)
        .agg(F.hll_union_agg("hll").alias("hll"))
        .withColumn("n_distinct_est", F.hll_sketch_estimate("hll").cast("long"))
        .drop("hll")
    )


# --- KMV sketch (k-minimum-values: distinct counts WITH set operations) ------

_KMV_TWO64 = float(2**64)


def kmv_sketch(
    df: DataFrame, keys: Sequence[str], col: str, k: int = 256
) -> DataFrame:
    """Per-group KMV (k-minimum-values / bottom-k) sketch over ``col``:
    the k smallest distinct xxhash64 values, as a sorted array. The
    sketch family that complements HLL: same mergeable distinct
    estimate, but bottom-k sketches additionally support INTERSECTION /
    Jaccard estimation (`kmv_set_ops`), which HLL fundamentally cannot
    (inclusion-exclusion on HLL estimates compounds error; the bottom-k
    of a union is computable from the bottom-k of the parts — Beyer et
    al., SIGMOD 2007).

    Output: keys + `kmv` (sorted array, len = min(k, ndv)) + `m`
    (that length — when m < k the sketch IS the exact distinct set).
    Plan: distinct on (keys, hash) — one shuffle with map-side combine —
    then a per-group bottom-k window riding the same hash partitioning.
    State is O(k) per group regardless of input size."""
    from pyspark.sql import Window

    dedup = df.select(*keys, F.xxhash64(F.col(col)).alias("__h")).distinct()
    w = Window.partitionBy(*keys).orderBy("__h")
    topk = dedup.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= k
    )
    return topk.groupBy(*keys).agg(
        F.sort_array(F.collect_list("__h")).alias("kmv"),
        F.count(F.lit(1)).alias("m"),
    )


def _kmv_estimate(kmv: Column, m: Column, k: int) -> Column:
    """Distinct estimate: exact m when the sketch isn't full; else the
    order-statistics estimator (k-1)/U(k) with U(k) = the k-th smallest
    hash mapped to (0,1) — signed long h -> (h + 2^63 + 1) / 2^64."""
    u_k = (
        F.element_at(kmv, k).cast("double") + F.lit(2.0**63) + F.lit(1.0)
    ) / F.lit(_KMV_TWO64)
    return F.when(m < k, m.cast("double")).otherwise(
        F.lit(float(k - 1)) / u_k
    )


def kmv_estimate(sketches: DataFrame, k: int = 256) -> DataFrame:
    """keys + n_distinct_est (long) from `kmv_sketch` output."""
    return sketches.withColumn(
        "n_distinct_est",
        F.round(_kmv_estimate(F.col("kmv"), F.col("m"), k)).cast("long"),
    ).drop("kmv")


def kmv_set_ops(
    a: DataFrame, b: DataFrame, k: int = 256, suffixes: tuple = ("_a", "_b")
) -> DataFrame:
    """Cross-join two single-row-per-group sketch frames (caller
    pre-filters/aliases the group columns to distinct names) and
    estimate, per pair: distinct counts of each side, their union,
    intersection, and Jaccard (e6 fixed-point).

    Union sketch = bottom-k of the merged arrays (exact — the defining
    KMV property). Intersection via the ratio estimator: the fraction of
    the union sketch's members present in BOTH input sketches, times the
    union estimate. Error ~ 1/sqrt(k) relative — gated by
    tests/test_scale_ops.py::test_kmv_error_bounds."""
    ka, kb = f"kmv{suffixes[0]}", f"kmv{suffixes[1]}"
    ma, mb = f"m{suffixes[0]}", f"m{suffixes[1]}"
    pair = a.select(
        *[F.col(c).alias(c + suffixes[0]) if c in ("kmv", "m") else F.col(c) for c in a.columns]
    ).crossJoin(
        b.select(
            *[F.col(c).alias(c + suffixes[1]) if c in ("kmv", "m") else F.col(c) for c in b.columns]
        )
    )
    union_full = F.array_sort(F.array_distinct(F.concat(F.col(ka), F.col(kb))))
    pair = pair.withColumn("__u", F.slice(union_full, 1, k)).withColumn(
        "__um", F.least(F.size(union_full), F.lit(k)).cast("long")
    )
    in_both = F.size(
        F.filter(
            F.col("__u"),
            lambda x: F.array_contains(F.col(ka), x)
            & F.array_contains(F.col(kb), x),
        )
    )
    est_u = _kmv_estimate(F.col("__u"), F.col("__um"), k)
    rho = in_both.cast("double") / F.size(F.col("__u")).cast("double")
    return (
        pair.withColumn("n_a_est", F.round(_kmv_estimate(F.col(ka), F.col(ma), k)).cast("long"))
        .withColumn("n_b_est", F.round(_kmv_estimate(F.col(kb), F.col(mb), k)).cast("long"))
        .withColumn("n_union_est", F.round(est_u).cast("long"))
        .withColumn("n_intersect_est", F.round(rho * est_u).cast("long"))
        .withColumn("jaccard_e6", F.round(rho * F.lit(1e6)).cast("long"))
        .drop(ka, kb, ma, mb, "__u", "__um")
    )


# --- HDR histogram (mergeable quantile sketch, bounded relative error) -------

def hdr_bucket(value: Column, sub_bits: int = 4) -> Column:
    """Monotonic HDR-histogram bucket id of a non-negative integer value
    (HdrHistogram's exponential-buckets-with-linear-subdivision scheme —
    the public design behind latency/length histograms that must merge
    across shards). Values below 2^(sub_bits+1) map to THEMSELVES (exact);
    above, each power-of-two decade splits into 2^sub_bits linear
    sub-buckets, so the relative width of any bucket is <= 2^-sub_bits.

    Everything is integer arithmetic (floor(log2(v)) via length(bin(v))-1,
    then shifts) — a floating log2 would misbucket exact powers of two on
    engines where log(8)/log(2) = 2.9999999999999996, and the DuckDB
    oracle replicates the bucket id bit-for-bit instead. Negative inputs
    raise in-plan (a silent drop would corrupt the sketch unnoticed);
    NULLs pass through as NULL for the caller's count to skip."""
    v = value.cast("long")
    S = 1 << sub_bits
    e = F.length(F.bin(v)) - F.lit(1)
    b = F.greatest(e - F.lit(sub_bits), F.lit(0))
    small = v < F.lit(2 * S)
    # call_function: the pyspark wrappers take only literal ints for the
    # shift amount; the SQL ShiftRight/ShiftLeft accept a column
    bucket = F.when(small, v).otherwise(
        b.cast("long") * F.lit(S)
        + F.call_function("shiftright", v, b.cast("int"))
    )
    return F.when(
        v < 0,
        F.raise_error(
            F.concat(F.lit("hdr_bucket: negative value "), v.cast("string"))
        ).cast("long"),
    ).otherwise(bucket)


def hdr_bucket_low(bucket: Column, sub_bits: int = 4) -> Column:
    """Inverse lower bound of a bucket id: the smallest value that maps
    into it (== the id itself for the exact small-value range). The true
    value behind any member is in [low, low * (1 + 2^-sub_bits))."""
    S = 1 << sub_bits
    b = F.shiftright(bucket.cast("long"), sub_bits).cast("int") - F.lit(1)
    sub = bucket.cast("long").bitwiseAND(F.lit(S - 1)) + F.lit(S)
    return F.when(bucket < F.lit(2 * S), bucket.cast("long")).otherwise(
        F.call_function("shiftleft", sub, b)
    )


def hdr_sketch(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    sub_bits: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-group HDR histogram sketch: keys + (bucket, cnt) rows. The
    quantile-sketch member of the mergeable-summaries family (HLL =
    distinct, KMV = set ops, count-min = frequency; this = quantiles):
    per-shard/day sketches merge by summing counts (`hdr_merge`) without
    rescanning history, which an exact percentile fundamentally cannot
    (rank is not decomposable; bucket counts are).

    Plan: one groupBy with map-side combine — each task emits at most
    (64 - sub_bits) * 2^sub_bits + 2^(sub_bits+1) rows per group
    (sub_bits=4: <= 992) regardless of input size. NULL values are
    skipped (cnt counts non-null rows only). ``weight_col`` makes cnt a
    weight SUM instead of a row count (integer weights — e.g. token
    counts, so quantiles answer "the doc length below which X% of
    TOKENS sit", the mixture-design grain); rows with NULL or ZERO
    weight are skipped (they contribute nothing — and dropping them
    means an all-zero-weight group emits NO buckets and so NO quantile
    rows, instead of a fabricated quantile over an empty distribution);
    negative weights raise in-plan, the same guard negative values get
    (a silent negative would subtract from bucket counts and skew every
    downstream quantile unnoticed)."""
    agg = (
        F.count(F.lit(1))
        if weight_col is None
        else F.sum(
            F.when(
                F.col(weight_col) < 0,
                F.raise_error(
                    F.concat(
                        F.lit("hdr_sketch: negative weight "),
                        F.col(weight_col).cast("string"),
                    )
                ).cast("long"),
            ).otherwise(F.col(weight_col).cast("long"))
        )
    )
    src = df
    if weight_col is not None:
        src = src.where(
            F.col(weight_col).isNotNull() & (F.col(weight_col) != 0)
        )
    return (
        src.select(
            *keys,
            hdr_bucket(F.col(col), sub_bits).alias("bucket"),
            *( [weight_col] if weight_col is not None else [] ),
        )
        .where(F.col("bucket").isNotNull())
        .groupBy(*keys, "bucket")
        .agg(agg.alias("cnt"))
    )


def hdr_merge(parts: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Union sketch partials on the group keys: counts add. The result is
    IDENTICAL to sketching the concatenated inputs (exactly — not just
    approximately — since bucketing is per-row), which is the property
    that makes per-shard maintenance sound."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy(*keys, "bucket").agg(F.sum("cnt").alias("cnt"))


def hdr_quantiles(
    sketch: DataFrame,
    keys: Sequence[str],
    qs: Sequence[float],
    sub_bits: int = 4,
) -> DataFrame:
    """Quantiles from a sketch: for each group and each q, the LOWER
    BOUND of the bucket holding the ceil(q*n)-th smallest value (the true
    quantile is within a 2^-sub_bits relative band above it — gated by
    tests/test_scale_ops.py). q rides as e6 fixed-point so the rank
    target ceil(q_e6 * n / 1e6) is integer-exact on both engines.

    Plan: the cumulative window runs over the BUCKET table (bounded per
    group — see hdr_sketch), never the data; the q list joins as a tiny
    broadcast. Output: keys + q_e6 + value_low + n."""
    spark = sketch.sparkSession
    qdf = spark.createDataFrame(
        [(int(round(q * 1_000_000)),) for q in qs], "q_e6 long"
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sketch.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(*keys))
    )
    # integer ceil-div: a double division here would misrank once q_e6*n
    # exceeds 2^53 (the r10-ADVICE KL-guard lesson); exact up to n ~ 9.2e12
    target = F.expr("(q_e6 * n + 999999) DIV 1000000")
    hit = cum.join(F.broadcast(qdf)).where(F.col("cum") >= target)
    best = hit.groupBy(*keys, "q_e6").agg(
        F.min("bucket").alias("bucket"), F.max("n").alias("n")
    )
    return best.select(
        *keys,
        "q_e6",
        hdr_bucket_low(F.col("bucket"), sub_bits).alias("value_low"),
        "n",
    )
