"""Physical-plan assertions: the optimizations we claim must be visible in
the executed plan (SURVEY.md §4.1 'built-in vs custom' table).

These tests would catch regressions like a filter silently not pushing to
parquet, a dimension join degrading to sort-merge, or the single-pass
histogrammer growing extra shuffles.
"""

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_column_pruning_pushdown(spark, sf_oracle):
    df = (
        spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
        .where(F.col("l_quantity") > 45.0)
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    # predicate reaches the scan (no IsNotNull: constraint propagation is
    # deliberately off, session.py)
    assert "PushedFilters: [GreaterThan(l_quantity,45.0)" in plan
    # scan reads only the two needed columns (plan string truncates the
    # schema; the opening of the struct is the informative part)
    assert "ReadSchema: struct<l_orderkey" in plan
    assert "l_shipdate" not in plan.split("ReadSchema")[1][:200]


def test_dimension_join_is_broadcast(spark, sf_oracle):
    from bambooanalysis_spark.contract.relational import q_revenue_by_nation

    plan = _plan(q_revenue_by_nation(spark, sf_oracle))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_histogrammer_single_shuffle(spark, sf_small):
    """The whole 61-plot analysis adds exactly ONE aggregation shuffle on
    top of the fixture build (SURVEY.md §4.2)."""
    from bambooanalysis_spark.analyses import define_phase2
    from bambooanalysis_spark.plans import run_analysis
    from bambooanalysis_spark.sources import build_hep_events

    hep = build_hep_events(spark, sf_small).cache()
    hep.count()
    df, plots, cfr, _ = define_phase2(hep)
    hist = run_analysis(df, plots, [cfr])
    hist.collect()  # execute so AQE finalizes and codegen markers appear
    plan = _plan(hist)
    assert "InMemoryTableScan" in plan  # reads the cached fixture
    # only count the plan ABOVE the cache scan: InMemoryTableScan prints
    # its (not re-executed) build plan below, which contains exchanges
    live = plan.split("InMemoryTableScan")[0]
    n_exchanges = live.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 shuffle, plan has {n_exchanges}"
    # '*(n)' prefixes mark whole-stage-codegen'd operators in final plans
    assert "*(" in live, "no whole-stage codegen span in the aggregation path"


def test_histogrammer_no_python_udfs(spark, sf_small):
    from bambooanalysis_spark.analyses import define_phase2
    from bambooanalysis_spark.plans import run_analysis
    from bambooanalysis_spark.sources import build_hep_events

    hep = build_hep_events(spark, sf_small)
    df, plots, cfr, _ = define_phase2(hep)
    plan = _plan(run_analysis(df, plots, [cfr]))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_minhash_stages_not_duplicated(spark, sf_oracle):
    """PERFORMANCE.md findings 1-3: one md5-bearing stage per pipeline
    step, no signature clone in the parquet scan's data filters."""
    from bambooanalysis_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    plan = _plan(D.minhash_lsh_pairs(docs, "doc_id", "text", k=16, bands=8, shingle_k=2))
    scan = plan[plan.index("FileScan") :]
    first_line = scan.split("\n")[0]
    assert "md5" not in first_line, "signature expression leaked into the scan filters"
    # barriers present: the staged projections are separated by Generates
    assert plan.count("Generate explode([0])") >= 2


def test_topk_orders_uses_takeordered_or_limit(spark, sf_oracle):
    from bambooanalysis_spark.contract.relational import q_top_orders

    plan = _plan(q_top_orders(spark, sf_oracle))
    assert ("TakeOrderedAndProject" in plan) or ("GlobalLimit" in plan)


def test_1d_analysis_carries_no_extra_bin_axes(spark, sf_small):
    """Codegen-width economy (PERFORMANCE.md: one extra struct field tipped
    the 61-plot projection into interpreted fallback): a 1D-only analysis
    must not carry bin2/bin3 through the explode — they are padded after
    aggregation."""
    from bambooanalysis_spark.analyses import define_phase2
    from bambooanalysis_spark.plans import run_analysis
    from bambooanalysis_spark.sources import build_hep_events

    hep = build_hep_events(spark, sf_small)
    df, plots, cfr, _ = define_phase2(hep)
    hist = run_analysis(df, plots, [cfr])
    plan = hist._jdf.queryExecution().executedPlan().toString()
    gen = plan[plan.index("Generate explode") :].split("\n")[0]
    assert "bin2" not in gen and "bin3" not in gen
    assert "bin2" in hist.columns and "bin3" in hist.columns  # padded after


def test_near_dup_default_has_no_cartesian_product(spark, sf_oracle):
    """The default embedding near-dup path must be LSH-bucketed: no
    all-pairs join node anywhere in the physical plan (the exact=True
    baseline is the only sanctioned cross join)."""
    from bambooanalysis_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    plan = _plan(S.near_dup_pairs_cosine(emb, threshold_e6=800000))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_similarity_broadcast_guard_fallback(spark, sf_oracle):
    """Oversized query sides must NOT be broadcast: with a lowered limit the
    bucket join falls back to a shuffled strategy, with identical results."""
    from bambooanalysis_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 50)

    # disable size-based auto-broadcast so only the guard's explicit hint
    # can force one (AQE correctly re-broadcasting a measured-small side is
    # fine in production; here we isolate the hint behavior)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        small = S.ann_lsh_topk(emb, queries, k=5, nplanes=6, broadcast_limit=10_000)
        big = S.ann_lsh_topk(emb, queries, k=5, nplanes=6, broadcast_limit=10)
        assert "BroadcastHashJoin" in _plan(small)
        assert "BroadcastHashJoin" not in _plan(big)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)

    as_set = lambda df: {
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine_e6"])
        for r in df.collect()
    }
    assert as_set(small) == as_set(big)


def test_ivf_candidate_join_is_hash_join(spark, sf_oracle):
    """IVF's probe-cell candidate join must be an equi (hash) join on the
    cell id — an array_contains theta-join plans as BroadcastNestedLoopJoin,
    which scans every query per corpus row and cannot shuffle-partition at
    scale."""
    from bambooanalysis_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    plan = _plan(S.ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=6))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan  # broadcast- or shuffled-hash on __ivf_cell


def test_fan_out_skips_wide_inputs(spark, sf_oracle):
    """_fan_out (VERDICT r2 'What's wrong' #1): the hot-path compute
    fan-out must be CONDITIONAL — a source that already has >= parallelism
    partitions gets NO extra Exchange (at 100 TB that repartition is a full
    extra shuffle of the corpus for zero benefit), while a narrow local
    input still fans out."""
    from bambooanalysis_spark.operators import similarity as S
    from bambooanalysis_spark.operators.dedup import _fan_out, token_postings

    parallelism = max(spark.sparkContext.defaultParallelism, 4)

    wide = spark.range(0, 1000).repartition(parallelism * 2)
    assert _fan_out(wide, "id") is wide  # identity: no new plan node at all

    narrow = spark.range(0, 1000).coalesce(1)
    assert _fan_out(narrow, "id").rdd.getNumPartitions() >= parallelism

    # end-to-end through the flagged operators: a pre-spread corpus adds no
    # hash exchange on the fan-out key
    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    emb_wide = emb.repartition(parallelism * 2)  # RoundRobin, not hash
    queries = emb.where(F.col("vec_id") < 5)
    plan = _plan(S.cosine_topk(emb_wide, queries, k=5))
    assert "hashpartitioning(vec_id" not in plan
    # narrow input: the fan-out exchange IS there
    plan_narrow = _plan(S.cosine_topk(emb.coalesce(1), queries, k=5))
    assert "hashpartitioning(vec_id" in plan_narrow

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    docs_wide = docs.repartition(parallelism * 2)
    plan = _plan(token_postings(docs_wide, "doc_id", "text"))
    assert "hashpartitioning(doc_id" not in plan


def test_fan_out_passes_streaming_frames_through(spark, tmp_path):
    """r11: _fan_out must be an identity on STREAMING DataFrames — the
    partition probe (.rdd) raises AnalysisException on a streaming plan,
    and a stream's parallelism belongs to its source. Regression for the
    streaming LM scorer, which feeds a doc stream through doc_bigrams
    (fanned out for batch inputs in the r11 optimization round)."""
    from bambooanalysis_spark.operators.dedup import _fan_out

    src = tmp_path / "stream_src"
    src.mkdir()
    spark.range(0, 10).selectExpr(
        "id AS doc_id", "CAST(id AS STRING) AS text"
    ).write.mode("overwrite").parquet(str(src))
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .parquet(str(src))
    )
    assert stream.isStreaming
    assert _fan_out(stream, "doc_id") is stream


def test_jaccard_frac_cutoff_builds_without_count_job(spark, sf_oracle, monkeypatch):
    """max_df_frac must be LAZY (VERDICT r2 'Next round' #5): building the
    jaccard plan must not run a df.count() action — the corpus total enters
    the plan as a broadcast 1-row aggregate. Oracle equivalence is pinned
    by test_contract_oracle[dedup_ngram_jaccard_pairs] (same fraction)."""
    from pyspark.sql import DataFrame

    from bambooanalysis_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")

    def _no_action(self):
        raise AssertionError("plan build ran an eager count() action")

    monkeypatch.setattr(DataFrame, "count", _no_action)
    pairs = D.jaccard_pairs(
        docs, "doc_id", "text", threshold_e4=6000, max_df_frac=0.9
    )
    monkeypatch.undo()
    assert pairs.count() >= 0  # executes fine after build


def test_broadcast_probe_memoized(spark, sf_oracle, monkeypatch):
    """_maybe_broadcast must not re-run its probe count for a semantically
    identical query side: second build of the same operator issues ZERO
    jobs for the guard (VERDICT r2 minor #3)."""
    from pyspark.sql import DataFrame

    from bambooanalysis_spark.operators import similarity as S

    def load():
        emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
        return emb, emb.where(F.col("vec_id") < 5)

    emb, queries = load()
    S.cosine_topk(emb, queries, k=5)  # first build: probe job runs

    def _no_action(self):
        raise AssertionError("broadcast guard re-ran its probe count")

    emb2, queries2 = load()  # fresh objects, same semantic plan
    monkeypatch.setattr(DataFrame, "count", _no_action)
    out = S.cosine_topk(emb2, queries2, k=5)  # must hit the probe cache
    monkeypatch.undo()
    assert out.count() > 0


def test_new_operator_plan_shapes(spark, sf_oracle):
    """Round-3 operators carry the plan shapes their docstrings claim:
    semantic_dedup's in-cell candidate join is a hash equi-join on the
    cell id (never a nested loop / cartesian), quantized IVF likewise,
    and hashed_bow is ZERO-shuffle (no Exchange at all)."""
    from bambooanalysis_spark.operators.similarity import (
        ivf_topk_quantized,
        semantic_dedup,
    )
    from bambooanalysis_spark.operators.text import hashed_bow

    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    plan = _plan(semantic_dedup(emb, k=4, n_iter=1, threshold_e6=300000))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan  # in-cell candidate join on `cell`

    queries = emb.where(F.col("vec_id") < 5)
    plan = _plan(ivf_topk_quantized(emb, queries, k=5, n_centroids=8, n_probe=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    plan = _plan(hashed_bow(docs, dim=16))
    assert "Exchange" not in plan  # pure per-row HOFs, zero shuffle


def test_runtime_bloom_filter_fires_on_shuffle_joins(spark, sf_oracle):
    """The 100 TB selective-join path leans on Spark's runtime bloom
    filter (spark.sql.optimizer.runtime.bloomFilter, on by default in the
    session): when the big side is above the application-side scan
    threshold and the join shuffles, Catalyst injects a bloom_filter_agg
    on the selective build side and a might_contain pre-filter on the
    probe side scan. Locally the thresholds are simulated (broadcast off,
    scan threshold zero) — at real scale the defaults (10 GiB application
    side) trigger on their own; this pins that the conf is live and the
    rewrite works end to end."""
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    )
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
        sel = spark.read.parquet(f"{sf_oracle}/orders.parquet").where(
            F.col("o_totalprice") > 400000
        )
        j = li.join(sel, li.l_orderkey == sel.o_orderkey)
        plan = _plan(j)
        assert "might_contain" in plan
        # and the rewrite preserves results vs the broadcast plan
        n_shuffle = j.count()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
    sel = spark.read.parquet(f"{sf_oracle}/orders.parquet").where(
        F.col("o_totalprice") > 400000
    )
    assert li.join(sel, li.l_orderkey == sel.o_orderkey).count() == n_shuffle > 0


def test_aqe_splits_planted_skew_join(spark):
    """The docstring claims that lean on 'AQE skew-join handles the hot
    key' (asof/sessionize salting residual, semantic_dedup mega-cell,
    LSH hot band) rest on spark.sql.adaptive.skewJoin being live: a
    planted 50k-rows-on-one-key join must show a skewed AQEShuffleRead in
    the FINAL adaptive plan (thresholds lowered to make local data
    register as skew) with unchanged results."""
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.coalescePartitions.enabled",
    )
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        left = spark.range(0, 60000).select(
            F.when(F.col("id") < 50000, 7).otherwise(F.col("id") % 100).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        n = len(j.collect())  # materialize THIS query execution
        final_plan = j._jdf.queryExecution().executedPlan().toString()
        assert n == 60000
        assert "AQEShuffleRead" in final_plan
        assert "skewed" in final_plan  # the hot partition was split
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_training_order_has_no_global_sort(spark, sf_oracle):
    """(shard, pos) addressing must be per-shard ROW_NUMBER — a range
    exchange (global sort) would serialize the final stage at 100 TB."""
    from bambooanalysis_spark.operators.sampling import training_order

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    plan = _plan(training_order(docs, "doc_id", seed=1, n_shards=64))
    assert "rangepartitioning" not in plan.lower()
    assert "hashpartitioning(shard" in plan


def test_weighted_sample_uses_takeordered(spark, sf_oracle):
    """A-ES top-k must plan as TakeOrdered (per-partition top-k + k-sized
    driver merge), never a full sort."""
    from bambooanalysis_spark.operators.sampling import weighted_sample

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet").select(
        "doc_id", F.col("n_chars").cast("double").alias("w")
    )
    plan = _plan(weighted_sample(docs, 100, "w"))
    assert "TakeOrderedAndProject" in plan


def test_bm25_broadcasts_query_terms(spark, sf_oracle):
    """The corpus side must never shuffle for scoring: the query-term table
    is broadcast; the only corpus exchanges are the postings/df
    aggregations and the final per-query top-k."""
    from bambooanalysis_spark.contract.approx import q_retrieval_bm25_topk

    plan = _plan(q_retrieval_bm25_topk(spark, sf_oracle))
    assert "BroadcastExchange" in plan


def test_pagerank_and_linkage_joins_are_hash_joins(spark, sf_oracle):
    """The new join-heavy operators must plan their big joins as hash/merge
    equi-joins — the only nested-loop nodes allowed are the broadcast
    1-row stat cross-joins (pagerank's n-per-iteration base term)."""
    from bambooanalysis_spark.contract.approx import (
        q_graph_pagerank,
        q_linkage_customer_match,
    )

    for q in (q_graph_pagerank, q_linkage_customer_match):
        plan = _plan(q(spark, sf_oracle))
        assert "CartesianProduct" not in plan, q.__name__
        nlj = plan.count("BroadcastNestedLoopJoin")
        if q is q_linkage_customer_match:
            assert nlj == 0, plan[:500]
        else:
            assert nlj <= 4  # 1-row totals: init + one per iteration


def test_jaccard_prefix_plan_is_hash_joins_only(spark, sf_oracle):
    """The default (prefix) jaccard strategy must plan every join as a
    hash/merge equi-join — the quadratic enumerate path is only reachable
    through the explicitly-gated bitset64 strategy, whose plan is allowed
    exactly one BroadcastNestedLoopJoin (the pair enumeration)."""
    from bambooanalysis_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    plan = _plan(
        D.jaccard_pairs(docs, "doc_id", "text", threshold_e4=6000, max_df=1000)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # with the lazy fractional cutoff the only sanctioned NLJ is the
    # broadcast 1-row corpus-total cross-joined onto the hot-token agg
    # (the plan STRING re-expands that subtree once per posting-list
    # reference, so count the distinct build plans, not occurrences)
    plan_f = _plan(
        D.jaccard_pairs(docs, "doc_id", "text", threshold_e4=6000, max_df_frac=0.9)
    )
    assert "CartesianProduct" not in plan_f
    for line in plan_f.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "BuildRight, Cross" in line and "__n_docs" in line

    plan_b = _plan(
        D.jaccard_pairs(
            docs, "doc_id", "text", threshold_e4=6000, strategy="bitset64"
        )
    )
    assert "CartesianProduct" not in plan_b
    assert plan_b.count("BroadcastNestedLoopJoin") == 1


def test_topk_windows_get_group_limit_pushdown(spark, sf_oracle):
    """Every rank<=k window in the ANN/retrieval/sampling family must get
    Spark's WindowGroupLimit pushdown (partial + final), so no group ever
    materializes its full ranked list — the property that makes windowed
    top-k viable on 100 TB groups."""
    from bambooanalysis_spark.contract import QUERIES

    for name in [
        "similarity_cosine_topk", "ann_ivf_topk", "retrieval_bm25_topk",
        "similarity_quantized_topk", "sampling_domain_cap",
    ]:
        plan = (
            QUERIES[name](spark, sf_oracle)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("WindowGroupLimit") >= 2, name


def test_tpch_shapes_round6(spark, sf_oracle):
    """Round-6 TPC-H-shape family: the plan properties each query's
    docstring claims must be visible in the executed plan."""
    from bambooanalysis_spark.contract import QUERIES

    # Q2 shape: window min-per-group, NOT a derived-frame self-join — the
    # lineitem scan must appear exactly once
    plan = _plan(QUERIES["rel_min_cost_supplier"](spark, sf_oracle))
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan and "SortMergeJoin" not in plan

    # Q18 shape: top-100 is TakeOrdered, never a global sort
    plan = _plan(QUERIES["rel_large_volume_customers"](spark, sf_oracle))
    assert "TakeOrderedAndProject" in plan

    # Q14 shape: part dimension broadcasts; the CASE and the total ride
    # ONE aggregate (no second scan of lineitem)
    plan = _plan(QUERIES["rel_promo_revenue"](spark, sf_oracle))
    assert "BroadcastHashJoin" in plan
    assert plan.count("lineitem.parquet") == 1

    # Q17 shape: per-part aggregate broadcast back into the join
    plan = _plan(QUERIES["rel_small_qty_revenue"](spark, sf_oracle))
    assert "BroadcastHashJoin" in plan

    # Q22 shape: date filter pushed into the orders scan feeding the
    # anti-join; scalar aggregate is a broadcast (1-row) join
    plan = _plan(QUERIES["rel_idle_rich_customers"](spark, sf_oracle))
    assert "PushedFilters: [GreaterThanOrEqual(o_orderdate" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_lm_scoring_plan_shape(spark, sf_oracle):
    """LM scoring (round-6): model tables broadcast at this scale, the
    vocab size is a 1-row broadcast, and nothing degrades to a sort-merge
    join or a data-sized cartesian."""
    from bambooanalysis_spark.contract import QUERIES

    plan = _plan(QUERIES["text_lm_quality"](spark, sf_oracle))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the only nested-loop join is the 1-row vocab-size broadcast
    assert plan.count("CartesianProduct") == 0


def test_tpch_q4_q16_plan_shapes(spark, sf_oracle):
    """Q4 EXISTS -> semi-join with both scans pre-filtered; Q16 NOT IN ->
    anti-join with the tiny excluded-supplier list broadcast."""
    from bambooanalysis_spark.contract import QUERIES

    plan = _plan(QUERIES["rel_priority_order_check"](spark, sf_oracle))
    assert "LeftSemi" in plan
    assert "PushedFilters: [EqualTo(l_returnflag,R)" in plan
    assert "PushedFilters: [GreaterThanOrEqual(o_orderdate" in plan

    plan = _plan(QUERIES["rel_supplier_part_counts"](spark, sf_oracle))
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan


def test_tpch_shapes_round7(spark, sf_oracle):
    """Round-7 TPC-H-shape family: the plan properties the docstrings
    claim, visible in the executed plan."""
    from bambooanalysis_spark.contract import QUERIES

    # Q6 shape: all three predicates reach the parquet scan; no join
    plan = _plan(QUERIES["rel_forecast_revenue"](spark, sf_oracle))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:400]
    assert "Join" not in plan

    # Q5 shape: dimensions broadcast, the fact chain is the only shuffle path
    plan = _plan(QUERIES["rel_local_supplier_volume"](spark, sf_oracle))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan

    # Q8 shape: two nation aliases resolve to two broadcast joins of the
    # same tiny table; the share division happens post-aggregate
    plan = _plan(QUERIES["rel_market_share"](spark, sf_oracle))
    assert plan.count("nation.parquet") == 2
    assert "BroadcastHashJoin" in plan

    # Q10 shape: top-20 is TakeOrdered, never a global sort
    plan = _plan(QUERIES["rel_returned_items"](spark, sf_oracle))
    assert "TakeOrderedAndProject" in plan

    # Q11 shape: the scalar total joins as a 1-row broadcast (nested-loop
    # on a single row is fine; a shuffled join would not be)
    plan = _plan(QUERIES["rel_important_stock"](spark, sf_oracle))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan

    # Q19 shape: the disjunction must not break the equi-join on partkey
    plan = _plan(QUERIES["rel_discounted_revenue"](spark, sf_oracle))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

    # Q21 shape: EXISTS/NOT EXISTS decorrelate to one semi and one anti
    # hash join on the order key; top-20 is TakeOrdered
    plan = _plan(QUERIES["rel_waiting_suppliers"](spark, sf_oracle))
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan


def test_jaccard_bitset64_stream_side_fans_out(spark, sf_oracle):
    """r11: AQE coalesces the tiny (doc, mask) aggregate to 1-2 partitions
    and localCheckpoint freezes that, so without an explicit fan-out the
    n^2/2 BNLJ pair enumeration — the entry's actual work — runs on 1-2
    cores (measured 17.2 s -> ~1.5 s at sf1 when spread). The BNLJ output
    inherits the stream side's partitioning, so pin it >= parallelism."""
    from bambooanalysis_spark.operators.dedup import jaccard_pairs

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    parallelism = max(spark.sparkContext.defaultParallelism, 4)
    out = jaccard_pairs(
        docs, "doc_id", "text", threshold_e4=6000, max_df_frac=0.9,
        strategy="bitset64",
    )
    assert out.rdd.getNumPartitions() >= parallelism
