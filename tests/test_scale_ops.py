"""Round-6 scale operators: bucketized interval join (operators/temporal.
interval_join) and distributed PCA (operators/decomp).

interval_join is exact — every test compares against the naive theta-join
formulation row-for-row. PCA is floating-point — parity vs a
single-threaded numpy reference is at tolerance, plus the model
properties (orthonormality, variance ordering, deterministic sign) that
hold regardless of summation order.
"""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bambooanalysis_spark.operators.decomp import pca_fit, pca_project
from bambooanalysis_spark.operators.temporal import interval_join


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60, second, micro)


@pytest.fixture(scope="module")
def ev_iv(spark):
    events = spark.createDataFrame(
        [Row(eid=i, k=i % 2, ts=_ts(i)) for i in range(0, 180, 3)]
    )
    intervals = spark.createDataFrame(
        [
            Row(iid=1, k=0, lo=_ts(10), hi=_ts(40)),   # spans a 30-min bucket edge
            Row(iid=2, k=1, lo=_ts(30), hi=_ts(30)),   # degenerate: empty
            Row(iid=3, k=0, lo=_ts(60), hi=_ts(90)),   # exactly one bucket
            Row(iid=4, k=1, lo=_ts(100), hi=_ts(130)),
            Row(iid=5, k=0, lo=_ts(170), hi=_ts(200)), # runs past the data
        ]
    )
    return events, intervals


def _naive(events, intervals, with_key=False):
    cond = (events["ts"] >= intervals["lo"]) & (events["ts"] < intervals["hi"])
    if with_key:
        cond = cond & (events["k"] == intervals["k"])
    out = events.join(intervals, cond, "inner").drop(intervals["k"])
    return {tuple(r) for r in out.select("eid", "iid").collect()}


def test_interval_join_matches_naive_theta_join(spark, ev_iv):
    events, intervals = ev_iv
    got = interval_join(events, intervals, bucket="30 minutes")
    assert {tuple(r) for r in got.select("eid", "iid").collect()} == _naive(
        events, intervals
    )


def test_interval_join_with_equi_keys(spark, ev_iv):
    events, intervals = ev_iv
    got = interval_join(events, intervals, bucket="30 minutes", keys=["k"])
    assert {tuple(r) for r in got.select("eid", "iid").collect()} == _naive(
        events, intervals, with_key=True
    )


def test_interval_join_boundary_semantics(spark):
    """lo inclusive, hi exclusive — including an event exactly at a bucket
    edge and a microsecond shy of hi."""
    events = spark.createDataFrame(
        [
            Row(eid=1, ts=_ts(10)),                  # == lo -> in
            Row(eid=2, ts=_ts(40)),                  # == hi -> out
            Row(eid=3, ts=_ts(39, 59, 999999)),      # hi - 1us -> in
            Row(eid=4, ts=_ts(30)),                  # bucket edge inside -> in
            Row(eid=5, ts=_ts(9, 59, 999999)),       # lo - 1us -> out
        ]
    )
    intervals = spark.createDataFrame([Row(iid=1, lo=_ts(10), hi=_ts(40))])
    got = sorted(
        r["eid"]
        for r in interval_join(events, intervals, bucket="30 minutes").collect()
    )
    assert got == [1, 3, 4]


def test_interval_join_left_events_keeps_unmatched(spark, ev_iv):
    events, intervals = ev_iv
    out = interval_join(events, intervals, bucket="30 minutes", how="left_events")
    matched = _naive(events, intervals)
    matched_eids = {e for e, _ in matched}
    rows = out.collect()
    # every match present, every unmatched event present once with NULL iid
    assert {(r["eid"], r["iid"]) for r in rows if r["iid"] is not None} == matched
    unmatched = [r for r in rows if r["iid"] is None]
    assert {r["eid"] for r in unmatched} == {
        r["eid"] for r in events.collect()
    } - matched_eids


def test_interval_join_rejects_bad_how(spark, ev_iv):
    events, intervals = ev_iv
    with pytest.raises(ValueError, match="left_events"):
        interval_join(events, intervals, how="outer")


def test_interval_join_validates_bucket_vs_longest_interval(spark, ev_iv):
    """A bucket narrower than the longest interval multiplies explode
    fan-out, so the default validate=True raises loudly (r6 ADVICE: no
    surprising defaults). With validate=False the result is still EXACT
    — intervals explode to every overlapped bucket, so narrow buckets
    cost fan-out, never rows (this assert is the proof the r6 docstring's
    'silently lost' claim was stale)."""
    events, intervals = ev_iv  # longest interval is 30 minutes
    with pytest.raises(ValueError, match="narrower than the longest"):
        interval_join(events, intervals, bucket="10 minutes").collect()
    narrow = {
        tuple(r)
        for r in interval_join(
            events, intervals, bucket="10 minutes", validate=False
        )
        .select("eid", "iid")
        .collect()
    }
    assert narrow == _naive(events, intervals)


def test_interval_join_streaming_interval_side_requires_opt_out(spark, tmp_path):
    """A streaming interval side cannot be eagerly aggregated, so
    validate=True must fail loudly rather than skip the check."""
    events = spark.createDataFrame([Row(eid=1, ts=_ts(5))])
    path = str(tmp_path / "iv")
    spark.createDataFrame(
        [Row(iid=1, lo=_ts(0), hi=_ts(10))]
    ).write.parquet(path)
    stream_iv = spark.readStream.schema(
        "iid long, lo timestamp, hi timestamp"
    ).parquet(path)
    with pytest.raises(ValueError, match="streaming interval side"):
        interval_join(events, stream_iv, bucket="30 minutes")


def test_interval_join_plan_is_equi_join_not_nested_loop(spark, ev_iv):
    """The whole point: the naive theta formulation plans as
    BroadcastNestedLoopJoin (and would be a driver OOM past the broadcast
    limit); the bucketized rewrite plans as a hash-partitionable equi-join."""
    events, intervals = ev_iv
    naive = events.join(
        intervals,
        (events["ts"] >= intervals["lo"]) & (events["ts"] < intervals["hi"]),
    )
    naive_plan = _plan(naive)
    # no stats -> CartesianProduct; a broadcastable side -> BNLJ. Either
    # way: every event row tested against every interval row.
    assert ("BroadcastNestedLoopJoin" in naive_plan) or (
        "CartesianProduct" in naive_plan
    )

    plan = _plan(interval_join(events, intervals, bucket="30 minutes"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_interval_join_oracle_query_matches_duckdb(spark, sf_oracle):
    """The registered contract query vs its DuckDB oracle at sf0.01 —
    same check the driver gate runs (also exercised by
    test_contract_oracle.py's sweep; kept here as the operator's own
    named gate)."""
    import duckdb

    from bambooanalysis_spark.contract.scale import (
        ORACLE_EVENTS_INTERVAL_JOIN,
        q_events_interval_join,
    )

    got = {
        tuple(r)
        for r in q_events_interval_join(spark, sf_oracle)
        .select("incident_id", "n_events", "n_users", "n_purchases", "min_event_id")
        .collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{sf_oracle}/events.parquet'"
    )
    want = {tuple(r) for r in con.sql(ORACLE_EVENTS_INTERVAL_JOIN).fetchall()}
    assert got == want and len(got) > 0


# --- PCA ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def emb(spark, sf_oracle):
    return spark.read.parquet(f"{sf_oracle}/embeddings.parquet")


def _numpy_pca(mat, k):
    mean = mat.mean(axis=0)
    cov = np.cov(mat, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def test_pca_fit_matches_numpy_reference(spark, emb):
    mat = np.stack(
        [np.array(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )
    model = pca_fit(emb, vec_col="embedding", k=8)
    mean, comps, evals = _numpy_pca(mat, 8)
    assert model.n == mat.shape[0]
    np.testing.assert_allclose(model.mean, mean, rtol=0, atol=1e-9)
    np.testing.assert_allclose(model.explained_var, evals, rtol=1e-8, atol=1e-10)
    # eigenvectors: compare up to the documented sign convention; require
    # well-separated eigenvalues for a stable comparison (holds on this
    # fixture) and a loose tolerance for summation-order effects
    np.testing.assert_allclose(model.components, comps, rtol=0, atol=1e-6)


def test_pca_model_properties(spark, emb):
    model = pca_fit(emb, vec_col="embedding", k=8)
    # orthonormal rows
    np.testing.assert_allclose(
        model.components @ model.components.T, np.eye(8), rtol=0, atol=1e-9
    )
    # descending non-negative variance, ratio in (0, 1]
    assert np.all(np.diff(model.explained_var) <= 1e-12)
    assert np.all(model.explained_var >= 0)
    assert 0 < model.explained_ratio.sum() <= 1 + 1e-12
    # deterministic sign: per row, the largest-|loading| coord is positive
    for row in model.components:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_pca_project_matches_numpy(spark, emb):
    rows = emb.collect()
    mat = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
    model = pca_fit(emb, vec_col="embedding", k=4)
    got = {
        r["vec_id"]: np.array(r["pc"])
        for r in pca_project(emb, model, out_col="pc").select("vec_id", "pc").collect()
    }
    want = (mat - model.mean) @ model.components.T
    for i, r in enumerate(rows):
        np.testing.assert_allclose(got[r["vec_id"]], want[i], rtol=0, atol=1e-9)
    # projecting the mean vector itself gives ~0 in every component
    one = spark.createDataFrame(
        [Row(vec_id=-1, embedding=[float(x) for x in model.mean])]
    )
    z = pca_project(one, model, out_col="pc").collect()[0]["pc"]
    np.testing.assert_allclose(z, np.zeros(4), rtol=0, atol=1e-9)


def test_pca_fit_input_validation(spark, emb):
    with pytest.raises(ValueError, match="empty"):
        pca_fit(emb.limit(0), vec_col="embedding")
    with pytest.raises(ValueError, match=">= 2"):
        pca_fit(emb.limit(1), vec_col="embedding")


def test_pca_moments_leave_scan_bounded(spark, emb):
    """The partial-moments stage must emit O(#partitions) rows, not
    O(#rows): the mapInPandas output schema is the 3-column partial row
    and the reduce is a cell-keyed groupBy — assert the plan carries the
    partial schema (n, s, g) into an aggregate, with no collect of the
    raw vectors."""
    from bambooanalysis_spark.operators.decomp import _PARTIAL_SCHEMA, _moments

    n, s, g = _moments(emb.repartition(7), "embedding")
    assert n == emb.count()
    assert s.shape == (64,) and g.shape == (64, 64)
    assert set(_PARTIAL_SCHEMA.fieldNames()) == {"n", "s", "g"}


def test_streaming_interval_join_matches_batch(spark, ev_iv, tmp_path):
    """Stream-static containment join: the bucketized rewrite is a
    stateless equi-join + filter, so it runs unchanged on a streaming
    events feed against static intervals (append mode, no watermark
    needed) — the live incident-attribution shape. Row set equals the
    batch run."""
    events, intervals = ev_iv
    expect = {
        tuple(r)
        for r in interval_join(events, intervals, bucket="30 minutes")
        .select("eid", "iid")
        .collect()
    }
    src = str(tmp_path / "ev_stream")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = interval_join(stream, intervals, bucket="30 minutes").select("eid", "iid")
    q = (
        out.writeStream.format("memory")
        .queryName("interval_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM interval_stream").collect()}
    assert got == expect and got


def test_pca_save_load_roundtrip(spark, emb, tmp_path):
    """Persisted-model serving: parquet round-trip reproduces the fitted
    model bit-exactly (doubles survive parquet), so serving-side
    projections equal fit-side projections exactly."""
    from bambooanalysis_spark.operators.decomp import pca_load, pca_save

    model = pca_fit(emb, vec_col="embedding", k=6)
    pca_save(spark, model, str(tmp_path / "pca_model"))
    loaded = pca_load(spark, str(tmp_path / "pca_model"))
    assert loaded.n == model.n and loaded.total_var == model.total_var
    np.testing.assert_array_equal(loaded.mean, model.mean)
    np.testing.assert_array_equal(loaded.components, model.components)
    np.testing.assert_array_equal(loaded.explained_var, model.explained_var)
    a = pca_project(emb, model).select("vec_id", "pc").collect()
    b = pca_project(emb, loaded).select("vec_id", "pc").collect()
    assert {(r["vec_id"], tuple(r["pc"])) for r in a} == {
        (r["vec_id"], tuple(r["pc"])) for r in b
    }


# --- JL signed projection ----------------------------------------------------


def test_signed_projection_matches_python_reference(spark, emb):
    """Integer-exact: Spark output equals a plain-Python requantize+project
    to the last bit (same floor(+0.5) quantization, same sha256 signs)."""
    from bambooanalysis_spark.operators.decomp import (
        jl_sign_matrix,
        signed_projection,
    )

    signs = jl_sign_matrix(8, 64)
    got = {
        r["vec_id"]: tuple(r[f"rp{i}"] for i in range(8))
        for r in signed_projection(emb, out_dim=8, in_dim=64).collect()
    }
    import math

    for r in emb.collect():
        v = [float(x) for x in r["embedding"]]
        ma = max(abs(x) for x in v)
        q = [0] * 64 if ma == 0 else [math.floor(x * 127.0 / ma + 0.5) for x in v]
        want = tuple(sum(s * c for s, c in zip(row, q)) for row in signs)
        assert got[r["vec_id"]] == want


def _quant(v):
    import math

    ma = max(abs(x) for x in v)
    return np.array(
        [0] * 64 if ma == 0 else [math.floor(x * 127.0 / ma + 0.5) for x in v],
        dtype=np.float64,
    )


def _pair_df(spark, emb, scales, n, seed):
    """Base fixture vectors paired with noise-perturbed copies at the
    given scales (relative to each vector's std). Gives the pair set a
    genuinely wide true-distance spread: the fixture's RANDOM pairs are
    near-equidistant (squared-distance cv ~0.22, measured), which no
    low-dim JL sketch can rank-order — r6's 0.42 correlation was a
    property of the pair set, not a sketch bug (PERFORMANCE.md §35)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i, r in enumerate(emb.limit(n).collect()):
        v = np.array([float(x) for x in r["embedding"]])
        w = v + rng.normal(0, scales[i % len(scales)] * v.std(), 64)
        rows.append((2 * i, [float(x) for x in v]))
        rows.append((2 * i + 1, [float(x) for x in w]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_signed_projection_preserves_distances(spark, emb):
    """JL sanity at out_dim=8 over 140 pairs spanning a wide distance
    ladder (perturbation scales 0.01..3x vector std): projected squared
    distances rank-correlate > 0.9 with the true quantized distances.
    Calibrated offline at 0.985; see _pair_df for why random fixture
    pairs are the wrong pair set for this property."""
    from bambooanalysis_spark.operators.decomp import signed_projection

    df = _pair_df(spark, emb, [0.01, 0.03, 0.08, 0.2, 0.5, 1.2, 3.0], 140, seed=7)
    base = {r["vec_id"]: r["embedding"] for r in df.collect()}
    proj = {
        r["vec_id"]: np.array([r[f"rp{i}"] for i in range(8)], dtype=np.float64)
        for r in signed_projection(df, out_dim=8, in_dim=64).collect()
    }
    orig, sk = [], []
    for i in range(140):
        a, b = 2 * i, 2 * i + 1
        orig.append(np.sum((_quant(base[a]) - _quant(base[b])) ** 2))
        # E[||Sx||^2] = out_dim * ||x||^2 for +-1 signs; normalize
        sk.append(np.sum((proj[a] - proj[b]) ** 2) / 8.0)
    orig, sk = np.array(orig), np.array(sk)
    ro = np.argsort(np.argsort(orig)).astype(float)
    rs = np.argsort(np.argsort(sk)).astype(float)
    corr = np.corrcoef(ro, rs)[0, 1]
    assert corr > 0.9, corr


def test_signed_projection_prefilter_separation(spark, emb):
    """The property that makes the 8-long sketch a usable near-dup /
    ANN prefilter: planted near-duplicates (0.3% noise) land orders of
    magnitude below random far pairs in sketch distance, so a threshold
    between them keeps every near-dup while discarding ~all far pairs.
    Calibrated offline: near max 22 vs far min 45618 (ratio ~2000x);
    asserted at 100x margin."""
    from bambooanalysis_spark.operators.decomp import signed_projection

    near_df = _pair_df(spark, emb, [0.003], 100, seed=11)
    proj = {
        r["vec_id"]: np.array([r[f"rp{i}"] for i in range(8)], dtype=np.float64)
        for r in signed_projection(near_df, out_dim=8, in_dim=64).collect()
    }
    near = np.array(
        [np.sum((proj[2 * i] - proj[2 * i + 1]) ** 2) / 8.0 for i in range(100)]
    )
    fixture_proj = [
        np.array([r[f"rp{i}"] for i in range(8)], dtype=np.float64)
        for r in signed_projection(emb.limit(200), out_dim=8, in_dim=64).collect()
    ]
    rng = np.random.default_rng(13)
    far = []
    for _ in range(500):
        a, b = rng.choice(len(fixture_proj), 2, replace=False)
        far.append(np.sum((fixture_proj[a] - fixture_proj[b]) ** 2) / 8.0)
    far = np.array(far)
    assert far.min() > 100 * max(near.max(), 1.0), (near.max(), far.min())


def test_signed_projection_plan_is_codegen_no_shuffle(spark, emb):
    from bambooanalysis_spark.operators.decomp import signed_projection

    plan = _plan(signed_projection(emb, out_dim=8, in_dim=64))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- KMV sketch --------------------------------------------------------------


def test_kmv_exact_when_not_full(spark):
    """m < k: the sketch IS the distinct hash set, and every estimate
    (counts, union, intersection, Jaccard) is exact."""
    from bambooanalysis_spark.operators.retrieval import (
        kmv_estimate,
        kmv_set_ops,
        kmv_sketch,
    )

    df = spark.createDataFrame(
        [Row(g="a", v=i % 40) for i in range(200)]
        + [Row(g="b", v=20 + (i % 40)) for i in range(200)]
    )
    sk = kmv_sketch(df, ["g"], "v", k=1024)
    est = {r["g"]: r["n_distinct_est"] for r in kmv_estimate(sk, k=1024).collect()}
    assert est == {"a": 40, "b": 40}
    a = sk.where(F.col("g") == "a").select(F.col("g").alias("ga"), "kmv", "m")
    b = sk.where(F.col("g") == "b").select(F.col("g").alias("gb"), "kmv", "m")
    out = kmv_set_ops(a, b, k=1024).collect()[0]
    assert out["n_a_est"] == 40 and out["n_b_est"] == 40
    assert out["n_union_est"] == 60  # 0..59
    assert out["n_intersect_est"] == 20  # 20..39
    assert out["jaccard_e6"] == round(20 / 60 * 1e6)


def test_kmv_error_bounds(spark):
    """Saturated sketches (ndv >> k): planted 20k/16k sets with 8k
    overlap, k=256 -> estimates within ~4/sqrt(k) (25%) relative error,
    Jaccard within 0.1 absolute. (Beyer et al. give ~1/sqrt(k-2) std
    error for the distinct estimator; the bound here is ~4 sigma.)"""
    from bambooanalysis_spark.operators.retrieval import kmv_set_ops, kmv_sketch

    k = 256
    a_df = spark.range(0, 20000).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    b_df = spark.range(12000, 28000).select(
        F.lit("b").alias("g"), F.col("id").alias("v")
    )
    sk = kmv_sketch(a_df.unionByName(b_df), ["g"], "v", k=k)
    a = sk.where(F.col("g") == "a").select(F.col("g").alias("ga"), "kmv", "m")
    b = sk.where(F.col("g") == "b").select(F.col("g").alias("gb"), "kmv", "m")
    out = kmv_set_ops(a, b, k=k).collect()[0]
    rel = 4.0 / (k ** 0.5)  # 0.25
    assert abs(out["n_a_est"] - 20000) <= 20000 * rel
    assert abs(out["n_b_est"] - 16000) <= 16000 * rel
    assert abs(out["n_union_est"] - 28000) <= 28000 * rel
    assert abs(out["n_intersect_est"] - 8000) <= 8000 * 2 * rel  # ratio est: 2 error terms
    true_j = 8000 / 28000
    assert abs(out["jaccard_e6"] / 1e6 - true_j) <= 0.1


def test_kmv_union_merge_property(spark):
    """Mergeability — the property that makes bottom-k sketches
    maintainable incrementally: bottom-k of (sketch(A) ∪ sketch(B))
    equals sketch(A ∪ B) computed directly from the raw data."""
    from bambooanalysis_spark.operators.retrieval import kmv_sketch

    k = 64
    a_df = spark.range(0, 5000).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    b_df = spark.range(3000, 9000).select(
        F.lit("b").alias("g"), F.col("id").alias("v")
    )
    parts = kmv_sketch(a_df.unionByName(b_df), ["g"], "v", k=k).collect()
    merged = sorted(set(parts[0]["kmv"]) | set(parts[1]["kmv"]))[:k]
    direct = kmv_sketch(
        a_df.unionByName(b_df).select(F.lit("u").alias("g"), "v"), ["g"], "v", k=k
    ).collect()[0]["kmv"]
    assert merged == list(direct)


# --- PCA-space IVF (round-7) -------------------------------------------------


def test_ivf_topk_pca_full_probe_equals_brute_force(spark, emb):
    """With n_probe == n_centroids every cell is probed, so the PCA
    coarse stage cannot lose candidates and the result must equal the
    exact brute-force cosine top-k — pinning that the full-dim rerank is
    exact and cell routing only ever affects WHICH cells are skipped."""
    import math

    from bambooanalysis_spark.operators.decomp import ivf_topk_pca

    corpus = emb.limit(300).select("vec_id", "embedding")
    queries = corpus.orderBy("vec_id").limit(20)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_e6"])
        for r in ivf_topk_pca(
            corpus, queries, k=5, n_centroids=4, n_probe=4, pca_dim=8,
            n_iter=1,
        ).collect()
    }
    vecs = {r["vec_id"]: list(r["embedding"]) for r in corpus.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    for qid in [r["vec_id"] for r in queries.collect()]:
        scored = sorted(
            (
                (math.floor(cos(vecs[qid], v) * 1000000), -oid)
                for oid, v in vecs.items()
                if oid != qid
            ),
            reverse=True,
        )
        for rank in range(1, 6):
            ce6, noid = scored[rank - 1]
            assert got[(qid, rank)] == (-noid, ce6), (qid, rank)


def test_ivf_topk_pca_routes_in_pca_space(spark, emb):
    """The probe plan must score pca_dim-wide centroid literals, not
    full-dim ones: with pca_dim=2 the assignment expression carries
    2-element centroid arrays (cheap per-row coarse stage — the point)."""
    from bambooanalysis_spark.operators.decomp import ivf_topk_pca, pca_fit

    corpus = emb.limit(200).select("vec_id", "embedding")
    model = pca_fit(corpus, k=2)
    out = ivf_topk_pca(
        corpus, corpus.limit(5), k=3, n_centroids=4, n_probe=2,
        pca_dim=2, model=model,
    )
    assert [f.name for f in out.schema.fields] == [
        "query_id", "rank", "neighbor_id", "cosine_e6",
    ]
    rows = out.collect()
    assert rows and all(1 <= r["rank"] <= 3 for r in rows)


def test_prototype_prune_drop_rule(spark, emb):
    """Per cell: exactly floor(frac * n / 100) vectors drop, they are
    precisely the TOP prototypicality ranks (1..dropped), and every
    vector appears exactly once — the D4 pruning contract."""
    from bambooanalysis_spark.operators.similarity import prototype_prune

    df = emb.limit(300).select("vec_id", "embedding")
    out = prototype_prune(df, k=4, n_iter=1, frac_e2=25).collect()
    assert len(out) == 300
    assert len({r["vec_id"] for r in out}) == 300
    by_cell: dict = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, rows in by_cell.items():
        n = len(rows)
        dropped = sorted(r["proto_rank"] for r in rows if r["kept_i"] == 0)
        want = [i for i in range(1, n + 1) if i * 100 <= 25 * n]
        assert dropped == want, (cell, n)
        assert sorted(r["proto_rank"] for r in rows) == list(range(1, n + 1))


# --- HDR histogram quantile sketch (operators/retrieval) --------------------

def _hdr_bucket_py(v: int, sub_bits: int = 4) -> int:
    """Independent pure-Python transcription of the HdrHistogram bucket
    scheme (exponential buckets, 2^sub_bits linear subdivision)."""
    S = 1 << sub_bits
    if v < 2 * S:
        return v
    e = v.bit_length() - 1
    b = e - sub_bits
    return b * S + (v >> b)


def _hdr_low_py(bucket: int, sub_bits: int = 4) -> int:
    S = 1 << sub_bits
    if bucket < 2 * S:
        return bucket
    b = (bucket >> sub_bits) - 1
    return ((bucket & (S - 1)) + S) << b


def test_hdr_bucket_matches_python_reference(spark):
    """Spark's integer-only bucket id equals the independent Python
    reference on the adversarial set (zero, exact powers of two +- 1 —
    where a floating log2 misbuckets — and LONG_MAX), is monotonic, and
    its inverse lower bound brackets every value within the advertised
    2^-sub_bits relative band."""
    from bambooanalysis_spark.operators.retrieval import hdr_bucket, hdr_bucket_low

    vals = sorted(
        {0, 1, 2, 15, 16, 17, 31, 32, 33, 255, 256, 257, 2**31 - 1, 2**31,
         2**31 + 1, 10**12, 2**62 - 1, 2**62, 2**63 - 1}
        | {2**e + d for e in range(4, 40, 3) for d in (-1, 0, 1)}
    )
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r["v"]: (r["bucket"], r["low"])
        for r in df.select(
            "v",
            hdr_bucket(F.col("v")).alias("bucket"),
            hdr_bucket_low(hdr_bucket(F.col("v"))).alias("low"),
        ).collect()
    }
    prev_bucket = -1
    for v in vals:
        bucket, low = got[v]
        assert bucket == _hdr_bucket_py(v), v
        assert low == _hdr_low_py(bucket), v
        assert low <= v <= low + max(low >> 4, 0), v  # relative band
        assert bucket >= prev_bucket  # monotonic in v
        prev_bucket = bucket


def test_hdr_bucket_negative_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException, SparkRuntimeException

    from bambooanalysis_spark.operators.retrieval import hdr_bucket

    df = spark.createDataFrame([(-3,)], "v long")
    try:
        df.select(hdr_bucket(F.col("v"))).collect()
        raise AssertionError("negative value must raise")
    except (Py4JJavaError, SparkRuntimeException, PythonException) as e:
        assert "negative value" in str(e)


def test_hdr_merge_equals_direct_sketch(spark):
    """Counts add: sketching two shards and merging is IDENTICAL to
    sketching the concatenation — the property that makes per-shard
    maintenance sound (exact, not approximate: bucketing is per-row)."""
    from bambooanalysis_spark.operators.retrieval import hdr_merge, hdr_sketch

    a = spark.range(0, 4000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 17 % 9973).alias("v"),
    )
    b = spark.range(4000, 7000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 17 % 9973).alias("v"),
    )
    merged = {
        (r["g"], r["bucket"]): r["cnt"]
        for r in hdr_merge(
            [hdr_sketch(a, ["g"], "v"), hdr_sketch(b, ["g"], "v")], ["g"]
        ).collect()
    }
    direct = {
        (r["g"], r["bucket"]): r["cnt"]
        for r in hdr_sketch(a.unionByName(b), ["g"], "v").collect()
    }
    assert merged == direct


def test_hdr_quantiles_error_bound(spark):
    """For every group and q, the reported value_low must bracket the
    EXACT ceil(q*n)-rank order statistic within the 2^-sub_bits relative
    band — checked against a driver-side sort of the same planted data
    (skewed lognormal-ish integer mix, plus ties and zeros)."""
    import random

    from bambooanalysis_spark.operators.retrieval import hdr_quantiles, hdr_sketch

    rng = random.Random(42)
    rows = []
    for g in ("x", "y"):
        for _ in range(5000):
            v = int(rng.expovariate(1.0 / 500)) if g == "x" else rng.randint(0, 30)
            rows.append((g, v))
    df = spark.createDataFrame(rows, "g string, v long")
    qs = [0.5, 0.9, 0.99, 1.0]
    out = {
        (r["g"], r["q_e6"]): (r["value_low"], r["n"])
        for r in hdr_quantiles(hdr_sketch(df, ["g"], "v"), ["g"], qs).collect()
    }
    by_g = {"x": sorted(v for g, v in rows if g == "x"),
            "y": sorted(v for g, v in rows if g == "y")}
    for g, vals in by_g.items():
        n = len(vals)
        for q in qs:
            q_e6 = int(round(q * 1_000_000))
            rank = (q_e6 * n + 999_999) // 1_000_000  # integer ceil-div
            exact = vals[rank - 1]
            low, n_out = out[(g, q_e6)]
            assert n_out == n
            assert low <= exact <= low + max(low >> 4, 0), (g, q, low, exact)


def test_hdr_sketch_weighted_quantiles(spark):
    """weight_col: bucket counts become weight sums — the quantile then
    brackets the exact WEIGHTED order statistic (token-grain quantiles).
    Checked against a driver-side expansion of each row weight times."""
    from bambooanalysis_spark.operators.retrieval import hdr_quantiles, hdr_sketch

    rows = [("g", v, wgt) for v, wgt in
            [(10, 1), (100, 5), (1000, 3), (40, 0), (7, 2), (None, 9), (55, None)]]
    df = spark.createDataFrame(rows, "g string, v long, wt long")
    sk = hdr_sketch(df, ["g"], "v", weight_col="wt")
    total = {r["bucket"]: r["cnt"] for r in sk.collect()}
    assert sum(total.values()) == 1 + 5 + 3 + 0 + 2  # NULL v / NULL wt skipped
    out = {r["q_e6"]: (r["value_low"], r["n"])
           for r in hdr_quantiles(sk, ["g"], [0.5, 1.0]).collect()}
    expanded = sorted([10] * 1 + [100] * 5 + [1000] * 3 + [7] * 2)
    n = len(expanded)
    for q_e6, (low, n_out) in out.items():
        assert n_out == n
        rank = (q_e6 * n + 999_999) // 1_000_000
        exact = expanded[rank - 1]
        assert low <= exact <= low + max(low >> 4, 0)


def test_key_skew_profile_planted(spark):
    """Planted skew with a NULL key and a tie: ranks, fracs and the
    cumulative share must match the hand computation; composite keys
    profile as their unit-separated concat."""
    from bambooanalysis_spark.operators.joins import key_skew_profile

    rows = (
        [("hot", 1)] * 60 + [("warm", 1)] * 25 + [("cool", 1)] * 10
        + [(None, 1)] * 10 + [("tie_a", 1)] * 5 + [("tie_b", 1)] * 5
    )
    df = spark.createDataFrame(rows, "k string, v int")
    out = key_skew_profile(df, "k", top_k=4).collect()
    assert [(r["rank"], r["key"], r["n"]) for r in out] == [
        (1, "hot", 60), (2, "warm", 25), (3, None, 10), (4, "cool", 10),
    ]
    total = 115
    assert all(r["n_total"] == total and r["n_distinct"] == 6 for r in out)
    assert out[0]["frac_e6"] == 60 * 1_000_000 // total
    assert out[-1]["cum_frac_e6"] == 105 * 1_000_000 // total

    comp = key_skew_profile(df.withColumn("k2", F.lit("x")), ["k", "k2"],
                            top_k=6).collect()
    assert comp[0]["key"] == "1hot\x1f1x" and comp[0]["n"] == 60
    # NULL components carry a flag instead of being dropped by concat_ws:
    # (NULL, 'x') must NOT merge with ('x', <dropped>) shapes
    assert ("0\x1f1x", 10) in [(r["key"], r["n"]) for r in comp]
