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
