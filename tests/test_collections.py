"""Unit tests for the within-event collection operators (op.* analogs)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bambooanalysis_spark.operators import collections as op


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        Row(
            id=1,
            objs=[
                Row(pt=50.0, eta=1.0, phi=0.1, mass=1.0, q=1),
                Row(pt=30.0, eta=-2.0, phi=1.5, mass=2.0, q=-1),
                Row(pt=10.0, eta=3.0, phi=-2.0, mass=0.5, q=1),
            ],
            others=[Row(pt=40.0, eta=1.05, phi=0.12, mass=0.1, q=-1)],
        ),
        Row(id=2, objs=[], others=[]),
        Row(
            id=3,
            objs=[Row(pt=25.0, eta=0.0, phi=0.0, mass=1.0, q=-1)],
            others=[],
        ),
    ]
    return spark.createDataFrame(rows)


def _one(df, col, id_=1):
    return {r["id"]: r["v"] for r in df.select("id", col.alias("v")).collect()}[id_]


def test_select_and_len(events):
    coll = op.Collection(F.col("objs"))
    sel = op.select(coll, lambda o: o.pt > 20.0)
    got = _one(events, op.rng_len(sel))
    assert got == 2
    assert _one(events, op.rng_len(sel), id_=2) == 0


def test_indexing_0_based_and_null_oob(events):
    coll = op.Collection(F.col("objs"))
    assert _one(events, coll[0].pt) == 50.0
    assert _one(events, coll[2].pt) == 10.0
    assert _one(events, coll[1].pt, id_=3) is None  # out of range -> NULL


def test_rng_any_exists(events):
    objs = op.Collection(F.col("objs"))
    others = op.Collection(F.col("others"))
    near = op.rng_any(others, lambda o: o.pt > 35.0)
    assert _one(events, near) is True
    assert _one(events, near, id_=3) is False
    # cleaning shape: objs with no 'other' within deltaR < 0.3
    cleaned = op.select(
        objs, lambda a: ~op.rng_any(others, lambda b: op.deltaR(a.p4, b.p4) < 0.3)
    )
    assert _one(events, op.rng_len(cleaned)) == 2  # leading obj is matched
    assert _one(events, op.rng_len(cleaned), id_=3) == 1


def test_rng_aggregates(events):
    coll = op.Collection(F.col("objs"))
    assert _one(events, op.rng_sum(coll, lambda o: o.pt)) == pytest.approx(90.0)
    assert _one(events, op.rng_max(coll, lambda o: o.eta)) == 3.0
    assert _one(events, op.rng_min(coll, lambda o: o.eta)) == -2.0
    assert _one(events, op.rng_count(coll, lambda o: o.q > 0)) == 2
    assert _one(events, op.rng_sum(coll, lambda o: o.pt), id_=2) == 0.0


def test_sort_and_max_element_by(events):
    coll = op.Collection(F.col("objs"))
    by_eta = op.sort(coll, [(lambda o: o.eta, False)])
    assert _one(events, by_eta[0].eta) == -2.0
    top = op.rng_max_element_by(coll, lambda o: o.mass)
    assert _one(events, top.pt) == 30.0


def test_combine_pairs(events):
    coll = op.Collection(F.col("objs"))
    pairs = op.combine(coll)
    assert _one(events, op.rng_len(pairs)) == 3  # C(3,2)
    os_pairs = op.combine(coll, pred=lambda a, b: a.q * b.q < 0)
    assert _one(events, op.rng_len(os_pairs)) == 2
    assert _one(events, op.rng_len(pairs), id_=2) == 0
    assert _one(events, op.rng_len(pairs), id_=3) == 0


def test_sort_by_pt_invariant(spark):
    df = spark.createDataFrame(
        [
            Row(
                id=1,
                objs=[
                    Row(pt=10.0, eta=0.1, phi=0.0, mass=1.0),
                    Row(pt=99.0, eta=0.2, phi=0.0, mass=1.0),
                    Row(pt=50.0, eta=0.3, phi=0.0, mass=1.0),
                ],
            )
        ]
    )
    sorted_ = op.sort_by_pt(op.Collection(F.col("objs")))
    pts = df.select(F.transform(sorted_.col, lambda o: o["pt"]).alias("v")).collect()[0]["v"]
    assert pts == [99.0, 50.0, 10.0]
