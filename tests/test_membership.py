"""Distributed Bloom filter (operators/membership.py): structural
no-false-negatives, deterministic false positives, cross-batch merge
with parameter validation, NULL-key semantics, the duplicate-row probe
guard, and the broadcast/shuffle probe-mode identity."""

import pytest
from pyspark.sql import functions as F

from bambooanalysis_spark.operators import membership as M


def _docs(spark, n, tag=""):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(f"key-{tag}"), F.col("id")).alias("fp"),
    )


def test_bloom_no_false_negatives_and_deterministic_fps(spark):
    docs = _docs(spark, 2000)
    members = docs.where("doc_id % 2 = 0")
    filt = bloom = M.bloom_build(members, "fp", m_bits=1 << 13, k=4)
    probed = M.bloom_might_contain(docs, filt, "fp", m_bits=1 << 13, k=4)
    rows = {r["doc_id"]: r["might_contain"] for r in probed.collect()}
    # every member hits — false negatives are structurally impossible
    assert all(rows[d] for d in range(0, 2000, 2))
    # non-members: some false positives (small m), never all, and the
    # exact set is deterministic across runs (md5-derived)
    fps = sorted(d for d in range(1, 2000, 2) if rows[d])
    assert 0 < len(fps) < 1000
    probed2 = M.bloom_might_contain(docs, bloom, "fp", m_bits=1 << 13, k=4)
    fps2 = sorted(
        r["doc_id"] for r in probed2.where(
            "might_contain AND doc_id % 2 = 1").collect()
    )
    assert fps == fps2


def test_bloom_merge_across_batches(spark):
    """bloom_merge unions same-parameter filters: the merged filter
    contains every key of both batches (the cross-batch lifecycle) and
    keeps the metadata columns."""
    b1, b2 = _docs(spark, 300, "a"), _docs(spark, 300, "b")
    f1 = M.bloom_build(b1, "fp", m_bits=1 << 12, k=3)
    f2 = M.bloom_build(b2, "fp", m_bits=1 << 12, k=3)
    merged = M.bloom_merge(f1, f2)
    assert {"word_idx", "word", "m_bits", "k"} <= set(merged.columns)
    both = b1.unionByName(b2)
    probed = M.bloom_might_contain(both, merged, "fp")
    assert probed.where("NOT might_contain").count() == 0


def test_bloom_merge_mismatched_params_raises(spark):
    """Filters built with different (m_bits, k) must NOT merge silently
    (VERDICT r9 #2a): a bit at position p under one m is a different
    bit under another."""
    docs = _docs(spark, 100)
    f_a = M.bloom_build(docs, "fp", m_bits=1 << 12, k=3)
    f_b = M.bloom_build(docs, "fp", m_bits=1 << 13, k=3)
    f_c = M.bloom_build(docs, "fp", m_bits=1 << 12, k=4)
    with pytest.raises(ValueError, match="different parameters"):
        M.bloom_merge(f_a, f_b)
    with pytest.raises(ValueError, match="different parameters"):
        M.bloom_merge(f_a, f_c)
    # a raw cross-parameter union probed without explicit params fails
    # at construction (the derive path reads the table)
    with pytest.raises(ValueError, match="conflicting"):
        M.bloom_might_contain(docs, f_a.unionByName(f_b), "fp")
    # ...and probed WITH explicit params it fails at execution via the
    # in-plan raise_error guard (lazy path, self-review r10)
    probed = M.bloom_might_contain(
        docs, f_a.unionByName(f_b), "fp", m_bits=1 << 12, k=3
    )
    with pytest.raises(Exception, match="filter table carries"):
        probed.collect()


def test_bloom_probe_param_crosscheck(spark):
    """Explicit probe params that disagree with the filter's metadata
    fail loudly (in-plan, at execution) instead of probing the wrong
    positions — a silent all-false-negatives failure otherwise."""
    docs = _docs(spark, 100)
    filt = M.bloom_build(docs, "fp", m_bits=1 << 12, k=3)
    with pytest.raises(Exception, match="m_bits"):
        M.bloom_might_contain(
            docs, filt, "fp", m_bits=1 << 13, k=3
        ).collect()
    with pytest.raises(Exception, match="k="):
        M.bloom_might_contain(
            docs, filt, "fp", m_bits=1 << 12, k=4
        ).collect()
    # matching explicit params stay fully lazy AND green
    ok = M.bloom_might_contain(docs, filt, "fp", m_bits=1 << 12, k=3)
    assert ok.where("NOT might_contain").count() == 0
    # legacy table without metadata: explicit params required
    legacy = filt.select("word_idx", "word")
    with pytest.raises(ValueError, match="no \\(m_bits, k\\)"):
        M.bloom_might_contain(docs, legacy, "fp")
    ok2 = M.bloom_might_contain(docs, legacy, "fp", m_bits=1 << 12, k=3)
    assert ok2.where("NOT might_contain").count() == 0


def test_bloom_probe_half_specified_params_still_crosschecked(spark):
    """Review r10 pass 2: passing only ONE of m_bits/k must not
    silently discard the caller's wrong value — the derive path
    cross-checks whatever was provided."""
    docs = _docs(spark, 100)
    filt = M.bloom_build(docs, "fp", m_bits=1 << 12, k=3)
    with pytest.raises(ValueError, match="disagrees"):
        M.bloom_might_contain(docs, filt, "fp", m_bits=1 << 13)  # k omitted
    with pytest.raises(ValueError, match="disagrees"):
        M.bloom_might_contain(docs, filt, "fp", k=4)  # m_bits omitted
    # half-specified but CORRECT params derive the rest and work
    ok = M.bloom_might_contain(docs, filt, "fp", m_bits=1 << 12)
    assert ok.where("NOT might_contain").count() == 0


def test_bloom_probe_null_metadata_rows_trip_guard(spark):
    """Review r10 pass 2: a filter mixing metadata rows with
    NULL-metadata rows (legacy table unioned with
    allowMissingColumns=True) must fail the in-plan guard, not
    NULL-propagate past it into a silent wrong-geometry probe."""
    docs = _docs(spark, 100)
    filt = M.bloom_build(docs, "fp", m_bits=1 << 12, k=3)
    legacy = M.bloom_build(
        _docs(spark, 50, "b"), "fp", m_bits=1 << 13, k=3
    ).select("word_idx", "word")
    mixed = filt.unionByName(legacy, allowMissingColumns=True)
    probed = M.bloom_might_contain(docs, mixed, "fp", m_bits=1 << 12, k=3)
    with pytest.raises(Exception, match="m_bits=NULL"):
        probed.collect()


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_bloom_null_keys_probe_false(spark, mode):
    """NULL keys are not members: build ignores them, probe returns
    false — not NULL (VERDICT r9 #2b: the k-bit conjunction is
    NULL-propagating without the guard)."""
    docs = _docs(spark, 200)
    with_nulls = docs.withColumn(
        "fp", F.when(F.col("doc_id") % 5 != 0, F.col("fp"))
    )
    filt = M.bloom_build(with_nulls, "fp", m_bits=1 << 12, k=4)
    probed = M.bloom_might_contain(
        with_nulls, filt, "fp", probe_mode=mode
    )
    rows = {r["doc_id"]: r["might_contain"] for r in probed.collect()}
    assert len(rows) == 200
    for d, mc in rows.items():
        assert mc is not None
        if d % 5 == 0:
            assert mc is False  # NULL key -> false, never NULL/true
        else:
            assert mc is True  # real members all hit


def test_bloom_probe_modes_identical(spark):
    """'shuffle' (production-m path) and 'broadcast' return the same
    verdict for every row — including the deterministic FP set."""
    docs = _docs(spark, 1500)
    members = docs.where("doc_id % 3 = 0")
    filt = M.bloom_build(members, "fp", m_bits=1 << 12, k=4)
    b = M.bloom_might_contain(docs, filt, "fp", probe_mode="broadcast")
    s = M.bloom_might_contain(docs, filt, "fp", probe_mode="shuffle")
    rows_b = sorted((r["doc_id"], r["might_contain"]) for r in b.collect())
    rows_s = sorted((r["doc_id"], r["might_contain"]) for r in s.collect())
    assert rows_b == rows_s
    # and the fixture actually exercises both verdicts
    assert {v for _, v in rows_b} == {True, False}


def test_bloom_probe_heals_duplicate_word_rows(spark):
    """ADVICE r9: a word table unioned WITHOUT the bit_or re-aggregate
    (duplicate word_idx rows) must not multiply probe rows or emit a
    false negative — the probe re-aggregates internally."""
    b1, b2 = _docs(spark, 200, "a"), _docs(spark, 200, "b")
    f1 = M.bloom_build(b1, "fp", m_bits=1 << 12, k=3)
    f2 = M.bloom_build(b2, "fp", m_bits=1 << 12, k=3)
    naive = f1.unionByName(f2)  # duplicate word_idx rows, same params
    both = b1.unionByName(b2)
    probed = M.bloom_might_contain(both, naive, "fp")
    assert probed.count() == 400  # no row multiplication
    assert probed.where("NOT might_contain").count() == 0  # no false neg


def test_bloom_probe_plan_is_broadcast_only(spark):
    """Broadcast mode (r11 shape): the probed corpus must stream
    map-side — ONE one-row broadcast attach of the whole word table as
    a map (so the filter-build lineage executes once, not per hash
    function), no SortMergeJoin and no per-hash broadcast hash joins on
    the probe side."""
    docs = _docs(spark, 100)
    filt = M.bloom_build(docs, "fp", m_bits=1 << 12, k=4)
    plan = (
        M.bloom_might_contain(docs, filt, "fp", probe_mode="broadcast")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 0
    # the single one-row map attach
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert plan.count("BroadcastExchange") == 1


def test_bloom_auto_mode_switches_on_m(spark):
    """auto = broadcast under the threshold (the one-row map attach),
    shuffle above it (no broadcast attach on the probe side)."""
    docs = _docs(spark, 100)
    filt = M.bloom_build(docs, "fp", m_bits=1 << 12, k=4)
    big = (
        M.bloom_might_contain(
            docs, filt, "fp", probe_mode="auto", broadcast_max_bits=1 << 10
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert big.count("BroadcastNestedLoopJoin") == 0
    small = (
        M.bloom_might_contain(
            docs, filt, "fp", probe_mode="auto", broadcast_max_bits=1 << 20
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert small.count("BroadcastNestedLoopJoin") == 1


def test_bloom_word_table_is_parameter_sized(spark):
    filt = M.bloom_build(_docs(spark, 5000), "fp", m_bits=1 << 12, k=4)
    assert filt.count() <= (1 << 12) // 63 + 1
