"""Distributed Bloom filter (operators/membership.py): structural
no-false-negatives, deterministic false positives, cross-batch merge,
and the shuffle-free probe plan."""

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
    """Union + re-aggregate merges filters: the merged filter contains
    every key of both batches (the cross-batch lifecycle)."""
    b1, b2 = _docs(spark, 300, "a"), _docs(spark, 300, "b")
    f1 = M.bloom_build(b1, "fp", m_bits=1 << 12, k=3)
    f2 = M.bloom_build(b2, "fp", m_bits=1 << 12, k=3)
    merged = (
        f1.unionByName(f2)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    both = b1.unionByName(b2)
    probed = M.bloom_might_contain(both, merged, "fp", m_bits=1 << 12, k=3)
    assert probed.where("NOT might_contain").count() == 0


def test_bloom_probe_plan_is_broadcast_only(spark):
    """The probed corpus must stream map-side: k broadcast hash joins,
    no SortMergeJoin, no Exchange outside the broadcast subtrees."""
    docs = _docs(spark, 100)
    filt = M.bloom_build(docs, "fp", m_bits=1 << 12, k=4)
    plan = (
        M.bloom_might_contain(docs, filt, "fp", m_bits=1 << 12, k=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    # build's own aggregate shuffles (parameter-sized); the probe side
    # adds only BroadcastExchanges
    assert plan.count("BroadcastHashJoin") == 4


def test_bloom_word_table_is_parameter_sized(spark):
    filt = M.bloom_build(_docs(spark, 5000), "fp", m_bits=1 << 12, k=4)
    assert filt.count() <= (1 << 12) // 63 + 1
