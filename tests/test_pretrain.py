"""Training-set preparation: decontamination, packing, redaction."""

import pandas as pd
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from bambooanalysis_spark.operators.pretrain import (
    contamination_hits,
    decontaminate,
    pack_sequences,
    redact,
    running_token_layout,
)


def _mini_corpus(spark):
    train = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="completely unrelated words appear in here now"),
            Row(doc_id=3, text="quick brown fox jumps too"),  # shares a 3-gram
        ]
    )
    bench = spark.createDataFrame(
        [Row(doc_id=100, text="watch the quick brown fox jumps again")]
    )
    return train, bench


def test_contamination_hits_flags_shared_ngrams(spark):
    train, bench = _mini_corpus(spark)
    hits = {
        r["doc_id"]: r["n_hit_grams"]
        for r in contamination_hits(train, bench, n=3).collect()
    }
    # doc 1 shares 'the quick brown', 'quick brown fox', 'brown fox jumps';
    # doc 3 shares the latter two; doc 2 shares nothing
    assert hits == {1: 3, 3: 2}


def test_decontaminate_keeps_only_clean_docs(spark):
    train, bench = _mini_corpus(spark)
    kept = sorted(
        r["doc_id"] for r in decontaminate(train, bench, n=3).collect()
    )
    assert kept == [2]


def test_decontaminate_no_cartesian_product(spark):
    train, bench = _mini_corpus(spark)
    plan = (
        decontaminate(train, bench, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_pack_layout_matches_single_partition_cumsum(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text"
    )
    # bucket_width far below the row count: forces many buckets, so the
    # two-phase offsets actually compose across buckets
    laid = running_token_layout(docs, bucket_width=7).toPandas()
    naive = (
        docs.select(
            "doc_id",
            F.size(F.filter(F.split("text", " "), lambda t: F.length(t) > 0))
            .cast("long")
            .alias("n_tokens"),
        )
        .withColumn(
            "tok_start",
            F.sum("n_tokens")
            .over(
                Window.orderBy("doc_id").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("n_tokens"),
        )
        .toPandas()
    )
    cols = ["doc_id", "n_tokens", "tok_start"]
    pd.testing.assert_frame_equal(
        laid[cols].sort_values("doc_id").reset_index(drop=True),
        naive[cols].sort_values("doc_id").reset_index(drop=True),
    )


def test_pack_data_side_windows_are_bucket_partitioned(spark, sf_small):
    """The corpus-sized window must partition by the bucket column; the only
    global-order window allowed is over the per-bucket totals (metadata)."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text"
    )
    df = pack_sequences(docs, context_len=64, bucket_width=100)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # offsets join back by broadcast, not shuffle
    assert "BroadcastHashJoin" in plan
    # per-bucket running sum is partitioned on __b
    assert "windowspecdefinition(__b" in plan


def test_pack_spanning_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c"),  # tokens 0..2, pack 0
            Row(doc_id=2, text=""),  # empty: stays at offset 3, pack 0
            Row(doc_id=3, text="d e f g"),  # tokens 3..6, spans packs 0-1
        ]
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in pack_sequences(docs, context_len=4, bucket_width=10).collect()
    }
    assert rows[1]["tok_start"] == 0 and rows[1]["pack_first"] == 0
    assert rows[1]["pack_last"] == 0
    assert rows[2]["n_tokens"] == 0 and rows[2]["n_packs"] == 1
    assert rows[3]["tok_start"] == 3
    assert (rows[3]["pack_first"], rows[3]["pack_last"]) == (0, 1)
    assert rows[3]["n_packs"] == 2


def test_redact_patterns_and_counts(spark):
    docs = spark.createDataFrame(
        [
            Row(
                doc_id=1,
                text="mail me at jane.doe+x@example.org or see "
                "https://example.org/a?b=1 card 1234 5678 9012",
            ),
            Row(doc_id=2, text="nothing sensitive here"),
        ]
    )
    rows = {r["doc_id"]: r.asDict() for r in redact(docs).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["n_url"] == 1
    assert rows[1]["n_number"] == 1
    assert (
        rows[1]["text_redacted"]
        == "mail me at <EMAIL> or see <URL> card <NUM>"
    )
    assert rows[2]["text_redacted"] == "nothing sensitive here"
    assert rows[2]["n_email"] == rows[2]["n_url"] == rows[2]["n_number"] == 0


def test_redact_is_pure_projection(spark, sf_small):
    """Zero shuffles: redaction is a scan-side projection."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = redact(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
