"""Training-shard export (sources/layout.export_training_shards):
deterministic seeded membership and order, shard-size evenness,
manifest integrity, and the maxRecordsPerFile cap.

Determinism is the point under test: repartitionByRange's boundary
sampling is documented run-to-run inconsistent, so the exporter derives
shard ids arithmetically (pmod of the seeded row hash) and places them
with partitionBy — no sampling anywhere in the plan.
"""

from __future__ import annotations

import json


from bambooanalysis_spark.sources.layout import export_training_shards


def _docs(spark, n=5000):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
    )


def test_shards_even_and_manifest_sums(spark, tmp_path):
    path = str(tmp_path / "shards")
    m = export_training_shards(
        _docs(spark), path, "doc_id", shards=8, seed=7
    )
    assert m["total_records"] == 5000
    assert sum(f["records"] for f in m["files"]) == 5000
    # one file per shard directory (all rows of a shard land in one task)
    assert len(m["files"]) == 8
    assert len({f["file"].split("/")[0] for f in m["files"]}) == 8
    counts = [f["records"] for f in m["files"]]
    # uniform hash mod 8 over 5000 rows: binomial spread, no stragglers
    assert min(counts) > 0
    assert max(counts) / min(counts) < 1.5
    on_disk = json.loads((tmp_path / "shards" / "_manifest.json").read_text())
    assert on_disk["total_records"] == 5000
    assert on_disk["seed"] == 7


def _membership(spark, path):
    return {
        r["doc_id"]: r["shard"]
        for r in spark.read.parquet(path).select("doc_id", "shard").collect()
    }


def test_membership_is_seed_deterministic_and_seed_sensitive(spark, tmp_path):
    a, b, c = (str(tmp_path / x) for x in "abc")
    export_training_shards(_docs(spark), a, "doc_id", shards=4, seed=1)
    export_training_shards(_docs(spark), b, "doc_id", shards=4, seed=1)
    export_training_shards(_docs(spark), c, "doc_id", shards=4, seed=2)
    ma, mb, mc = (_membership(spark, p) for p in (a, b, c))
    assert ma == mb  # same seed -> identical shard assignment, rerun-safe
    assert set(ma) == set(mc)  # same rows...
    moved = sum(1 for d in ma if ma[d] != mc[d])
    assert moved > 1000  # ...reshuffled under a different seed


def test_in_shard_order_is_deterministic(spark, tmp_path):
    # the within-file row order IS the training order: identical across
    # reruns (file read order preserves writer row order in parquet)
    import glob

    import pyarrow.parquet as pq

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    export_training_shards(_docs(spark), a, "doc_id", shards=4, seed=3)
    export_training_shards(_docs(spark), b, "doc_id", shards=4, seed=3)

    def orders(p):
        out = {}
        for fp in sorted(glob.glob(p + "/shard=*/*.parquet")):
            shard = fp.split("shard=")[1].split("/")[0]
            out[shard] = pq.read_table(fp, columns=["doc_id"])[
                "doc_id"
            ].to_pylist()
        return out

    oa, ob = orders(a), orders(b)
    assert oa == ob
    # and it is a permutation, not the input order
    assert any(ids != sorted(ids) for ids in oa.values())


def test_max_records_per_file_splits(spark, tmp_path):
    path = str(tmp_path / "capped")
    m = export_training_shards(
        _docs(spark, 1000), path, "doc_id", shards=2,
        max_records_per_file=100,
    )
    assert m["total_records"] == 1000
    assert len(m["files"]) >= 10
    assert max(f["records"] for f in m["files"]) <= 100


def test_jsonl_shards_roundtrip(spark, tmp_path):
    path = str(tmp_path / "jl")
    m = export_training_shards(
        _docs(spark, 300), path, "doc_id", shards=3, fmt="json"
    )
    assert m["total_records"] == 300
    back = spark.read.json(path)
    assert back.count() == 300
    assert set(back.columns) == {"doc_id", "text", "shard"}


def test_bad_args_raise(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="fmt"):
        export_training_shards(
            _docs(spark, 10), str(tmp_path / "x"), "doc_id", shards=1,
            fmt="csv",
        )
    with pytest.raises(ValueError, match="shards"):
        export_training_shards(
            _docs(spark, 10), str(tmp_path / "y"), "doc_id", shards=0
        )


def test_reserved_column_collision_raises(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    bad = _docs(spark, 10).withColumn("shard", F.lit(9))
    with pytest.raises(ValueError, match="shard"):
        export_training_shards(bad, str(tmp_path / "z"), "doc_id", shards=2)


def test_duplicate_keys_do_not_break_determinism_of_distinct_keys(
    spark, tmp_path
):
    # duplicated key values are interchangeable (documented); distinct
    # keys keep a total, rerun-identical order via the key tiebreak
    from pyspark.sql import functions as F

    df = _docs(spark, 500).union(_docs(spark, 500))  # every key twice
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    export_training_shards(df, a, "doc_id", shards=3, seed=5)
    export_training_shards(df, b, "doc_id", shards=3, seed=5)
    ka = (
        spark.read.parquet(a).groupBy("shard", "doc_id").count().collect()
    )
    kb = (
        spark.read.parquet(b).groupBy("shard", "doc_id").count().collect()
    )
    assert sorted(map(tuple, ka)) == sorted(map(tuple, kb))
    assert all(r["count"] == 2 for r in ka)


def test_empty_input_yields_empty_manifest_not_crash(spark, tmp_path):
    # a fully-filtered split is legitimate: no part files exist, the
    # count-back cannot infer a schema, and that must not crash
    # (review finding — verified UNABLE_TO_INFER_SCHEMA before the fix)
    path = str(tmp_path / "empty")
    m = export_training_shards(_docs(spark, 0), path, "doc_id", shards=4)
    assert m["files"] == []
    assert m["total_records"] == 0
    assert m["empty_shards"] == [0, 1, 2, 3]
    on_disk = json.loads((tmp_path / "empty" / "_manifest.json").read_text())
    assert on_disk["files"] == []


def test_sparse_input_reports_empty_shards(spark, tmp_path):
    # more shards than rows: missing shard dirs are NOT silently absent
    # from the contract — files is authoritative, empty_shards names the
    # holes a round-robin-over-range loader would hit (review finding)
    path = str(tmp_path / "sparse")
    m = export_training_shards(_docs(spark, 5), path, "doc_id", shards=16)
    assert 0 < len(m["files"]) <= 5
    present = {int(f["file"].split("=")[1].split("/")[0]) for f in m["files"]}
    assert sorted(set(range(16)) - present) == m["empty_shards"]
    assert m["total_records"] == 5


def test_validate_shards_passes_and_catches_damage(spark, tmp_path):
    import glob
    import os

    import pytest

    from bambooanalysis_spark.sources.layout import validate_shards

    path = str(tmp_path / "v")
    m = export_training_shards(_docs(spark, 400), path, "doc_id", shards=4)
    # clean export validates and returns the committed manifest
    got = validate_shards(spark, path)
    assert got["total_records"] == m["total_records"] == 400

    # delete one shard file -> named missing-file error
    victim = sorted(glob.glob(path + "/shard=*/*.parquet"))[0]
    os.remove(victim)
    with pytest.raises(ValueError, match="missing shard="):
        validate_shards(spark, path)


def test_validate_shards_requires_manifest(spark, tmp_path):
    import pytest

    from bambooanalysis_spark.sources.layout import validate_shards

    d = tmp_path / "notexport"
    d.mkdir()
    with pytest.raises(ValueError, match="no _manifest.json"):
        validate_shards(spark, str(d))
