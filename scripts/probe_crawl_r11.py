#!/usr/bin/env python
"""Round-11 measurement probe: per-phase wall breakdown of
pipeline_crawl_to_shards (guide §1 — measure first). Mirrors the real
execution order; prints one line per driver-visible phase. Solo use.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from bambooanalysis_spark.contract import crawl as cc
    from bambooanalysis_spark.contract.crawl import (
        _BUDGET, _SALT, _SCALE, _SEED, _SHARDS, crawl_fixture_dir,
        crawl_stage_frames,
    )
    from bambooanalysis_spark.contract.mixsql import SRC_WEIGHTS
    from bambooanalysis_spark.operators.dedup import (
        keep_best_per_cluster, near_dup_clusters,
    )
    from bambooanalysis_spark.operators.sampling import (
        materialize_token_mix, token_budget_mix,
    )
    from bambooanalysis_spark.session import get_spark
    from bambooanalysis_spark.sources.layout import export_training_shards

    spark = get_spark("probe-crawl")
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    # warm run (JIT, page cache, fixture memoization)
    cc.pipeline_crawl_to_shards(spark, SF_DIR).count()

    marks = [("start", time.perf_counter())]

    def mark(label):
        marks.append((label, time.perf_counter()))

    sc = spark.sparkContext
    seg_dir = crawl_fixture_dir(spark, SF_DIR)
    mark("fixture_dir (docs.count + marker)")

    flags = crawl_stage_frames(spark, seg_dir + "/*.wet.gz").persist()
    kept = flags.where(
        F.col("allowed") & ~F.col("blocked") & F.col("quality_ok")
    ).select("doc_id", "source", "n_tok", "text")

    sc.setJobDescription("probe: near_dup_clusters (CC loop)")
    clusters = near_dup_clusters(
        kept.select("doc_id", "text"), "doc_id", "text",
        k=16, bands=8, shingle_k=3,
    )
    mark("near_dup_clusters (eager CC loop incl. WET parse)")

    best = keep_best_per_cluster(
        clusters.select("doc_id", "cluster_id").join(
            kept.select("doc_id", "source", "n_tok"), "doc_id"
        ),
        "cluster_id", "n_tok", "doc_id",
    )
    bk = best.where(F.col("kept_best_i") == 1).select(
        "doc_id", "source", "n_tok"
    ).persist()
    alloc = token_budget_mix(
        bk, "source", "n_tok", budget=_BUDGET, weights=SRC_WEIGHTS,
        ratio_scale=_SCALE,
    )
    mixed = materialize_token_mix(
        bk, alloc, "source", "n_tok", "doc_id", salt=_SALT
    )
    final = (
        mixed.where(F.col("kept_i") == 1)
        .join(kept.select("doc_id", "text"), "doc_id")
        .select("doc_id", "source", "n_tok", "text")
    )
    mark("plan building (lazy)")

    def _nd(cond):
        return [
            F.count(F.when(cond, True)),
            F.coalesce(F.sum(F.when(cond, F.col("n_tok"))), F.lit(0)),
        ]

    ok_host = F.col("allowed") & ~F.col("blocked")
    sc.setJobDescription("probe: frow")
    frow = flags.agg(
        *_nd(F.lit(True)), *_nd(F.col("allowed")), *_nd(ok_host),
        *_nd(ok_host & F.col("quality_ok")),
    ).collect()[0]
    mark("frow (flags aggregate)")
    sc.setJobDescription("probe: brow")
    brow = bk.agg(F.count(F.lit(1)), F.coalesce(F.sum("n_tok"), F.lit(0))).collect()[0]
    mark("brow (keep-best aggregate: window + mix deps)")

    shard_dir = tempfile.mkdtemp(prefix="probe-shards-")
    try:
        sc.setJobDescription("probe: export")
        manifest = export_training_shards(
            final, shard_dir, key_col="doc_id", shards=_SHARDS, seed=_SEED
        )
        mark("export_training_shards (write + manifest)")
        sc.setJobDescription("probe: readback")
        back = (
            spark.read.parquet(shard_dir)
            .agg(F.count(F.lit(1)), F.coalesce(F.sum("n_tok"), F.lit(0)))
            .collect()[0]
        )
        mark("read-back aggregate")
    finally:
        shutil.rmtree(shard_dir, ignore_errors=True)
    bk.unpersist()
    flags.unpersist()
    mark("unpersist")

    print(f"# n_docs frow={frow[0]} bk={brow[0]} back={back[0]}")
    total = marks[-1][1] - marks[0][1]
    prev = marks[0][1]
    for label, t in marks[1:]:
        print(f"{t - prev:8.3f}s  {label}")
        prev = t
    print(f"{total:8.3f}s  TOTAL (bench-entry analog, warm)")


if __name__ == "__main__":
    main()
