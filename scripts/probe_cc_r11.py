#!/usr/bin/env python
"""Round-11 probe: per-round wall of the connected_components loop as
invoked by crawl_to_shards (guide §1). Replicates connected_components
inline with timers."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from bambooanalysis_spark.contract.crawl import (
        crawl_fixture_dir, crawl_stage_frames,
    )
    from bambooanalysis_spark.operators.dedup import minhash_lsh_pairs
    from bambooanalysis_spark.session import get_spark

    spark = get_spark("probe-cc")
    seg_dir = crawl_fixture_dir(spark, SF_DIR)
    flags = crawl_stage_frames(spark, seg_dir + "/*.wet.gz").persist()
    kept = flags.where(
        F.col("allowed") & ~F.col("blocked") & F.col("quality_ok")
    ).select("doc_id", "text")
    kept.count()  # warm the WET parse into the persist cache

    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(
        kept, "doc_id", "text", k=16, bands=8, shingle_k=3, max_bucket=1
    )
    sym = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    nparts = max(spark.sparkContext.defaultParallelism, 4)
    edges = sym.repartition(nparts, "src").persist()
    n_edges = edges.count()
    t1 = time.perf_counter()
    print(f"{t1 - t0:8.3f}s  edges build+persist ({n_edges} sym edges)")

    nodes = kept
    labels = nodes.select(F.col("doc_id").alias("id"), F.col("doc_id").alias("label"))
    labels = labels.localCheckpoint(eager=True)
    label_t = labels.schema["label"].dataType
    t2 = time.perf_counter()
    print(f"{t2 - t1:8.3f}s  labels init checkpoint ({labels.count()} nodes)")

    prev = time.perf_counter()
    for rnd in range(25):
        prop = edges.join(labels, edges["src"] == labels["id"]).select(
            F.col("dst").alias("id"), F.col("label"),
            F.lit(None).cast(label_t).alias("__old"),
        )
        jump = (
            labels.alias("a")
            .join(labels.alias("b"), F.col("a.label") == F.col("b.id"))
            .select(
                F.col("a.id").alias("id"), F.col("b.label").alias("label"),
                F.lit(None).cast(label_t).alias("__old"),
            )
        )
        new_full = (
            labels.select("id", "label", F.col("label").alias("__old"))
            .unionByName(prop)
            .unionByName(jump)
            .groupBy("id")
            .agg(F.min("label").alias("label"), F.min("__old").alias("__old"))
        ).localCheckpoint(eager=True)
        t_ckpt = time.perf_counter()
        changed = new_full.where(F.col("label") != F.col("__old")).limit(1).count()
        t_conv = time.perf_counter()
        print(
            f"round {rnd}: ckpt {t_ckpt - prev:6.3f}s  conv {t_conv - t_ckpt:6.3f}s"
            f"  changed={changed}"
        )
        prev = t_conv
        labels = new_full.select("id", "label")
        if changed == 0:
            break
    edges.unpersist()
    flags.unpersist()


if __name__ == "__main__":
    main()
