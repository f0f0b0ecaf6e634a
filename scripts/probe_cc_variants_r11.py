#!/usr/bin/env python
"""Round-11 probe: CC loop variants on the crawl graph (guide §1.2 —
algorithm first). Compares wall + verifies identical label tables.

variants:
  base   — current connected_components
  fused2 — two (prop+jump) rounds per checkpointed job
  nopart — base but edges persisted WITHOUT the repartition (pairs
           persisted instead, sym built lazily from the cache)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale/sf1")

from pyspark.sql import functions as F  # noqa: E402


def _round(edges, labels, label_t):
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
    return (
        labels.select("id", "label", F.col("label").alias("__old"))
        .unionByName(prop)
        .unionByName(jump)
        .groupBy("id")
        .agg(F.min("label").alias("label"), F.min("__old").alias("__old"))
    )


def cc_base(pairs, nodes, id_col, repartition=True):
    spark = pairs.sparkSession
    sym = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")) \
        .unionByName(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    if repartition:
        nparts = max(spark.sparkContext.defaultParallelism, 4)
        edges = sym.repartition(nparts, "src").persist()
        cache = edges
    else:
        cache = pairs.persist()
        edges = cache.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")) \
            .unionByName(cache.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    labels = labels.localCheckpoint(eager=True)
    label_t = labels.schema["label"].dataType
    rounds = 0
    for _ in range(25):
        new_full = _round(edges, labels, label_t).localCheckpoint(eager=True)
        rounds += 1
        changed = new_full.where(F.col("label") != F.col("__old")).limit(1).count()
        labels = new_full.select("id", "label")
        if changed == 0:
            break
    cache.unpersist()
    print(f"    ({rounds} ckpt jobs)")
    return labels


def cc_fused2(pairs, nodes, id_col):
    spark = pairs.sparkSession
    sym = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")) \
        .unionByName(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    nparts = max(spark.sparkContext.defaultParallelism, 4)
    edges = sym.repartition(nparts, "src").persist()
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    labels = labels.localCheckpoint(eager=True)
    label_t = labels.schema["label"].dataType
    rounds = 0
    for _ in range(13):
        l1 = _round(edges, labels, label_t).select("id", "label")
        new_full = (
            _round(edges, l1, label_t)
            .drop("__old")
            .join(labels.withColumnRenamed("label", "__old"), "id", "left")
        ).localCheckpoint(eager=True)
        rounds += 1
        changed = new_full.where(F.col("label") != F.col("__old")).limit(1).count()
        labels = new_full.select("id", "label")
        if changed == 0:
            break
    edges.unpersist()
    print(f"    ({rounds} ckpt jobs)")
    return labels


def main() -> None:
    from bambooanalysis_spark.contract.crawl import (
        crawl_fixture_dir, crawl_stage_frames,
    )
    from bambooanalysis_spark.operators.dedup import minhash_lsh_pairs
    from bambooanalysis_spark.session import get_spark

    spark = get_spark("probe-cc-var")
    seg_dir = crawl_fixture_dir(spark, SF_DIR)
    flags = crawl_stage_frames(spark, seg_dir + "/*.wet.gz").persist()
    kept = flags.where(
        F.col("allowed") & ~F.col("blocked") & F.col("quality_ok")
    ).select("doc_id", "text")
    kept.count()
    pairs = minhash_lsh_pairs(
        kept, "doc_id", "text", k=16, bands=8, shingle_k=3, max_bucket=1
    ).localCheckpoint(eager=True)  # isolate CC cost from the sig chain
    print(f"# pairs: {pairs.count()}")

    results = {}
    for name, fn in [
        ("base", lambda: cc_base(pairs, kept, "doc_id")),
        ("fused2", lambda: cc_fused2(pairs, kept, "doc_id")),
        ("nopart", lambda: cc_base(pairs, kept, "doc_id", repartition=False)),
        ("base2", lambda: cc_base(pairs, kept, "doc_id")),
        ("fused2b", lambda: cc_fused2(pairs, kept, "doc_id")),
    ]:
        t0 = time.perf_counter()
        labels = fn()
        labels.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        results[name] = labels
        print(f"{dt:8.3f}s  {name}")

    base = results["base"].orderBy("id").collect()
    for name in ("fused2", "nopart"):
        other = results[name].orderBy("id").collect()
        assert base == other, f"{name} DIVERGES from base"
    print("# label tables identical across variants")
    flags.unpersist()


if __name__ == "__main__":
    main()
