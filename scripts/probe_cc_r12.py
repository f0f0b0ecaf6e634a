#!/usr/bin/env python
"""Round-12 probe: CC loop old (r11: identity-checkpoint seed + per-round
changed-count job) vs new (r12: round-1 fused into the seed aggregate +
observe()-metric convergence — ONE job per round). Interleaved A/B on the
sf1 crawl graph, labels asserted identical."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale/sf1")

from pyspark.sql import functions as F  # noqa: E402


def cc_old(pairs, nodes, id_col):
    """The r11 implementation, verbatim shape (nopart layout — the sf1
    crawl labels broadcast, matching what the committed stats probe
    picks)."""
    cache = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).persist()
    edges = cache.unionByName(
        cache.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    labels = labels.localCheckpoint(eager=True)
    label_t = labels.schema["label"].dataType
    jobs = 0
    for it in range(25):
        if it == 0:
            prop = edges.select(
                F.col("dst").alias("id"), F.col("src").alias("label"),
                F.lit(None).cast(label_t).alias("__old"),
            )
            new_full = (
                labels.select("id", "label", F.col("label").alias("__old"))
                .unionByName(prop)
                .groupBy("id")
                .agg(F.min("label").alias("label"), F.min("__old").alias("__old"))
            ).localCheckpoint(eager=True)
            jobs += 2
            changed = new_full.where(F.col("label") != F.col("__old")).limit(1).count()
            labels = new_full.select("id", "label")
            if changed == 0:
                break
            continue
        prop = edges.join(labels, edges["src"] == labels["id"]).select(
            F.col("dst").alias("id"), F.col("label"), F.lit(None).cast(label_t).alias("__old")
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
        jobs += 2
        changed = new_full.where(F.col("label") != F.col("__old")).limit(1).count()
        labels = new_full.select("id", "label")
        if changed == 0:
            break
    cache.unpersist()
    print(f"    (old: ~{jobs + 1} actions)")
    return labels.select(
        F.col("id").alias(id_col), F.col("label").alias("cluster_id"),
        (F.col("id") == F.col("label")).alias("is_representative"),
    )


def main() -> None:
    from bambooanalysis_spark.contract.crawl import (
        crawl_fixture_dir, crawl_stage_frames,
    )
    from bambooanalysis_spark.operators.dedup import (
        connected_components, minhash_lsh_pairs,
    )
    from bambooanalysis_spark.session import get_spark

    spark = get_spark("probe-cc-r12")
    seg_dir = crawl_fixture_dir(spark, SF_DIR)
    flags = crawl_stage_frames(spark, seg_dir + "/*.wet.gz").persist()
    kept = flags.where(
        F.col("allowed") & ~F.col("blocked") & F.col("quality_ok")
    ).select("doc_id", "text")
    kept.count()
    pairs = minhash_lsh_pairs(
        kept, "doc_id", "text", k=16, bands=8, shingle_k=3, max_bucket=1
    ).localCheckpoint(eager=True)  # isolate CC cost from the sig chain
    nodes = kept.select("doc_id").localCheckpoint(eager=True)
    print(f"# pairs: {pairs.count()}, nodes: {nodes.count()}")

    def run_old():
        return cc_old(pairs, nodes, "doc_id")

    def run_new():
        return connected_components(pairs, nodes, "doc_id")

    results = {}
    # interleaved, both orders (memory: never trust a single A/B here)
    for name, fn in [("old1", run_old), ("new1", run_new),
                     ("new2", run_new), ("old2", run_old),
                     ("old3", run_old), ("new3", run_new)]:
        t0 = time.perf_counter()
        labels = fn()
        labels.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        results[name] = labels
        print(f"{dt:8.3f}s  {name}")

    base = results["old1"].orderBy("doc_id").collect()
    for name in ("new1", "new2"):
        other = results[name].orderBy("doc_id").collect()
        assert base == other, f"{name} DIVERGES from old"
    print("# label tables identical old vs new")
    flags.unpersist()


if __name__ == "__main__":
    main()
