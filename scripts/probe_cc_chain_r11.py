#!/usr/bin/env python
"""Round-11 probe: deeper per-round label-compression chains for the CC
loop (guide §1.2 — fewer rounds beats cheaper rounds when each round is a
fixed-overhead job). All variants use the batch-4 broadcast-regime edge
layout (pairs persisted, sym built lazily). Each extra chain link is one
more broadcast-hash probe of the SAME checkpointed label table inside the
same stage (its BroadcastExchange is plan-identical and reused), so a
link costs probe time, not a build or a job.

variants (per-round new label of x, always unioned with self):
  base      — min(l(nbr), l2(x))           (shipped connected_components)
  chain3    — min(l(nbr), l3(x))
  propjump  — min(l2(nbr), l2(x))
  deep      — min(l2(nbr), l3(x))

Labels asserted identical across variants.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale/sf1")

from pyspark.sql import functions as F  # noqa: E402


def _lchain(labels, start, depth):
    """start carries (id, label); return (id, l^depth(label-chain))."""
    out = start
    for i in range(depth):
        out = (
            out.alias("x")
            .join(labels.alias(f"l{i}"), F.col("x.label") == F.col(f"l{i}.id"))
            .select(F.col("x.id").alias("id"), F.col(f"l{i}.label").alias("label"))
        )
    return out


def cc_chain(pairs, nodes, id_col, prop_depth, jump_depth, max_iter=25):
    cache = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).persist()
    edges = cache.unionByName(
        cache.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    labels = labels.localCheckpoint(eager=True)
    label_t = labels.schema["label"].dataType
    rounds = 0
    for _ in range(max_iter):
        null_old = F.lit(None).cast(label_t).alias("__old")
        prop = edges.join(labels, edges["src"] == labels["id"]).select(
            F.col("dst").alias("id"), F.col("label")
        )
        prop = _lchain(labels, prop, prop_depth - 1)
        jump = _lchain(
            labels, labels.select("id", "label"), jump_depth - 1
        )
        new_full = (
            labels.select("id", "label", F.col("label").alias("__old"))
            .unionByName(prop.select("id", "label", null_old))
            .unionByName(jump.select("id", "label", null_old))
            .groupBy("id")
            .agg(F.min("label").alias("label"), F.min("__old").alias("__old"))
        ).localCheckpoint(eager=True)
        rounds += 1
        changed = new_full.where(F.col("label") != F.col("__old")).limit(1).count()
        labels = new_full.select("id", "label")
        if changed == 0:
            break
    cache.unpersist()
    print(f"    ({rounds} ckpt jobs)")
    return labels


def main() -> None:
    from bambooanalysis_spark.contract.crawl import (
        crawl_fixture_dir, crawl_stage_frames,
    )
    from bambooanalysis_spark.operators.dedup import (
        connected_components, minhash_lsh_pairs,
    )
    from bambooanalysis_spark.session import get_spark

    spark = get_spark("probe-cc-chain")
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

    def shipped():
        out = connected_components(pairs, kept, "doc_id")
        return out.select(
            F.col("doc_id").alias("id"), F.col("cluster_id").alias("label")
        )

    results = {}
    variants = [
        ("shipped", shipped),
        ("chain3", lambda: cc_chain(pairs, kept, "doc_id", 1, 3)),
        ("propjump", lambda: cc_chain(pairs, kept, "doc_id", 2, 2)),
        ("deep", lambda: cc_chain(pairs, kept, "doc_id", 2, 3)),
        ("base2x", lambda: cc_chain(pairs, kept, "doc_id", 1, 2)),
        ("shipped2", shipped),
    ]
    for name, fn in variants:
        t0 = time.perf_counter()
        labels = fn()
        labels.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        results[name] = labels
        print(f"{dt:8.3f}s  {name}")

    ref = results["shipped"].orderBy("id").collect()
    for name, lab in results.items():
        if name == "shipped":
            continue
        got = lab.orderBy("id").collect()
        assert got == ref, f"{name} labels differ from shipped"
    print("# all label tables identical")


if __name__ == "__main__":
    main()
