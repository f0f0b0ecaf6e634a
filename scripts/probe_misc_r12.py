#!/usr/bin/env python
"""Round-12 probe: (a) bloom_probe with the fingerprint pass shared
between build and probe sides (guide §8: decide on small rows — here,
hash once) vs current two-pass shape; (b) dedup_minhash_lsh pre- vs
post-distinct pair volume (how much the distinct's map-side partial
aggregation actually dedups — VERDICT r11 #6)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale/sf1")

from pyspark.sql import functions as F  # noqa: E402


def timed(label, fn, n=2):
    fn()
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{best:8.3f}s  {label}")
    return best


def main() -> None:
    from bambooanalysis_spark.contract import read_table
    from bambooanalysis_spark.contract.approx import (
        _BF_K, _BF_M, q_dedup_bloom_membership,
    )
    from bambooanalysis_spark.operators.membership import (
        bloom_build, bloom_might_contain,
    )
    from bambooanalysis_spark.operators.text import fingerprint
    from bambooanalysis_spark.session import get_spark

    spark = get_spark("probe-misc-r12")
    read_table(spark, SF_DIR, "documents").count()  # warm page cache

    # --- (a) bloom: current vs shared-fingerprint ---------------------------
    def bloom_current():
        q_dedup_bloom_membership(spark, SF_DIR).count()

    def bloom_shared():
        docs = read_table(spark, SF_DIR, "documents").select(
            "doc_id", fingerprint(F.col("text")).alias("fp")
        ).persist()
        try:
            members = docs.where(F.col("doc_id") % 2 == 0)
            filt = bloom_build(members, "fp", m_bits=_BF_M, k=_BF_K)
            probed = bloom_might_contain(docs, filt, "fp", m_bits=_BF_M, k=_BF_K)
            (
                probed.select(
                    (F.col("doc_id") % 2 == 0).alias("is_member"),
                    "might_contain",
                    "doc_id",
                )
                .groupBy("is_member", "might_contain")
                .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_id"))
                .orderBy("is_member", "might_contain")
            ).count()
        finally:
            docs.unpersist()

    for name, fn in [("bloom current", bloom_current),
                     ("bloom shared-fp", bloom_shared),
                     ("bloom shared-fp b", bloom_shared),
                     ("bloom current b", bloom_current)]:
        timed(name, fn)

    # --- (b) minhash pair dedup factor --------------------------------------
    from bambooanalysis_spark.operators.dedup import (
        _barrier, _fan_out, bucket_pairs, hashed_shingles, lsh_band_keys,
        minhash_signature_from_hashes,
    )
    from bambooanalysis_spark.operators import text as T

    docs = read_table(spark, SF_DIR, "documents")
    src = _fan_out(
        docs.select(F.col("doc_id"), F.col("text").alias("__text")), "doc_id"
    )
    staged = _barrier(
        src.withColumn("__hsh", hashed_shingles(T.shingles(F.col("__text"), 3)))
    )
    staged = _barrier(
        staged.withColumn("__sig", minhash_signature_from_hashes(F.col("__hsh"), 16))
    )
    banded = staged.select(
        "doc_id",
        F.explode(
            F.when(
                F.try_element_at(F.col("__sig"), F.lit(1)) != -1,
                lsh_band_keys(F.col("__sig"), 4, 4),
            )
        ).alias("band_key"),
    )
    buckets = banded.groupBy("band_key").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ids")
    )
    n = F.size(F.col("ids"))
    pre = (
        buckets.where(n > 1)
        .select((n * (n - 1) / 2).cast("long").alias("np"))
        .agg(F.sum("np"))
        .collect()[0][0]
    )
    post = bucket_pairs(banded, "band_key", "doc_id", "doc_a", "doc_b").count()
    print(f"# minhash sf1: pre-distinct pair rows {pre}, distinct {post}, "
          f"dedup factor {pre/post:.3f}")


if __name__ == "__main__":
    main()
