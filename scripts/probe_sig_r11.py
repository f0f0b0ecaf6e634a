#!/usr/bin/env python
"""Round-11 probe: cumulative noop-sink timing of each stage of the
minhash-LSH signature chain over the full documents table (guide §1.4).
Each stage is timed as best-of-2 warm."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale/sf1")


def main() -> None:
    from pyspark.sql import functions as F

    from bambooanalysis_spark.contract import read_table
    from bambooanalysis_spark.operators import text as T
    from bambooanalysis_spark.operators.dedup import (
        _barrier, _fan_out, bucket_pairs, hashed_shingles, lsh_band_keys,
        minhash_signature_from_hashes,
    )
    from bambooanalysis_spark.session import get_spark

    spark = get_spark("probe-sig")
    docs = read_table(spark, SF_DIR, "documents")
    n = docs.count()
    print(f"# {n} docs")

    k, bands, shingle_k = 16, 8, 2  # dedup_minhash_lsh entry defaults
    rows = k // bands

    src = _fan_out(
        docs.select(F.col("doc_id"), F.col("text").alias("__text")), "doc_id"
    )
    st_tok = _barrier(src.withColumn("__tk", T.tokens(F.col("__text")))).drop("__text")
    st_sh = _barrier(
        src.withColumn("__sh", T.shingles(F.col("__text"), shingle_k))
    ).drop("__text")
    st_hsh = _barrier(st_sh.withColumn("__hsh", hashed_shingles(F.col("__sh")))).drop(
        "__sh"
    )
    st_sig = _barrier(
        st_hsh.withColumn("__sig", minhash_signature_from_hashes(F.col("__hsh"), k))
    ).drop("__hsh")
    banded = st_sig.select(
        "doc_id",
        F.explode(
            F.when(
                F.try_element_at(F.col("__sig"), F.lit(1)) != -1,
                lsh_band_keys(F.col("__sig"), bands, rows),
            )
        ).alias("band_key"),
    )
    pairs = bucket_pairs(banded, "band_key", "doc_id", "doc_a", "doc_b")

    def t(label, df):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{best:8.3f}s  {label}")

    t("scan only (doc_id, text)", src)
    t("+ tokens", st_tok)
    t("+ shingles (k=2)", st_sh)
    t("+ hashed_shingles (md5+conv per shingle)", st_hsh)
    t("+ 16 affine mins (signature)", st_sig)
    t("+ band keys explode", banded)
    t("+ bucket collect + pair explode + distinct", pairs)


if __name__ == "__main__":
    main()
