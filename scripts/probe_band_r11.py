#!/usr/bin/env python
"""Round-11 probe: band-key encodings + stage fusion for the LSH chain
(guide §1, §2.3 narrower shuffle keys). Asserts identical pair sets."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale/sf1")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from bambooanalysis_spark.contract import read_table
    from bambooanalysis_spark.operators import text as T
    from bambooanalysis_spark.operators.dedup import (
        _barrier, _fan_out, bucket_pairs, hashed_shingles, lsh_band_keys,
        minhash_signature_from_hashes,
    )
    from bambooanalysis_spark.session import get_spark

    spark = get_spark("probe-band")
    docs = read_table(spark, SF_DIR, "documents")
    k, bands, shingle_k = 16, 8, 2
    rows = k // bands

    src = _fan_out(
        docs.select(F.col("doc_id"), F.col("text").alias("__text")), "doc_id"
    )

    def sig_3stage():
        st = _barrier(src.withColumn("__sh", T.shingles(F.col("__text"), shingle_k)))
        st = _barrier(st.withColumn("__hsh", hashed_shingles(F.col("__sh"))))
        return _barrier(
            st.withColumn("__sig", minhash_signature_from_hashes(F.col("__hsh"), k))
        )

    def sig_2stage():
        st = _barrier(
            src.withColumn(
                "__hsh", hashed_shingles(T.shingles(F.col("__text"), shingle_k))
            )
        )
        return _barrier(
            st.withColumn("__sig", minhash_signature_from_hashes(F.col("__hsh"), k))
        )

    def banded_md5(st):
        return st.select(
            "doc_id",
            F.explode(
                F.when(
                    F.try_element_at(F.col("__sig"), F.lit(1)) != -1,
                    lsh_band_keys(F.col("__sig"), bands, rows),
                )
            ).alias("band_key"),
        )

    def banded_struct(st):
        keys = F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("b"), F.slice(F.col("__sig"), b * rows + 1, rows).alias("v")
            ),
        )
        return st.select(
            "doc_id",
            F.explode(
                F.when(F.try_element_at(F.col("__sig"), F.lit(1)) != -1, keys)
            ).alias("band_key"),
        )

    variants = {
        "v1 md5-key 3stage (current)": bucket_pairs(
            banded_md5(sig_3stage()), "band_key", "doc_id", "doc_a", "doc_b"
        ),
        "v2 struct-key 3stage": bucket_pairs(
            banded_struct(sig_3stage()), "band_key", "doc_id", "doc_a", "doc_b"
        ),
        "v3 struct-key 2stage": bucket_pairs(
            banded_struct(sig_2stage()), "band_key", "doc_id", "doc_a", "doc_b"
        ),
        "v4 md5-key 2stage": bucket_pairs(
            banded_md5(sig_2stage()), "band_key", "doc_id", "doc_a", "doc_b"
        ),
    }
    for name, df in variants.items():
        df.write.format("noop").mode("overwrite").save()  # warm
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{best:8.3f}s  {name}")

    base = sorted(map(tuple, variants["v1 md5-key 3stage (current)"].collect()))
    for name in list(variants)[1:]:
        got = sorted(map(tuple, variants[name].collect()))
        assert got == base, f"{name} DIVERGES"
    print(f"# identical pair sets ({len(base)} pairs)")


if __name__ == "__main__":
    main()
