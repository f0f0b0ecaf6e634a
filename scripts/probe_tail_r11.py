#!/usr/bin/env python
"""Round-11 probe: phase breakdown of embedding_kmeans and ann_ivf_pq
(guide §1). Times fit init / each Lloyd iteration / final assign, and the
PQ build / shortlist / rerank stages, with the bench's warm methodology.
Solo use.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from bambooanalysis_spark.contract.approx import q_ann_ivf_pq_topk
    from bambooanalysis_spark.contract.extensions import _emb, q_embedding_kmeans
    from bambooanalysis_spark.operators.similarity import (
        _int_cell_scores, kmeans_assign_int8, quantize_int8,
    )
    from bambooanalysis_spark.session import get_spark

    spark = get_spark("probe-tail")
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    q_embedding_kmeans(spark, SF_DIR).count()  # warm

    for rep in range(2):
        emb = _emb(spark, SF_DIR)
        t0 = time.perf_counter()
        qz = quantize_int8(emb, "vec_id", "embedding").select("vec_id", "qvec")
        qz = qz.persist(StorageLevel.MEMORY_AND_DISK)
        init_rows = qz.orderBy("vec_id").limit(8).collect()
        cents = [(i, [int(x) for x in r["qvec"]]) for i, r in enumerate(init_rows)]
        t1 = time.perf_counter()
        print(f"{t1 - t0:8.3f}s  kmeans init collect (rep {rep})")
        dim = len(cents[0][1])
        for it in range(2):
            cell = F.array_max(_int_cell_scores("qvec", cents))["cid"]
            stats = (
                qz.select(cell.alias("cell"), "qvec")
                .groupBy("cell")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    *[
                        F.sum(
                            F.try_element_at("qvec", F.lit(i + 1)).cast("long")
                        ).alias(f"s{i}")
                        for i in range(dim)
                    ],
                )
                .collect()
            )
            cents = [
                (int(r["cell"]), [int(r[f"s{i}"]) // int(r["n"]) for i in range(dim)])
                for r in sorted(stats, key=lambda r: r["cell"])
            ]
            t2 = time.perf_counter()
            print(f"{t2 - t1:8.3f}s  kmeans iter {it} (rep {rep})")
            t1 = t2
        out = kmeans_assign_int8(emb, cents).select("vec_id", "cell")
        out.write.format("noop").mode("overwrite").save()
        qz.unpersist()
        t3 = time.perf_counter()
        print(f"{t3 - t1:8.3f}s  kmeans final assign noop (rep {rep})")

    q_ann_ivf_pq_topk(spark, SF_DIR).count()  # warm
    for rep in range(2):
        t0 = time.perf_counter()
        q_ann_ivf_pq_topk(spark, SF_DIR).count()
        print(f"{time.perf_counter() - t0:8.3f}s  ann_ivf_pq whole entry (rep {rep})")


if __name__ == "__main__":
    main()
