#!/usr/bin/env python
"""Capture .explain('formatted') BEFORE/AFTER plans for the round-11
optimization targets (plans/r11/<query>_{before,after}.txt).

Usage: python scripts/capture_plans_r11.py before|after [name ...]
Driver-side only (no jobs beyond tiny fixture reads already memoized).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r11")


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    from bambooanalysis_spark.session import get_spark

    spark = get_spark("plan-capture-r11")

    def targets():
        from bambooanalysis_spark.contract import approx as ca
        from bambooanalysis_spark.contract import crawl as cc
        from bambooanalysis_spark.contract import extensions as ce

        yield "dedup_jaccard", lambda: ce.q_dedup_jaccard_pairs(spark, SF_DIR)
        yield "decontaminate", lambda: ce.q_pretrain_decontamination(spark, SF_DIR)
        yield "dedup_minhash_lsh", lambda: ce.q_dedup_minhash_lsh_pairs(spark, SF_DIR)
        yield (
            "crawl_stage_frames",
            lambda: cc.crawl_stage_frames(
                spark, cc.crawl_fixture_dir(spark, SF_DIR) + "/*.wet.gz"
            ),
        )
        yield "bigram_coherence", lambda: ce.q_text_bigram_coherence(spark, SF_DIR)
        yield "nb_predict", lambda: ca.q_text_nb_predict(spark, SF_DIR)
        yield "bloom_probe", lambda: ca.q_dedup_bloom_membership(spark, SF_DIR)
        yield "winnow_arrow", lambda: ca.q_text_winnow_fingerprints_arrow(
            spark, SF_DIR
        )
        # near_dup_clusters' iterative CC cannot be captured as one plan;
        # its last-round label aggregation is what explain() shows
        yield "dedup_clusters_capped", lambda: ce.q_dedup_near_dup_clusters(
            spark, SF_DIR
        )

    os.makedirs(OUT, exist_ok=True)
    for name, fn in targets():
        if only and name not in only:
            continue
        try:
            plan = fn()._sc._jvm.PythonSQLUtils.explainString(
                fn()._jdf.queryExecution(), "formatted"
            )
        except Exception:
            df = fn()
            plan = df._sc._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
