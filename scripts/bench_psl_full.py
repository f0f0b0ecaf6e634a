#!/usr/bin/env python
"""Real-PSL-scale plan-cost pin (VERDICT r9 next #4).

Round 9 measured registered_domain_from with a planted depth-3 list
(8 probe joins). The full Mozilla PSL is ~9k rules at depth 5 -> 14
probe joins (5 exact + 5 exception + 4 wildcard). This measures that
flat plan cost at sf0.1 / sf1 with a deterministic synthetic 9k-rule
depth-5 list (scripts/psl_synth.py — network access is blocked, so
the real list file is out of reach; the synthetic one has the same
rule-count/depth/grammar shape, which is what prices the plan).

Hosts: a 1000-host pool with the fixture's class mix, attached to the
documents corpus by doc_id % 1000 through a broadcast join, so the
probed side is corpus-sized and distributed.

    python scripts/bench_psl_full.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import psl_synth
from pyspark.sql import functions as F


def run(spark, sf_dir: str, rules: list[str]) -> dict:
    from bambooanalysis_spark.operators.urlops import registered_domain_from

    psl = spark.createDataFrame([(r,) for r in rules], "suffix string")
    pool = psl_synth.make_hosts(rules, 1000)
    pool_df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(pool)], "hid long, host string"
    )
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", (F.col("doc_id") % 1000).alias("hid"))
        .join(F.broadcast(pool_df), "hid")
        .select("doc_id", "host")
    )

    out = registered_domain_from(docs, psl)
    plan = out._jdf.queryExecution().executedPlan().toString()
    counters = {
        c: plan.count(c)
        for c in ("BroadcastHashJoin", "Exchange", "ArrowEvalPython",
                  "BatchEvalPython", "SortMergeJoin")
    }

    agg = out.groupBy("registered_domain").count()
    agg.count()  # warm-up
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        n_dom = agg.count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return {
        "sf_dir": sf_dir,
        "n_rules": len(rules),
        "max_depth": max(r.lstrip("!*.").count(".") + 1 for r in rules),
        "distinct_domains": n_dom,
        "plan": counters,
        "warm_best3_sec": round(best, 3),
    }


def main() -> None:
    from bambooanalysis_spark.session import get_spark

    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    rules = psl_synth.make_psl()
    spark = get_spark("psl-full-bench")
    for d in dirs:
        print(json.dumps(run(spark, d, rules)))


if __name__ == "__main__":
    main()
