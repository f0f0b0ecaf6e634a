#!/usr/bin/env python
"""Bloom probe mode crossover (round 10): measure broadcast vs shuffle
probe cost as the filter grows, instead of hard-coding the auto
threshold (the §48 lesson: the judge-guessed PQ crossover was off 4x;
measure, then set the default).

Fixture: 1M member keys build the filter (k=4), a 2M-key corpus (50%
members) is probed once per mode per m. The word table has
min(m/63, ~set-bit count) rows — at small m it is dense and tiny, at
large m it approaches 4M rows / tens of MB, which is where k broadcast
copies should lose to the partitioned join.

    python scripts/bench_bloom_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from bambooanalysis_spark.operators.membership import (
        bloom_build,
        bloom_might_contain,
    )
    from bambooanalysis_spark.session import get_spark

    spark = get_spark("bloom-crossover")
    n_members, n_probe = 1_000_000, 2_000_000
    members = spark.range(n_members).select(
        F.concat(F.lit("k"), F.col("id")).alias("fp")
    )
    probe = spark.range(n_probe).select(
        F.concat(F.lit("k"), F.col("id")).alias("fp")
    )
    probe.count()  # warm page cache / codegen

    for log_m in (22, 24, 26, 28):
        m = 1 << log_m
        filt = bloom_build(members, "fp", m_bits=m, k=4).persist()
        words = filt.count()
        out = {"m_bits_log2": log_m, "word_rows": words,
               "word_mb": round(words * 12 / 1e6, 1)}
        for mode in ("broadcast", "shuffle"):
            probed = bloom_might_contain(
                probe, filt, "fp", probe_mode=mode
            )
            probed.where("might_contain").count()  # warm
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                n_hit = probed.where("might_contain").count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[mode] = round(best, 3)
            out["hits"] = n_hit
        filt.unpersist()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
