#!/usr/bin/env python
"""Round-11 helper: time a subset of standing bench entries with the
bench.py methodology (warm-up + best of N, .count() action). Usage:
  python scripts/bench_entries_r11.py entry1,entry2 [sf_dir] [n_timed]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    labels = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_timed = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import bench
    from bambooanalysis_spark.session import get_spark

    table = bench._headline()
    spark = get_spark("bench-subset")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    for label in labels:
        fn = table[label]
        n = fn(spark, sf_dir).count()  # warm-up
        best = None
        for _ in range(n_timed):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{best:8.3f}s  {label} ({n} rows, sf_dir={sf_dir})")


if __name__ == "__main__":
    main()
