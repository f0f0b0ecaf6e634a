#!/usr/bin/env python
"""Round-11 measurement probe: the two overlapped chains of
pipeline_full_run timed SEPARATELY (guide §1) — the entry's wall is
max(hep chain, corpus chain) + assembly, so the slower chain is the
optimization target. Solo use.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import shutil

    from pyspark.sql import functions as F

    from bambooanalysis_spark.contract import pipeline as cp
    from bambooanalysis_spark.contract.hep import _hep
    from bambooanalysis_spark.contract.pipeline import _CATALOG, _corpus_mix_rows
    from bambooanalysis_spark.driver import run_pipeline
    from bambooanalysis_spark.session import get_spark
    from bambooanalysis_spark.sources.catalog import parse_catalog

    spark = get_spark("probe-pipeline")
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    # warm run (JIT, fixture memoization, page cache)
    cp.pipeline_full_run(spark, SF_DIR).count()

    # --- chain A: HEP run_pipeline (fused job + driver postprocess) ----
    hep = _hep(spark, SF_DIR)
    tagged = hep.withColumn(
        "__sample",
        F.when(F.col("event_id") % 2 == 0, "TT_FS").otherwise("TT_Delphes"),
    )
    for rep in range(2):
        out_dir = tempfile.mkdtemp(prefix="probe-pipeline-")
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription("probe: hep run_pipeline")
        run_pipeline(
            spark, "phase2", parse_catalog(_CATALOG), out_dir,
            events_tagged=tagged,
        )
        print(f"{time.perf_counter() - t0:8.3f}s  hep chain (rep {rep})")
        shutil.rmtree(out_dir, ignore_errors=True)

    # --- chain B: corpus mix ------------------------------------------
    for rep in range(2):
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription("probe: corpus mix chain")
        _corpus_mix_rows(spark, SF_DIR)
        print(f"{time.perf_counter() - t0:8.3f}s  corpus chain (rep {rep})")

    # --- whole entry (bench analog) -----------------------------------
    for rep in range(2):
        t0 = time.perf_counter()
        cp.pipeline_full_run(spark, SF_DIR).count()
        print(f"{time.perf_counter() - t0:8.3f}s  pipeline_full_run (rep {rep})")


if __name__ == "__main__":
    main()
