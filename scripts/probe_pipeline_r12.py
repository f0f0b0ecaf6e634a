#!/usr/bin/env python
"""Round-12 probe: phase split of pipeline_full_run's corpus chain
(_corpus_mix_rows) — where do the ~14 s sf1 go?

Phases timed separately (each from its own checkpointed input, so a
phase pays only its own jobs):
  sig+pairs — LSH signature chain -> star pairs (localCheckpoint)
  cc        — connected components over the checkpointed pairs
  keepbest  — cluster join + keep-best window + bk persist fill (count)
  stat_bk   — the dedup_best stat aggregate over the filled persist
  mix+stat  — token_budget_mix + materialize + the token_mix stat

Then the whole entry (pipeline_full_run, bench methodology) for the
composite number.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale/sf1")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from bambooanalysis_spark.contract import read_table
    from bambooanalysis_spark.contract.mixsql import SRC_WEIGHTS
    from bambooanalysis_spark.operators.dedup import (
        connected_components, keep_best_per_cluster, minhash_lsh_pairs,
    )
    from bambooanalysis_spark.operators.sampling import (
        materialize_token_mix, token_budget_mix,
    )
    from bambooanalysis_spark.session import get_spark

    spark = get_spark("probe-pipeline-r12")
    docs = read_table(spark, SF_DIR, "documents")
    docs.count()  # warm page cache

    def phase(label, fn, n=2):
        out, best = None, None
        for i in range(n + 1):  # first draw = warm-up
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            if i:
                best = dt if best is None else min(best, dt)
        print(f"{best:8.3f}s  {label}")
        return out

    dt = docs.select("doc_id", "text")
    pairs = phase(
        "sig+pairs",
        lambda: minhash_lsh_pairs(
            dt, "doc_id", "text", k=16, bands=8, shingle_k=3, max_bucket=1
        ).localCheckpoint(eager=True),
    )
    nodes = dt.select("doc_id").localCheckpoint(eager=True)
    clusters = phase(
        "cc", lambda: connected_components(pairs, nodes, "doc_id")
    )
    clusters = clusters.localCheckpoint(eager=True)

    def keepbest():
        best = keep_best_per_cluster(
            clusters.select("doc_id", "cluster_id").join(
                docs.select(
                    "doc_id", "source",
                    F.col("n_chars").cast("long").alias("n_tok"),
                ),
                "doc_id",
            ),
            "cluster_id", "n_tok", "doc_id",
        )
        bk = best.where(F.col("kept_best_i") == 1).select(
            "doc_id", "source", "n_tok"
        ).persist()
        bk.count()
        return bk

    bks = []
    bk = phase("keepbest+bk fill", lambda: (bks.append(keepbest()), bks[-1])[1])
    for extra in bks[:-1]:
        extra.unpersist()

    def stat(df, cond):
        return df.agg(
            F.count(F.when(cond, True)),
            F.coalesce(F.sum(F.when(cond, F.col("n_tok"))), F.lit(0)),
        ).collect()[0]

    phase("stat_bk", lambda: stat(bk, F.lit(True)))

    def mixstat():
        alloc = token_budget_mix(
            bk, "source", "n_tok", budget=60_000, weights=SRC_WEIGHTS,
            ratio_scale=10_000,
        )
        mixed = materialize_token_mix(
            bk, alloc, "source", "n_tok", "doc_id", salt="p50"
        )
        return stat(mixed, F.col("kept_i") == 1)

    phase("mix+stat", mixstat)
    bk.unpersist()

    # HEP side solo (fused histogrammer job + driver-side postprocess)
    import shutil
    import tempfile

    from bambooanalysis_spark.contract.pipeline import (
        _CATALOG, pipeline_full_run,
    )
    from bambooanalysis_spark.contract.hep import _hep
    from bambooanalysis_spark.driver import run_pipeline
    from bambooanalysis_spark.sources.catalog import parse_catalog

    hep = _hep(spark, SF_DIR)
    tagged = hep.withColumn(
        "__sample",
        F.when(F.col("event_id") % 2 == 0, "TT_FS").otherwise("TT_Delphes"),
    )

    def hep_solo():
        out_dir = tempfile.mkdtemp(prefix="probe-hep-")
        try:
            run_pipeline(spark, "phase2", parse_catalog(_CATALOG), out_dir,
                         events_tagged=tagged)
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    phase("hep chain solo", hep_solo)

    # whole entry, bench methodology
    pipeline_full_run(spark, SF_DIR).count()  # warm
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        pipeline_full_run(spark, SF_DIR).count()
        d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
    print(f"{best:8.3f}s  pipeline_full_run (entry)")


if __name__ == "__main__":
    main()
