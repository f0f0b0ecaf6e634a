"""SparkSession factory with scale-aware defaults.

Tuned for the local[N] test harness but with settings that carry to a real
cluster: AQE on (runtime re-plan, skew-join handling, partition coalescing),
Arrow on (fast pandas interchange for the few Pandas-UDF operators), UTC
session timezone (deterministic timestamp semantics vs the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bambooanalysis_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. Shuffle partitions
    default to the core count — at 100 TB on a real cluster this would be
    sized to ~128 MB per shuffle partition instead; AQE coalescing makes the
    exact number forgiving in both regimes.

    ``master`` (or $SPARK_GRAFT_MASTER, or an externally-set spark.master —
    e.g. spark-submit) overrides the local[N] default so the same code runs
    unchanged on a cluster; all tuning confs below are suggestions that an
    existing session or submit-time conf wins over.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 4)
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # wide mask-column plans (single-pass histogrammer) make Catalyst
        # constraint propagation super-linear; the engine's plans gain
        # nothing from it
        .config("spark.sql.constraintPropagation.enabled", "false")
        # PySpark's per-call origin capture (error call sites) costs a JVM
        # round-trip for EVERY Column/function call — measured 3-5s of pure
        # driver latency building a 61-plot fused plan. Plans here are
        # machine-generated; the debug frames point at the engine, not user
        # code, so the info is worthless and the cost is not.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
        # 8g measured FASTER than 48g for these workloads (A/B: 4.8s vs
        # 29.6s warm on the phaseII pass — big-heap GC/barrier costs with
        # wide codegen dominate long before the small inputs need the room)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # every wide-codegen plan compiles fresh classes; the default 240 MB
        # JIT code cache fills after a few analyses and execution silently
        # drops to interpreter (measured bimodal 4s/39s for the same query)
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
