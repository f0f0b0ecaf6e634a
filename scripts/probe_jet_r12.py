#!/usr/bin/env python
"""Round-12 probe: split jet_test_full_pass (guide §1.4 noop sink) and
race the packed-aggregation-key fill variant.

Splits, each timed solo (warm best-of-2):
  masks    — every __mask/__val column projected, noop sink (the
             selection/value DAG without the fill)
  fill     — the full 66-plot + 4-counter fused job (current shape)
  packed   — same contribs, but (pid, bin) packed into ONE long key for
             the Generate+aggregate, unpacked post-agg (rows asserted
             identical to `fill`)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale/sf1")

from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, n=2):
    fn()  # warm
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{best:8.3f}s  {label}")
    return best


def main() -> None:
    from bambooanalysis_spark.analyses import define_jet_test
    from bambooanalysis_spark.contract.hep import _hep
    from bambooanalysis_spark.plans import run_analysis
    from bambooanalysis_spark.plans.histogrammer import (
        _CUTFLOW_BIN, _materialize_dag,
    )
    from bambooanalysis_spark.session import get_spark

    spark = get_spark("probe-jet-r12")
    hep = _hep(spark, SF_DIR)
    hep.count()  # fill the fixture cache outside every timing

    df0, plots, cfr, _sels = define_jet_test(hep)

    # --- masks+vals only ---------------------------------------------------
    sels = [p.selection for p in plots] + [s for (s, _t) in cfr.entries]
    mdf, mask_names = _materialize_dag(df0, sels)
    mask_cols = sorted({c for pair in mask_names.values() for c in pair})
    timed("masks+weights only", lambda: noop(mdf.select(*mask_cols)))

    # --- current full fill ---------------------------------------------------
    hist = run_analysis(df0, plots, [cfr])
    timed("fill (current)", lambda: noop(hist))

    # --- packed-key fill -----------------------------------------------------
    df, mask_names2 = _materialize_dag(df0, sels)
    val_names, val_layer = {}, {}

    def val_col(expr):
        key = id(expr)
        if key not in val_names:
            name = f"__val_{len(val_names)}"
            val_names[key] = name
            val_layer[name] = expr
        return val_names[key]

    bookings, pid_name = [], []
    for p in plots:
        m, w = mask_names2[id(p.selection)]
        bins = [b.bin_sql(f"`{val_col(e)}`") for e, b in zip(p.exprs, p.binnings)]
        pid_name.append((p.name, "plot"))
        bookings.append((m, bins, w))
    for sel, _title in cfr.entries:
        m, w = mask_names2[id(sel)]
        pid_name.append((f"{cfr.name}/{sel.name}", "cutflow"))
        bookings.append((m, [str(_CUTFLOW_BIN)], w))
    if val_layer:
        df = df.withColumns(val_layer)

    structs = []
    for pid, (mask, bins, weight) in enumerate(bookings):
        b0 = f"CAST(({bins[0]}) AS INT)"
        valid = f"`{mask}` AND ({b0}) IS NOT NULL"
        key = f"(CAST({pid} AS BIGINT) * 4096 + ({b0} + 1))"
        structs.append(
            f"CASE WHEN {valid} THEN named_struct('k', {key}, "
            f"'w', CAST(`{weight}` AS DOUBLE)) END"
        )
    contribs = F.expr(
        "filter(array({}), c -> c IS NOT NULL)".format(", ".join(structs))
    )
    agg = (
        df.select(F.explode(contribs).alias("c"))
        .select("c.k", "c.w")
        .groupBy("k")
        .agg(
            F.sum("w").alias("sumw"),
            F.sum(F.col("w") * F.col("w")).alias("sumw2"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            (F.col("k") / 4096).cast("bigint").alias("pid"),
            (F.col("k") % 4096 - 1).cast("int").alias("bin"),
            "sumw", "sumw2", "n",
        )
    )
    timed("fill (packed key)", lambda: noop(agg))

    # identity: packed rows == current rows on (plot, bin) keys
    cur = {
        (r["plot"], r["bin"]): (r["sumw"], r["sumw2"], r["n"])
        for r in hist.collect()
    }
    names = {pid: name for pid, (name, _k) in enumerate(pid_name)}
    new = {
        (names[int(r["pid"])], r["bin"]): (r["sumw"], r["sumw2"], r["n"])
        for r in agg.collect()
    }
    assert cur == new, "packed fill DIVERGES"
    print("# packed fill row-identical to current")


if __name__ == "__main__":
    main()
