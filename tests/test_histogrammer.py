"""Single-pass histogrammer unit tests against numpy.histogram."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bambooanalysis_spark.plans import (
    CutFlowReport,
    EquidistantBinning,
    Plot,
    Selection,
    VariableBinning,
    run_analysis,
)
from bambooanalysis_spark.plans.histogrammer import cutflow_table


@pytest.fixture(scope="module")
def values():
    rng = np.random.default_rng(7)
    return rng.uniform(-20, 120, size=500)


@pytest.fixture(scope="module")
def df(spark, values):
    return spark.createDataFrame([Row(x=float(v)) for v in values])


def _hist_dict(hist_df, plot):
    return {
        r["bin"]: (r["sumw"], r["n"])
        for r in hist_df.where(F.col("plot") == plot).collect()
    }


def test_equidistant_with_overflow(df, values):
    sel = Selection.root()
    hist = run_analysis(df, [Plot.make1D("h", F.col("x"), sel, EquidistantBinning(10, 0.0, 100.0))])
    got = _hist_dict(hist, "h")
    counts, _ = np.histogram(values, bins=10, range=(0, 100))
    for i, c in enumerate(counts):
        if c:
            assert got[i] == (pytest.approx(float(c)), c)
    assert got[-1][1] == int((values < 0).sum())  # underflow
    assert got[10][1] == int((values >= 100).sum())  # overflow
    assert sum(n for _, n in got.values()) == len(values)


def test_variable_binning(df, values):
    edges = [0.0, 5.0, 20.0, 50.0, 100.0]
    sel = Selection.root()
    hist = run_analysis(df, [Plot.make1D("hv", F.col("x"), sel, VariableBinning(edges))])
    got = _hist_dict(hist, "hv")
    counts, _ = np.histogram(values, bins=edges)
    # np.histogram makes the last bin right-inclusive; our bins are all
    # right-open, so recompute the last bin by hand
    for i, c in enumerate(counts[:-1]):
        if c:
            assert got[i][1] == c
    last = int(((values >= 50) & (values < 100)).sum())
    assert got[len(edges) - 2][1] == last


def test_multi_plot_single_pass_with_selection_and_weights(spark):
    rows = [Row(x=float(i), w=float(i % 3)) for i in range(100)]
    df = spark.createDataFrame(rows)
    root = Selection.root(weight=F.col("w"))
    sel = root.refine("big", cut=F.col("x") >= 50)
    plots = [
        Plot.make1D("all_x", F.col("x"), root, EquidistantBinning(4, 0, 100)),
        Plot.make1D("big_x", F.col("x"), sel, EquidistantBinning(2, 0, 100)),
    ]
    cfr = CutFlowReport("yields").add(root).add(sel)
    hist = run_analysis(df, plots, [cfr])
    big = _hist_dict(hist, "big_x")
    assert big[1][1] == 50
    assert big[1][0] == pytest.approx(sum(i % 3 for i in range(50, 100)))
    assert 0 not in big  # nothing below 50 passes
    cf = cutflow_table(hist, "yields", ["noSel", "big"]).collect()
    assert [r["selection"] for r in cf] == ["noSel", "big"]
    assert cf[0]["num_events"] == 100
    assert cf[1]["num_events"] == 50
    assert cf[1]["sum_weights"] == pytest.approx(sum(i % 3 for i in range(50, 100)))


def test_make2d(spark):
    rows = [Row(x=float(i % 10), y=float(i % 4)) for i in range(40)]
    df = spark.createDataFrame(rows)
    root = Selection.root()
    p = Plot.make2D(
        "xy",
        [F.col("x"), F.col("y")],
        root,
        [EquidistantBinning(10, 0, 10), EquidistantBinning(4, 0, 4)],
    )
    hist = run_analysis(df, [p])
    rows = hist.where(F.col("plot") == "xy").collect()
    assert sum(r["n"] for r in rows) == 40
    cell = {(r["bin"], r["bin2"]): r["n"] for r in rows}
    assert cell[(0, 0)] == 2  # i=0 and i=20
    assert cell[(1, 1)] == 2  # i=1 and i=21


def test_null_value_dropped(spark):
    df = spark.createDataFrame([Row(x=1.0), Row(x=None), Row(x=2.0)])
    root = Selection.root()
    hist = run_analysis(df, [Plot.make1D("h", F.col("x"), root, EquidistantBinning(4, 0, 4))])
    assert sum(r["n"] for r in hist.collect()) == 2


def test_derived_general_efficiency_and_sum(spark):
    """General DerivedPlot machinery on a toy histogram table: binomial
    efficiency errors and N-source sums over full-outer-joined bins."""
    from bambooanalysis_spark.plans.derived import derived_efficiency, derived_sum

    rows = [
        # (plot, bin, bin2, bin3, sumw, sumw2, n)
        ("den", 0, 0, 0, 100.0, 100.0, 100),
        ("den", 1, 0, 0, 50.0, 50.0, 50),
        ("num", 0, 0, 0, 25.0, 25.0, 25),
        # bin 1 missing from num -> efficiency 0; bin 2 only in num
        ("num", 2, 0, 0, 10.0, 10.0, 10),
    ]
    hist = spark.createDataFrame(
        rows, "plot string, bin int, bin2 int, bin3 int, sumw double, sumw2 double, n long"
    )
    eff = {
        r["bin"]: (r["value"], r["error"])
        for r in derived_efficiency(hist, "eff", "num", "den").collect()
    }
    assert eff[0][0] == 0.25
    assert abs(eff[0][1] - (0.25 * 0.75 / 100.0) ** 0.5) < 1e-12
    assert eff[1] == (0.0, 0.0)
    assert eff[2][0] is None  # no denominator -> undefined
    tot = {
        r["bin"]: (r["value"], r["error"])
        for r in derived_sum(hist, "tot", ["num", "den"]).collect()
    }
    assert tot[0] == (125.0, (125.0) ** 0.5)
    assert tot[1] == (50.0, 50.0 ** 0.5)
    assert tot[2] == (10.0, 10.0 ** 0.5)


def test_plot_name_with_backslash_and_quote(df, values):
    """Names are embedded in a parsed map() SQL literal; backslashes and
    quotes must survive the escaping (ADVICE r3: backslash corrupted the
    literal)."""
    sel = Selection.root()
    name = r"h\weird'name"
    hist = run_analysis(
        df, [Plot.make1D(name, F.col("x"), sel, EquidistantBinning(4, 0.0, 100.0))]
    )
    got = _hist_dict(hist, name)
    assert got, "plot name did not round-trip through the map literal"
    assert sum(n for _, n in got.values()) == len(values)


def test_constructor_built_selection_keeps_its_cut(df, values):
    """A Selection built via the public constructor (not refine()) must
    still apply its own condition (round-4 review finding: the mask
    derivation used refine()-only attributes and silently dropped it)."""
    root = Selection.root()
    s = Selection("half", F.col("x") > 50.0, F.lit(1.0), parent=root)
    hist = run_analysis(
        df, [Plot.make1D("hc", F.col("x"), s, EquidistantBinning(1, -1000.0, 1000.0))]
    )
    got = _hist_dict(hist, "hc")
    assert got[0][1] == int((values > 50.0).sum())


def test_histogrammer_codegen_at_200_plots(spark):
    """Round-5 task #7: the fused contribs projection must stay inside
    whole-stage codegen at 200 bookings. `spark.sql.codegen.fallback=false`
    turns Spark's silent interpreted fallback (measured 7x slower when it
    tripped at 62 bookings once) into a hard failure, so this test FAILS
    the moment a booking-width change pushes the generated method past the
    JVM limit instead of silently degrading."""
    df = spark.range(2000).select(
        (F.col("id") % 97).cast("double").alias("x"),
        (F.col("id") % 31).cast("double").alias("y"),
        (F.col("id") % 7).cast("double").alias("z"),
    )
    root = Selection.root()
    sels = [root]
    for i in range(4):
        sels.append(sels[-1].refine(f"s{i}", cut=F.col("x") > float(i)))
    plots = [
        Plot.make1D(
            f"p{i}",
            F.col(["x", "y", "z"][i % 3]) * float(1 + i % 5),
            sels[i % len(sels)],
            EquidistantBinning(20 + i % 3, 0.0, 100.0),
        )
        for i in range(200)
    ]
    prior = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        hist = run_analysis(df, plots)
        rows = hist.collect()  # forces execution; compile failure raises
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prior)
    assert len({r["plot"] for r in rows}) == 200
    # the projection feeding the explode really is codegen'd: the executed
    # (final) adaptive plan marks codegen stages with '*(n)'
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert "*(" in plan


def test_run_analysis_chunked_matches_fused(spark):
    """The split-into-K-jobs fallback (max_bookings_per_job) must be
    row-identical to the fused single job, cutflows included."""
    df = spark.createDataFrame(
        [Row(x=float(i % 50), w=1.0 + (i % 3)) for i in range(300)]
    )
    root = Selection.root()
    a = root.refine("a", cut=F.col("x") > 10.0, weight=F.col("w"))
    b = a.refine("b", cut=F.col("x") < 40.0)
    plots = [
        Plot.make1D(f"c{i}", F.col("x") + float(i), [root, a, b][i % 3],
                    EquidistantBinning(10, 0.0, 100.0))
        for i in range(9)
    ]
    cfr = CutFlowReport("yields").add(root, "root").add(a).add(b)
    fused = run_analysis(df, plots, [cfr])
    chunked = run_analysis(df, plots, [cfr], max_bookings_per_job=4)
    key = ["plot", "kind", "bin", "bin2", "bin3"]
    f = {tuple(r[k] for k in key): (r["sumw"], r["sumw2"], r["n"])
         for r in fused.collect()}
    c = {tuple(r[k] for k in key): (r["sumw"], r["sumw2"], r["n"])
         for r in chunked.collect()}
    assert f == c and len(f) > 0


def test_full_pass_plan_cache_matches_fresh(spark, sf_small):
    """The memoized full-pass logical plan (contract/hep._full_pass_hist)
    must produce rows identical to a from-scratch build — only plan
    CONSTRUCTION is cached; execution runs fresh per invocation."""
    from bambooanalysis_spark.analyses import define_phase2
    from bambooanalysis_spark.contract.hep import _full_pass_hist, _hep
    from bambooanalysis_spark.plans import run_analysis as fresh_run

    cached = _full_pass_hist(spark, sf_small, "phase2")
    again = _full_pass_hist(spark, sf_small, "phase2")
    assert cached is again  # same immutable logical plan object

    df, plots, cfr, _sels = define_phase2(_hep(spark, sf_small))
    fresh = fresh_run(df, plots, [cfr])
    key = ["plot", "kind", "bin", "bin2", "bin3"]
    a = {tuple(r[k] for k in key): (r["sumw"], r["n"]) for r in cached.collect()}
    b = {tuple(r[k] for k in key): (r["sumw"], r["n"]) for r in fresh.collect()}
    assert a == b and len(a) > 0


def test_run_analysis_chunked_empty_first_report(spark):
    """Review fix: a weight-0 leading unit (entry-less CutFlowReport with
    no plots) must not crash the chunk grouping."""
    df = spark.createDataFrame([Row(x=float(i)) for i in range(20)])
    root = Selection.root()
    empty = CutFlowReport("empty")
    full = CutFlowReport("yields").add(root)
    hist = run_analysis(df, [], [empty, full], max_bookings_per_job=0)
    cf = cutflow_table(hist, "yields", ["noSel"]).collect()
    assert cf[0]["num_events"] == 20
