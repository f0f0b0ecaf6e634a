"""Golden-output tests: the Spark engine's phaseII / jet_test results vs the
independent numpy/pandas oracle on the sf0.001 fixture (FIXTURES.md B.3)."""

import pytest
from pyspark.sql import functions as F

from bambooanalysis_spark.analyses import define_jet_test, define_phase2
from bambooanalysis_spark.plans import run_analysis
from bambooanalysis_spark.plans.histogrammer import cutflow_table
from bambooanalysis_spark.sources import build_hep_events

from . import hep_numpy as oracle


@pytest.fixture(scope="module")
def hep_df(spark, sf_small):
    return build_hep_events(spark, sf_small)


@pytest.fixture(scope="module")
def oracle_events(sf_small):
    return oracle.load_events(sf_small)


def test_fixture_shape(hep_df, oracle_events):
    n = hep_df.count()
    assert n == len(oracle_events)
    row = hep_df.orderBy("event_id").first()
    ev = oracle_events[row["event_id"]]
    assert [o["pt"] for o in ev["muon"]] == pytest.approx([m["pt"] for m in row["muon"]])
    assert row["metpuppi"]["pt"] == pytest.approx(ev["met"])


def test_phase2_cutflow_golden(hep_df, oracle_events):
    df, plots, cfr, sels = define_phase2(hep_df)
    hist = run_analysis(df, plots, [cfr])
    order = ["noSel", "nmumu", "InvM", "njet", "btag", "MET"]
    got = {r["selection"]: (r["num_events"], r["sum_weights"]) for r in cutflow_table(hist, "yields", order).collect()}
    expect, _ = oracle.phase2_cutflow_and_masses(oracle_events)
    for name in order:
        n_exp = expect[name]
        if n_exp == 0:
            assert name not in got or got[name][0] == 0
        else:
            assert got[name][0] == n_exp, f"{name}: {got.get(name)} != {n_exp}"
            assert got[name][1] == pytest.approx(float(n_exp))  # unit weights
    # monotone non-increasing yields (phaseII-analysis.py:190-199 invariant)
    seq = [expect[n] for n in order]
    assert all(a >= b for a, b in zip(seq, seq[1:]))


def test_phase2_invmass_histogram_golden(hep_df, oracle_events):
    df, plots, cfr, sels = define_phase2(hep_df)
    hist = run_analysis(df, plots, [cfr])
    got = {
        r["bin"]: r["n"]
        for r in hist.where(F.col("plot") == "InvMassTwoMuonsSel1").collect()
    }
    _, masses = oracle.phase2_cutflow_and_masses(oracle_events)
    expect = oracle.histogram_eqb(masses, 30, 0.0, 300.0)
    assert got == expect


def test_phase2_plot_count(hep_df):
    df, plots, cfr, sels = define_phase2(hep_df)
    assert len(plots) == 61  # phaseII-analysis.py books 61 1D plots
    assert len(cfr.entries) == 6
    assert len(sels) == 6


def test_jet_test_cutflow_golden(hep_df, oracle_events):
    df, plots, cfr, sels = define_jet_test(hep_df)
    assert len(plots) == 66  # jet_test.py books 66 1D plots
    assert len(sels) == 52  # 51 refines + noSel (SURVEY.md §2.6)
    hist = run_analysis(df, plots, [cfr])
    order = ["noSel", "nJet30", "nJet50", "nJet100"]
    got = {r["selection"]: r["num_events"] for r in cutflow_table(hist, "yields", order).collect()}
    expect = oracle.jet_test_cutflow(oracle_events)
    for name in order:
        assert got.get(name, 0) == expect[name], name


def test_nosel_histograms_cover_all_events(hep_df, oracle_events):
    df, plots, cfr, sels = define_phase2(hep_df)
    hist = run_analysis(df, plots, [cfr])
    tot = (
        hist.where(F.col("plot") == "METptNoSel")
        .agg(F.sum("n").alias("s"))
        .collect()[0]["s"]
    )
    assert tot == len(oracle_events)


def test_jet_test_histograms_golden(hep_df, oracle_events):
    """Three representative jet_test plots (count, leading-pt under >=1
    selection, subleading-eta under >=2 selection) bin-exact vs numpy."""
    df, plots, cfr, sels = define_jet_test(hep_df)
    wanted = {"nJets_jetPT_30GeV", "Jet1_pT_jetPT_30GeV", "Jet2_eta_jetPT_50GeV"}
    hist = run_analysis(df, [p for p in plots if p.name in wanted])
    got = {}
    for r in hist.collect():
        got.setdefault(r["plot"], {})[r["bin"]] = r["n"]
    expect = oracle.jet_test_histograms(oracle_events)
    for name in wanted:
        assert got.get(name, {}) == expect[name], name


def test_jet_test_all_66_plots_golden(hep_df, oracle_events):
    """EVERY jet_test plot bin-exact vs the independent numpy oracle — the
    full 66-plot surface from ONE single-pass Spark job, not a sample."""
    df, plots, cfr, sels = define_jet_test(hep_df)
    hist = run_analysis(df, plots, [cfr])
    got = {}
    for r in hist.where(F.col("kind") == "plot").collect():
        got.setdefault(r["plot"], {})[r["bin"]] = r["n"]
    expect = oracle.jet_test_all_histograms(oracle_events)
    assert len(expect) == 66
    mismatches = [
        name for name in expect if got.get(name, {}) != expect[name]
    ]
    assert not mismatches, mismatches[:5]
    # no plot outside the booked set sneaks into the output
    assert set(got) <= set(expect)


def test_phase2_all_61_plots_golden(hep_df, oracle_events):
    """EVERY phaseII plot bin-exact vs the independent numpy oracle — the
    full 61-plot flagship surface from ONE single-pass Spark job."""
    df, plots, cfr, sels = define_phase2(hep_df)
    hist = run_analysis(df, plots, [cfr])
    got = {}
    for r in hist.where(F.col("kind") == "plot").collect():
        got.setdefault(r["plot"], {})[r["bin"]] = r["n"]
    expect = oracle.phase2_all_histograms(oracle_events)
    assert len(expect) == 61
    mismatches = [name for name in expect if got.get(name, {}) != expect[name]]
    assert not mismatches, mismatches[:5]
    assert set(got) <= set(expect)
