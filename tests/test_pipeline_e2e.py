"""End-to-end two-sample pipeline — the reference's full workflow
(SURVEY.md §3): per-sample single-pass analysis -> histogram sinks +
counters -> normalization (lumi x xsec / genEvents) -> group stacking ->
yields table + cutflow report + plots.yml, like running
`bambooRun -m phaseII-analysis.py ...` followed by postProcess.
"""

import os

import pytest
from pyspark.sql import functions as F

from bambooanalysis_spark.analyses import define_phase2
from bambooanalysis_spark.plans import run_analysis
from bambooanalysis_spark.plans.histogrammer import cutflow_table
from bambooanalysis_spark.report.postprocess import (
    cutflow_efficiencies,
    cutflow_png,
    normalize_histograms,
    stack_by_group,
    write_histograms,
    write_plotit_yml,
    yields_table_tex,
)
from bambooanalysis_spark.sources import build_hep_events
from bambooanalysis_spark.sources.catalog import parse_catalog

ORDER = ["noSel", "nmumu", "InvM", "njet", "btag", "MET"]


def test_row_changing_classifier(spark, sf_small):
    """Round-6 (advisor): the fused-counter guard must catch EVERY
    row-count-changing node an analysis could add — including Generate
    (explode), Union, and Expand (rollup/cube), which the original
    substring list missed — while mask-style column adds (the contract
    shape every registered analysis follows) stay on the fused path."""
    from bambooanalysis_spark.driver import _n_row_changing

    df = build_hep_events(spark, sf_small)
    base = _n_row_changing(df)

    # contract-conformant shapes: no new row-changing nodes
    assert _n_row_changing(df.withColumn("m", F.col("event_id") % 2 == 0)) == base
    assert _n_row_changing(df.select("*", F.lit(1).alias("w"))) == base

    # row-changing shapes an analysis could sneak in
    assert _n_row_changing(df.withColumn("j", F.explode("muon"))) > base
    assert _n_row_changing(df.unionByName(df)) > base
    assert _n_row_changing(df.rollup("event_id").count()) > base
    assert _n_row_changing(df.where(F.col("event_id") > 0)) > base
    assert _n_row_changing(df.limit(5)) > base
    assert _n_row_changing(df.dropDuplicates(["event_id"])) > base

CATALOG = {
    "eras": {"HL-LHC": {"luminosity": 3000000}},
    "samples": {
        "TT_FS": {
            "era": "HL-LHC", "type": "MC", "group": "FS",
            "cross-section": 950.0, "generated-events": "nEvents",
        },
        "TT_Delphes": {
            "era": "HL-LHC", "type": "SIGNAL", "group": "Delphes",
            "cross-section": 950.0, "generated-events": "nEvents",
            "stack-index": 1,
        },
    },
    "plotIt": {"luminosity-error": 0.025},
}


@pytest.fixture(scope="module")
def pipeline_outputs(spark, sf_small, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("analysis_out"))
    cat = parse_catalog(CATALOG)
    hep = build_hep_events(spark, sf_small).cache()
    # two pseudo-samples (event parity), like the FS/Delphes pair
    samples = {
        "TT_FS": hep.where(F.col("event_id") % 2 == 0),
        "TT_Delphes": hep.where(F.col("event_id") % 2 == 1),
    }
    hists, cutflows, counters, plots_ref = {}, {}, {}, None
    for name, df in samples.items():
        counters[name] = {"nEvents": float(df.count())}
        adf, plots, cfr, _ = define_phase2(df)
        plots_ref = plots
        hist = run_analysis(adf, plots, [cfr])
        write_histograms(hist, out_dir, name)
        hists[name] = (
            spark.read.parquet(f"{out_dir}/{name}/hists.parquet")
            .where(F.col("kind") == "plot")
            .toPandas()
        )
        cutflows[name] = cutflow_table(hist, "yields", ORDER).toPandas()
    return dict(
        out_dir=out_dir, cat=cat, hists=hists, cutflows=cutflows,
        counters=counters, plots=plots_ref,
    )


def test_sinks_written(pipeline_outputs):
    o = pipeline_outputs
    for name in ("TT_FS", "TT_Delphes"):
        assert os.path.isdir(f"{o['out_dir']}/{name}/hists.parquet")
        assert len(o["hists"][name]) > 0


def test_counters_and_scales(pipeline_outputs):
    o = pipeline_outputs
    n_fs = o["counters"]["TT_FS"]["nEvents"]
    scale = o["cat"].scale("TT_FS", o["counters"]["TT_FS"])
    assert scale == pytest.approx(3000000 * 950.0 / n_fs)


def test_normalize_stack_and_yields(pipeline_outputs):
    o = pipeline_outputs
    scales = {s: o["cat"].scale(s, o["counters"][s]) for s in o["hists"]}
    normalized = normalize_histograms(o["hists"], scales)
    groups = {s: o["cat"].samples[s].group for s in o["hists"]}
    stacked = stack_by_group(normalized, groups)
    assert set(stacked["group"]) == {"FS", "Delphes"}
    # stacking preserves the (scaled) total weight
    met = normalized[normalized["plot"] == "METptNoSel"]
    assert stacked[stacked["plot"] == "METptNoSel"]["sumw"].sum() == pytest.approx(
        met["sumw"].sum()
    )

    import pandas as pd

    y = pd.DataFrame(
        {
            "selection": ORDER,
            **{
                s: [
                    float(
                        cf.loc[cf["selection"] == sel, "sum_weights"].sum()
                    ) * scales[s]
                    for sel in ORDER
                ]
                for s, cf in o["cutflows"].items()
            },
        }
    )
    tex = yields_table_tex(y, list(o["hists"]), signal_xsec={"TT_Delphes": 950.0})
    assert "\\sigma = 950" in tex and "nmumu" in tex


def test_efficiencies_and_images(pipeline_outputs, tmp_path):
    o = pipeline_outputs
    for name, cf in o["cutflows"].items():
        eff = cutflow_efficiencies(cf, gen_events=o["counters"][name]["nEvents"])
        seq = eff["sum_weights"].tolist()
        assert all(a >= b for a, b in zip(seq, seq[1:]))  # monotone
    img = cutflow_png(o["cutflows"], str(tmp_path / "cutflow.png"))
    assert os.path.getsize(img) > 0
    yml = write_plotit_yml(
        o["plots"], o["cat"], str(tmp_path / "plots.yml"), counters=o["counters"]
    )
    text = open(yml).read()
    assert "InvMassTwoMuonsSel1" in text and "luminosity-error" in text


def test_data_sample_pipeline_unscaled_with_ratio_panel(spark, sf_small, tmp_path):
    """type: DATA end-to-end (phaseII-analysis.py:76-78): the data sample
    must pass through UNSCALED (scale 1.0), never join the MC stack, and
    the rendered images must carry the data-points overlay + Data/MC ratio
    panel (reference error formula via postprocess.data_mc_ratio)."""
    from bambooanalysis_spark.driver import run_pipeline

    catalog = parse_catalog(
        {
            "eras": {"HL-LHC": {"luminosity": 3000000}},
            "samples": {
                "DoubleMuon": {"era": "HL-LHC", "type": "DATA", "group": "data"},
                "TT_FS": {
                    "era": "HL-LHC", "type": "MC", "group": "FS",
                    "cross-section": 950.0, "generated-events": "nEvents",
                },
                "TT_Delphes": {
                    "era": "HL-LHC", "type": "SIGNAL", "group": "Delphes",
                    "cross-section": 950.0, "generated-events": "nEvents",
                },
            },
        }
    )
    hep = build_hep_events(spark, sf_small)
    tagged = hep.withColumn(
        "__sample",
        F.when(F.col("event_id") % 3 == 0, "DoubleMuon")
        .when(F.col("event_id") % 3 == 1, "TT_FS")
        .otherwise("TT_Delphes"),
    )
    out_dir = str(tmp_path / "data_mc_out")
    m = run_pipeline(spark, "phase2", catalog, out_dir, events_tagged=tagged)

    # data is unscaled; MC is lumi*xsec/nEvents scaled
    assert m["scales"]["DoubleMuon"] == 1.0
    assert m["scales"]["TT_FS"] > 1.0
    # the MC stack has no data group; the data series exists separately
    assert "data" not in set(m["stacked"]["group"])
    ds = m["data_series"]
    assert ds is not None and len(ds) > 0
    # unit weights + scale 1.0 -> data sumw stays the raw event count
    assert (ds["sumw"] == ds["n"]).all()

    # images carry the overlay + ratio panel (SVG fallback in this env)
    import pathlib

    some = [p for p in m["plot_images"].values() if p.endswith(".svg")]
    assert some, m["plot_images"]
    svg = pathlib.Path(some[0]).read_text()
    assert "data-point" in svg and "ratio-point" in svg and "Data/MC" in svg
