"""Catalog + normalization + report layer tests (SURVEY.md §1.5, §2.11)."""

import math

import pandas as pd
import pytest

from bambooanalysis_spark.report import (
    cutflow_efficiencies,
    cutflow_png,
    data_mc_ratio,
    normalize_histograms,
    stack_by_group,
    yields_table_tex,
)
from bambooanalysis_spark.sources.catalog import Sample, parse_catalog

# mirrors jet_test.yml / phaseII-analysis-FS.yml structure
CFG = {
    "tree": "myana/mytree",
    "eras": {"HL-LHC": {"luminosity": 3000000}},
    "samples": {
        "TT_FS": {
            "era": "HL-LHC",
            "type": "MC",
            "group": "FS",
            "files": ["a.parquet", "b.parquet"],
            "generated-events": 1000000,
            "cross-section": 950.0,
        },
        "DY_Delphes": {
            "era": "HL-LHC",
            "type": "SIGNAL",
            "group": "Delphes",
            "files": ["c.parquet"],
            "generated-events": "genEvents",
            "cross-section": 5620.0,
            "stack-index": 1,
        },
        "obs": {"era": "HL-LHC", "type": "DATA", "files": ["d.parquet"]},
    },
    "plotIt": {"plotdefaults": {"log-y": True, "show-overflow": True}},
}


def test_catalog_parse_and_scale():
    cat = parse_catalog(CFG)
    assert cat.tree == "myana/mytree"
    assert cat.luminosity("HL-LHC") == 3000000
    # lumi * xsec / genEvents (phaseII-analysis.py:210-217)
    assert cat.scale("TT_FS") == pytest.approx(3000000 * 950.0 / 1000000)
    # counter-name resolution (phaseII-analysis.py:212-216)
    assert cat.scale("DY_Delphes", {"genEvents": 2_000_000.0}) == pytest.approx(
        3000000 * 5620.0 / 2_000_000
    )
    with pytest.raises(KeyError):
        cat.scale("DY_Delphes", {})
    # DATA never scaled
    assert cat.scale("obs") == 1.0
    assert cat.samples["DY_Delphes"].stack_index == 1


def test_cutflow_efficiencies():
    cf = pd.DataFrame(
        {
            "selection": ["noSel", "nmumu", "InvM"],
            "num_events": [1000, 100, 80],
            "sum_weights": [1000.0, 100.0, 80.0],
        }
    )
    out = cutflow_efficiencies(cf, gen_events=2000.0)
    assert math.isnan(out["eff_pct"][0]) or out["eff_pct"][0] is None
    assert out["eff_pct"][1] == pytest.approx(10.0)
    assert out["eff_pct"][2] == pytest.approx(80.0)
    assert out["total_eff_pct"][2] == pytest.approx(4.0)


def test_normalize_and_stack():
    h = pd.DataFrame({"plot": ["m", "m"], "bin": [0, 1], "sumw": [10.0, 20.0], "sumw2": [10.0, 20.0], "n": [10, 20]})
    normalized = normalize_histograms({"TT_FS": h, "TT2": h}, {"TT_FS": 2.0, "TT2": 3.0})
    assert set(normalized["sample"]) == {"TT_FS", "TT2"}
    row = normalized[(normalized["sample"] == "TT_FS") & (normalized["bin"] == 0)].iloc[0]
    assert row["sumw"] == 20.0 and row["sumw2"] == 40.0
    stacked = stack_by_group(normalized, {"TT_FS": "tt", "TT2": "tt"})
    srow = stacked[stacked["bin"] == 0].iloc[0]
    assert srow["sumw"] == 20.0 + 30.0


def test_data_mc_ratio_formula():
    # phaseII-analysis.py:146-152
    ratio, err = data_mc_ratio(90.0, 100.0, 3.0, 4.0, 1.0)
    assert ratio == pytest.approx(0.9)
    expect = math.sqrt(100.0**2 * 3.0**2 + 90.0**2 * (4.0**2 + 1.0**2)) / 100.0**2
    assert err == pytest.approx(expect)


def test_yields_tex_and_png(tmp_path):
    y = pd.DataFrame(
        {
            "selection": ["Sel0: No selection", "Sel1: nMuMu >= 2"],
            "TT_FS": [1000.0, 100.0],
            "DY_Delphes": [500.0, 50.0],
        }
    )
    tex = yields_table_tex(y, ["TT_FS", "DY_Delphes"], signal_xsec={"DY_Delphes": 5620.0})
    assert r"TT\_FS" in tex
    assert r"\sigma = 5620" in tex
    assert "1000.00" in tex
    cf = pd.DataFrame(
        {"selection": ["noSel", "sel1"], "sum_weights": [1000.0, 100.0]}
    )
    p = cutflow_png({"FS": cf, "Delphes": cf}, str(tmp_path / "cutflow.png"))
    import os

    assert os.path.getsize(p) > 0


def test_write_plotit_yml_and_era_split(tmp_path, spark):
    from pyspark.sql import functions as F

    from bambooanalysis_spark.plans import EquidistantBinning, Plot, Selection
    from bambooanalysis_spark.report.postprocess import (
        split_reports_by_era,
        write_plotit_yml,
    )

    cat = parse_catalog(CFG)
    root = Selection.root()
    plots = [
        Plot.make1D("METpt", F.lit(0.0), root, EquidistantBinning(50, 0.0, 250.0), title="MET"),
    ]
    p = write_plotit_yml(
        plots, cat, str(tmp_path / "plots.yml"), counters={"DY_Delphes": {"genEvents": 2e6}}
    )
    text = open(p).read()
    assert "METpt" in text and "cross-section" in text and "3000000" in text

    cf = pd.DataFrame({"selection": ["noSel"], "sum_weights": [1.0]})
    split = split_reports_by_era({"TT_FS": cf, "obs": cf}, cat, mode="all")
    assert "HL-LHC" in split and "combined" in split
    assert set(split["combined"]) == {"TT_FS", "obs"}


def test_validate_catalog_header_level(tmp_path):
    """Pre-flight catalog validation (round-5): compressed ROOT files
    validate header-only via sniff_file; wrong tree names, missing files,
    unreadable parquet and file-less samples are each flagged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bambooanalysis_spark.sources import minroot
    from bambooanalysis_spark.sources.catalog import parse_catalog, validate_catalog

    good_root = str(tmp_path / "good.root")
    minroot.write_flat_tree(
        good_root, "myana/mytree", {"x": ("D", [1.0] * 500)}, compress=6
    )
    good_pq = str(tmp_path / "good.parquet")
    pq.write_table(pa.table({"a": [1, 2]}), good_pq)
    bad_pq = str(tmp_path / "bad.parquet")
    open(bad_pq, "wb").write(b"not parquet")

    cat = parse_catalog({
        "tree": "myana/mytree",
        "eras": {"e": {"luminosity": 1.0}},
        "samples": {
            "ok_root": {"era": "e", "files": [good_root]},
            "ok_pq": {"era": "e", "files": [good_pq]},
            "wrong_tree": {"era": "e", "files": [good_root]},
            "gone": {"era": "e", "files": [str(tmp_path / "nope.root")]},
            "empty": {"era": "e"},
            "badpq": {"era": "e", "files": [bad_pq]},
        },
    })
    probs = validate_catalog(cat)
    assert "ok_root" not in probs and "ok_pq" not in probs
    assert any("missing file" in p for p in probs["gone"])
    assert probs["empty"] == ["no files listed"]
    assert any("parquet" in p for p in probs["badpq"])
    # wrong tree: same files, different requested tree
    probs2 = validate_catalog(cat, tree="other/tree")
    assert any("not declared" in p for p in probs2["wrong_tree"])


def test_validate_catalog_treeless_root_file(tmp_path):
    """Round-6 (advisor): a ROOT file declaring NO trees at all
    (histogram-only or wrong file) must be flagged when a tree is
    requested — previously it passed tree validation silently."""
    import struct

    from bambooanalysis_spark.sources import minroot as mr
    from bambooanalysis_spark.sources.catalog import parse_catalog, validate_catalog

    # hand-lay a valid header + a single non-tree key (a histogram)
    path = str(tmp_path / "histsonly.root")
    out = bytearray(b"\x00" * mr.FBEGIN)
    out += mr._pack_key("TH1F", "h_pt", "a histogram", mr.FBEGIN, b"\x00" * 16)
    fend = len(out)
    header = mr.MAGIC + struct.pack(
        ">iiiiiiiBiii", mr._FILE_VERSION, mr.FBEGIN, fend, fend, 0, 0, 0, 4, 0, 0, 0
    )
    header += struct.pack(">h", 1) + b"\x00" * 16
    out[: len(header)] = header
    open(path, "wb").write(bytes(out))

    info = mr.sniff_file(path)
    assert not info["trees"] and not info["branches"]  # precondition

    cat = parse_catalog({
        "tree": "myana/mytree",
        "eras": {"e": {"luminosity": 1.0}},
        "samples": {"hists": {"era": "e", "files": [path]}},
    })
    probs = validate_catalog(cat)
    assert any("no trees found" in p for p in probs.get("hists", []))


def test_write_histograms_pdf_empty_slice_schema(spark, tmp_path):
    """Review fix: an empty per-sample aggregate slice must still write a
    Spark-readable parquet (object columns as string, not null type)."""
    import pandas as pd

    from bambooanalysis_spark.report.postprocess import write_histograms_pdf

    empty = pd.DataFrame({
        "plot": pd.Series(dtype=object), "kind": pd.Series(dtype=object),
        "bin": pd.Series(dtype="int32"), "bin2": pd.Series(dtype="int32"),
        "bin3": pd.Series(dtype="int32"), "sumw": pd.Series(dtype="float64"),
        "sumw2": pd.Series(dtype="float64"), "n": pd.Series(dtype="int64"),
    })
    path = write_histograms_pdf(empty, str(tmp_path), "void")
    back = spark.read.parquet(path)
    assert back.count() == 0
    assert dict(back.dtypes)["plot"] == "string"
