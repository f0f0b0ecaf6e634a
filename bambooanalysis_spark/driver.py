"""End-to-end pipeline driver — the ``bambooRun`` analog (SURVEY.md §3).

The reference's primary entry point is one command
(``bambooRun -m phaseII-analysis.py config.yml -o out/`` —
/root/reference/README.md:63-75): load the YAML sample catalog, run the
analysis module once per sample, write per-sample histogram outputs, then
post-process (cutflow report, yields table, plot config, images —
phaseII-analysis.py:270-286). This module wires the already-tested pieces
(catalog, single-pass histogrammer, report writers) into that one command:

    python -m bambooanalysis_spark run phase2 catalog.yml -o out/

Scale notes: the per-sample analysis is the single-shuffle fused pass
(plans/histogrammer.py) — the only full-data jobs. Everything after
consumes #plots x #bins aggregate rows per sample (driver-side pandas),
exactly the reference's division of labor where plotIt and
printCutFlowReports operate on saved histograms, not events.
"""

from __future__ import annotations

import importlib.util
import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analyses import define_jet_test, define_phase2
from .plans import run_analysis
from .report.postprocess import (
    cutflow_efficiencies,
    cutflow_png,
    normalize_histograms,
    stack_by_group,
    write_histograms,
    write_histograms_pdf,
    write_plotit_yml,
    yields_table_tex,
)
from .sources.catalog import Catalog, Sample, load_catalog, merge_counters

# Built-in analysis modules (the reference ships two — README.md:24-28).
ANALYSES: dict[str, Callable] = {
    "phase2": define_phase2,
    "jet_test": define_jet_test,
}


# Logical-plan node kinds that change row counts. Used by run_pipeline to
# decide whether an analysis broke the mask-based contract (selections are
# boolean Columns over the SAME DataFrame — SURVEY §2.6) and the fused
# input-event counter would therefore miscount genEvents. "Union " matters
# even though the multi-sample input is itself a Union: the comparison is
# analysis-plan count MINUS input-plan count, so baseline nodes cancel and
# only analysis-ADDED ones trip the fallback. "Generate " (explode family)
# and "Expand" (rollup/cube/grouping sets) are row-multiplying too
# (round-6, advisor).
_ROW_CHANGING = (
    "Filter ", "Deduplicate", "GlobalLimit", "LocalLimit", "Sample ",
    "Join ", "Intersect", "Except", "Aggregate", "Distinct",
    "Generate ", "Union ", "Expand",
)


def _n_row_changing(df: DataFrame) -> int:
    # the ANALYZED plan, not the parsed one: generators stay embedded in
    # Project until the analyzer extracts them into Generate nodes, so
    # an explode-adding analysis is invisible to the parsed-plan string
    plan = str(df._jdf.queryExecution().analyzed())
    return sum(plan.count(kind) for kind in _ROW_CHANGING)


def resolve_analysis(spec: str) -> Callable:
    """Resolve an analysis: a built-in name, or ``path/to/module.py:func``
    like ``bambooRun -m module.py:ClassName`` (README.md:63-66)."""
    if spec in ANALYSES:
        return ANALYSES[spec]
    if ":" in spec:
        path, func = spec.rsplit(":", 1)
        mod_spec = importlib.util.spec_from_file_location("user_analysis", path)
        if mod_spec is None or mod_spec.loader is None:
            raise ValueError(f"cannot load analysis module {path!r}")
        mod = importlib.util.module_from_spec(mod_spec)
        mod_spec.loader.exec_module(mod)
        return getattr(mod, func)
    raise ValueError(
        f"unknown analysis {spec!r}; built-ins: {sorted(ANALYSES)} "
        "or use path/to/module.py:function"
    )


def load_sample_events(spark: SparkSession, sample: Sample) -> DataFrame:
    """Multi-file sample scan (jet_test.yml:10-11): each sample is a list of
    event files; one DataFrame per sample. Parquet is the native format; a
    ``.root`` suffix routes through the env-gated ROOT ingest."""
    if not sample.files:
        raise ValueError(f"sample {sample.name!r} has no files")
    if all(f.endswith(".root") for f in sample.files):
        # env-gated (uproot): ROOT -> parquet staging, then the normal scan
        from .sources.root_ingest import ingest_root_files

        staged = f"/tmp/bamboo-root-staging/{sample.name}"
        ingest_root_files(sample.files, tree="events", out_dir=staged)
        return spark.read.parquet(staged)
    return spark.read.parquet(*sample.files)


def run_sample(
    spark: SparkSession,
    analysis: Callable,
    sample: Sample,
    out_dir: str,
    events: DataFrame | None = None,
    counters: dict[str, float] | None = None,
):
    """One sample's full pass: events -> analysis definition -> fused
    single-shuffle job -> hists.parquet + counters.json on disk
    (phaseII-analysis.py:209 per-sample output file)."""
    if events is None:
        events = load_sample_events(spark, sample)
    if counters is None:
        counters = (
            merge_counters(spark, sample)
            if sample.files
            else {"nEvents": float(events.count())}
        )
    adf, plots, cfr, _sels = analysis(events)
    hist = run_analysis(adf, plots, [cfr])
    write_histograms(hist, out_dir, sample.name)
    os.makedirs(f"{out_dir}/{sample.name}", exist_ok=True)
    with open(f"{out_dir}/{sample.name}/counters.json", "w") as f:
        json.dump(counters, f, indent=2, sort_keys=True)
    return plots, cfr, counters


def run_pipeline(
    spark: SparkSession,
    analysis_spec: str | Callable,
    catalog: Catalog,
    out_dir: str,
    events_by_sample: dict[str, DataFrame] | None = None,
    events_tagged: DataFrame | None = None,
) -> dict:
    """The full two-phase workflow (README.md:63-84): ONE fused analysis
    job over every sample in the catalog, then postprocessing into
    yields.tex / cutflow image / plots.yml / stacked plot images.
    ``events_by_sample`` overrides file loading (used by tests and notebook
    callers that already hold DataFrames). ``events_tagged`` goes further:
    a SINGLE DataFrame already carrying a ``__sample`` column — the natural
    shape when samples live as partitions of one lake table. It must cover
    exactly the catalog's samples; it is scanned once, where a
    union-of-filters over a shared source would scan once per sample (and
    pay codegen per union branch).

    Returns a manifest dict of everything written.
    """
    analysis = (
        analysis_spec if callable(analysis_spec) else resolve_analysis(analysis_spec)
    )
    events_by_sample = events_by_sample or {}
    os.makedirs(out_dir, exist_ok=True)

    # ---- ONE fused job for the whole catalog: tag + union the samples and
    # let '__sample' ride the aggregation key (run_analysis extra_keys).
    # N samples cost one scan + one shuffle instead of N jobs; the fixed
    # per-job costs (plan build, codegen, scheduling) are paid once, and
    # small samples stop under-utilizing the cluster between jobs.
    if events_tagged is not None:
        union = events_tagged
    else:
        from functools import reduce

        tagged = {}
        for name, sample in catalog.samples.items():
            ev = events_by_sample.get(name)
            if ev is None:
                ev = load_sample_events(spark, sample)
            tagged[name] = ev.withColumn("__sample", F.lit(name))
        union = reduce(lambda a, b: a.unionByName(b), tagged.values())

    plots_ref: list
    adf, plots_ref, cfr_ref, _sels = analysis(union)
    # DataFrame-provided samples need an input-event counter (mergeCounters
    # has no files to read): book a synthetic always-true root cutflow so
    # the per-sample counts RIDE the fused job (one extra pid in the tiny
    # key space) instead of costing a second full scan of the union.
    #
    # Validity: the engine's analysis contract is mask-based (SURVEY §2.6 —
    # selections are boolean Columns over the SAME DataFrame, never a
    # df.filter), so adf must hold every input row and the fused counter
    # equals the input count. A user analysis that drops rows anyway
    # would silently shrink the genEvents denominator, so we compare the
    # logical plans for ANY row-count-affecting node kind the analysis
    # could have added (filter, dedup, limit, sample, set ops, joins,
    # aggregates) — nodes the caller baked into its INPUT DataFrames live
    # below union and appear in both counts — and fall back to counting
    # the union for that rare shape.
    from .plans import CutFlowReport, Selection

    analysis_filters = _n_row_changing(adf) > _n_row_changing(union)
    count_cfr = CutFlowReport("__counters").add(Selection.root("__input"))
    hist_all = run_analysis(
        adf, plots_ref, [cfr_ref] + ([] if analysis_filters else [count_cfr]),
        extra_keys=["__sample"],
    )
    # aggregate-sized (#samples x #plots x #bins rows) -> ONE partition
    # before pinning: every downstream sink/report action then schedules a
    # single task instead of shuffle-partition-count near-empty ones
    hist_all = hist_all.coalesce(1).persist()
    hist_all.count()

    # the whole aggregate comes to the driver ONCE (it is #samples x #plots
    # x #bins rows by construction); per-sample report frames are pandas
    # slices of it, and the per-sample sinks are written driver-side from
    # the same slices (a KB-sized table per sample — a Spark write job per
    # sample cost ~0.2s each for zero benefit)
    pdf_all = hist_all.toPandas()
    hist_all.unpersist()
    if analysis_filters:
        # row-dropping analysis: the fused counter would under-count, so
        # pay the extra grouped-count scan of the actual input — but only
        # for the samples that NEED it (file-backed samples count via
        # parquet footers in merge_counters; when every sample has files
        # this job is skipped entirely)
        uncounted = [n for n, s in catalog.samples.items() if not s.files]
        input_counts = (
            {
                r["__sample"]: float(r["count"])
                for r in union.where(F.col("__sample").isin(uncounted))
                .groupBy("__sample")
                .count()
                .collect()
            }
            if uncounted
            else {}
        )
    else:
        input_counts = {
            r["__sample"]: float(r["n"])
            for _i, r in pdf_all[pdf_all["plot"] == "__counters/__input"].iterrows()
        }
        pdf_all = pdf_all[~pdf_all["plot"].str.startswith("__counters/")]
    prefix = cfr_ref.name + "/"
    seq_of = {s: i for i, s in enumerate([sel.name for sel, _t in cfr_ref.entries])}
    order = list(seq_of)

    hists, cutflows, counters_all = {}, {}, {}
    for name, sample in catalog.samples.items():
        sub = pdf_all[pdf_all["__sample"] == name]
        write_histograms_pdf(sub.drop(columns="__sample"), out_dir, name)
        counters = (
            merge_counters(spark, sample)
            if sample.files
            else {"nEvents": input_counts.get(name, 0.0)}
        )
        os.makedirs(f"{out_dir}/{name}", exist_ok=True)
        with open(f"{out_dir}/{name}/counters.json", "w") as f:
            json.dump(counters, f, indent=2, sort_keys=True)
        counters_all[name] = counters
        hists[name] = (
            sub[sub["kind"] == "plot"].drop(columns="__sample").reset_index(drop=True)
        )
        cf = sub[(sub["kind"] == "cutflow") & sub["plot"].str.startswith(prefix)].copy()
        cf["selection"] = cf["plot"].str[len(prefix):]
        cf["seq"] = cf["selection"].map(seq_of)
        cutflows[name] = (
            cf.sort_values("seq")
            .rename(columns={"n": "num_events", "sumw": "sum_weights"})[
                ["selection", "seq", "num_events", "sum_weights"]
            ]
            .reset_index(drop=True)
        )

    # ---- postprocess phase (driver-side, aggregate-sized inputs) ----
    scales = {s: catalog.scale(s, counters_all[s]) for s in hists}
    normalized = normalize_histograms(hists, scales)
    # DATA samples (type: DATA, phaseII-analysis.py:76-78) stay UNSCALED
    # (catalog.scale returns 1.0) and are drawn as a points overlay with a
    # Data/MC ratio panel, never stacked into the MC groups
    mc_names = [s for s in hists if catalog.samples[s].is_mc]
    data_names = [s for s in hists if not catalog.samples[s].is_mc]
    groups = {s: catalog.samples[s].group for s in mc_names}
    stacked = stack_by_group(
        normalized[normalized["sample"].isin(mc_names)], groups
    )
    data_series = None
    if data_names:
        data_series = (
            normalized[normalized["sample"].isin(data_names)]
            .groupby(["plot", "bin"], as_index=False)[["sumw", "sumw2", "n"]]
            .sum()
        )

    import pandas as pd

    yields = pd.DataFrame(
        {
            "selection": order,
            **{
                s: [
                    float(cf.loc[cf["selection"] == sel, "sum_weights"].sum())
                    * scales[s]
                    for sel in order
                ]
                for s, cf in cutflows.items()
            },
        }
    )
    signal_xsec = {
        s.name: s.cross_section
        for s in catalog.samples.values()
        if s.type.upper() == "SIGNAL" and s.cross_section is not None
    }
    tex = yields_table_tex(yields, list(hists), signal_xsec=signal_xsec)
    with open(f"{out_dir}/yields.tex", "w") as f:
        f.write(tex)

    effs = {
        s: cutflow_efficiencies(cf, gen_events=counters_all[s].get("nEvents"))
        for s, cf in cutflows.items()
    }
    cutflow_img = cutflow_png(cutflows, f"{out_dir}/cutflow.png")
    plotit_yml = write_plotit_yml(
        plots_ref, catalog, f"{out_dir}/plots.yml", counters=counters_all
    )

    from .report.render import render_stacks

    plot_images = render_stacks(
        stacked, plots_ref, f"{out_dir}/plots", data=data_series
    )

    return {
        "out_dir": out_dir,
        "samples": list(catalog.samples),
        "hists": {s: f"{out_dir}/{s}/hists.parquet" for s in hists},
        "counters": counters_all,
        "scales": scales,
        "cutflows": cutflows,
        "efficiencies": effs,
        "yields_tex": f"{out_dir}/yields.tex",
        "cutflow_image": cutflow_img,
        "plotit_yml": plotit_yml,
        "plot_images": plot_images,
        "stacked": stacked,
        "data_series": data_series,
    }


def main(argv: list[str] | None = None) -> int:
    import argparse

    from .session import get_spark

    ap = argparse.ArgumentParser(
        prog="python -m bambooanalysis_spark",
        description="bambooRun-style driver: analysis module + YAML catalog "
        "-> per-sample histograms + reports (reference README.md:63-75)",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser("run", help="run an analysis over a sample catalog")
    runp.add_argument("analysis", help="built-in name (phase2|jet_test) or module.py:func")
    runp.add_argument("catalog", help="YAML sample catalog (jet_test.yml shape)")
    runp.add_argument("-o", "--output", default="out", help="output directory")
    runp.add_argument("--master", default=None, help="Spark master override")
    valp = sub.add_parser(
        "validate",
        help="pre-flight a catalog against its actual files (header-level: "
        "works on real compressed ROOT inputs, no Spark session needed)",
    )
    valp.add_argument("catalog", help="YAML sample catalog")
    valp.add_argument("--tree", default=None, help="tree name override")
    args = ap.parse_args(argv)

    if args.cmd == "validate":
        from .sources.catalog import validate_catalog

        problems = validate_catalog(load_catalog(args.catalog), tree=args.tree)
        print(json.dumps({"ok": not problems, "problems": problems}, indent=2))
        return 0 if not problems else 1

    spark = get_spark(app_name=f"bamboo:{args.analysis}", master=args.master)
    manifest = run_pipeline(spark, args.analysis, load_catalog(args.catalog), args.output)
    print(
        json.dumps(
            {
                "out_dir": manifest["out_dir"],
                "samples": manifest["samples"],
                "yields_tex": manifest["yields_tex"],
                "cutflow_image": manifest["cutflow_image"],
                "plotit_yml": manifest["plotit_yml"],
                "plot_images": len(manifest["plot_images"]),
            },
            indent=2,
        )
    )
    return 0
