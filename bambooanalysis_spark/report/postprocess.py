"""Post-processing over the per-sample histogram tables — the reference's
second pipeline phase (SURVEY.md §2.11, §3.2-3.3).

All of this consumes the SMALL aggregated outputs of the single-pass jobs
(#plots x #bins rows per sample), so it runs driver-side with pandas /
numpy / matplotlib — the same division of labor as the reference, where
printCutFlowReports and plotIt operate on saved histograms, not events.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def write_histograms(hist: DataFrame, out_dir: str, sample: str) -> str:
    """Histogram sink: long-format parquet per sample — the analog of the
    per-sample {sample}.root output (phaseII-analysis.py:209)."""
    path = f"{out_dir}/{sample}/hists.parquet"
    hist.write.mode("overwrite").parquet(path)
    return path


def write_histograms_pdf(pdf: pd.DataFrame, out_dir: str, sample: str) -> str:
    """Driver-side histogram sink for an ALREADY-COLLECTED aggregate slice
    (run_pipeline holds the whole #samples x #plots x #bins table in
    pandas): same directory-of-parquet layout `spark.read.parquet` expects,
    written with pyarrow in ~ms instead of scheduling a Spark write job
    per sample (~0.2 s each of pure overhead on a KB-sized table)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{out_dir}/{sample}/hists.parquet"
    # overwrite semantics (what the Spark writer's mode('overwrite') gave):
    # stale part files from an earlier run into the same out_dir would
    # otherwise be read back alongside the new one as duplicate rows
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    # explicit schema: an EMPTY slice (sample tag matched zero events)
    # would otherwise infer its object columns as pyarrow null type, which
    # Spark cannot read back; the old Spark write preserved string/long
    fields = [
        pa.field(
            col,
            pa.string() if pdf[col].dtype == object
            else pa.from_numpy_dtype(pdf[col].dtype),
        )
        for col in pdf.columns
    ]
    pq.write_table(
        pa.Table.from_pandas(
            pdf.reset_index(drop=True), schema=pa.schema(fields),
            preserve_index=False,
        ),
        f"{path}/part-00000.parquet",
    )
    return path


def cutflow_efficiencies(cutflow: pd.DataFrame, gen_events: float | None = None) -> pd.DataFrame:
    """Per printCutFlowReports (phaseII-analysis.py:190-199): for each node
    Eff = SumW / SumW_parent (sequential, phaseII-analysis.py:105-111) and
    TotalEff = SumW / genEvents. Input: ordered rows with columns
    (selection, num_events, sum_weights)."""
    df = cutflow.copy().reset_index(drop=True)
    prev = df["sum_weights"].shift(1)
    df["eff_pct"] = (df["sum_weights"] / prev * 100.0).where(prev.notna())
    base = gen_events if gen_events is not None else (
        df["sum_weights"].iloc[0] if len(df) else None
    )
    df["total_eff_pct"] = df["sum_weights"] / base * 100.0 if base else None
    return df


def normalize_histograms(
    hists: dict[str, pd.DataFrame], scales: dict[str, float]
) -> pd.DataFrame:
    """Scale each MC sample's histograms by lumi x xsec / genEvents
    (phaseII-analysis.py:210-217 + writePlotIt inputs): sumw and sumw2
    scale by s and s^2. Returns one long frame with a sample column."""
    frames = []
    for sample, h in hists.items():
        s = scales.get(sample, 1.0)
        out = h.copy()
        out["sumw"] = out["sumw"] * s
        out["sumw2"] = out["sumw2"] * (s * s)
        out["sample"] = sample
        frames.append(out)
    return pd.concat(frames, ignore_index=True)


def stack_by_group(
    normalized: pd.DataFrame, groups: dict[str, str]
) -> pd.DataFrame:
    """Stack per legend group (jet_test.yml:9,40-51): sum sumw/sumw2 over
    samples of the same group per (plot, bin)."""
    df = normalized.copy()
    df["group"] = df["sample"].map(groups).fillna(df["sample"])
    return (
        df.groupby(["plot", "bin", "group"], as_index=False)[["sumw", "sumw2", "n"]]
        .sum()
    )


def data_mc_ratio(
    data_sumw: float, mc_sumw: float, data_err: float, mc_err: float, mc_syst: float = 0.0
) -> tuple[float, float]:
    """Data/MC ratio with the reference's error formula
    (phaseII-analysis.py:146-152):
    ratio = data/mc,
    err = sqrt(mc^2*sigma_data^2 + data^2*(sigma_mc^2 + syst_mc^2)) / mc^2.
    """
    import math

    ratio = data_sumw / mc_sumw
    err = (
        math.sqrt(
            mc_sumw**2 * data_err**2 + data_sumw**2 * (mc_err**2 + mc_syst**2)
        )
        / mc_sumw**2
    )
    return ratio, err


def _tex_escape(s: str) -> str:
    # phaseII-analysis.py:50-57 escaping
    for a, b in [
        ("\\", r"\textbackslash{}"), ("&", r"\&"), ("%", r"\%"), ("$", r"\$"),
        ("#", r"\#"), ("_", r"\_"), ("{", r"\{"), ("}", r"\}"),
    ]:
        s = s.replace(a, b)
    return s


def yields_table_tex(
    yields: pd.DataFrame,
    sample_columns: list[str],
    signal_xsec: dict[str, float] | None = None,
) -> str:
    """LaTeX yields table, samples x selections (phaseII-analysis.py:59-166):
    one row per selection title, one column per sample (SIGNAL columns
    annotated with their cross-section, phaseII-analysis.py:89)."""
    signal_xsec = signal_xsec or {}
    heads = []
    for s in sample_columns:
        h = _tex_escape(s)
        if s in signal_xsec:
            h += rf" ($\sigma = {signal_xsec[s]:g}$ pb)"
        heads.append(h)
    lines = [
        r"\begin{tabular}{l" + "r" * len(sample_columns) + "}",
        r"\hline",
        "Selection & " + " & ".join(heads) + r" \\",
        r"\hline",
    ]
    for _, row in yields.iterrows():
        cells = [f"{row[s]:.2f}" if pd.notna(row[s]) else "-" for s in sample_columns]
        lines.append(_tex_escape(str(row["selection"])) + " & " + " & ".join(cells) + r" \\")
    lines += [r"\hline", r"\end{tabular}"]
    return "\n".join(lines)


def cutflow_png(
    cutflows: dict[str, pd.DataFrame], out_path: str, log_y: bool = True
) -> str:
    """Overlaid cutflow comparison image (phaseII-analysis.py:113-136:
    FS red vs Delphes blue, log-y). Uses matplotlib when available;
    otherwise renders a dependency-free SVG (this container has no
    matplotlib) — same content, different encoder."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return _cutflow_svg(cutflows, out_path, log_y)

    fig, ax = plt.subplots(figsize=(8, 5))
    colors = ["red", "blue", "green", "orange", "purple"]
    for (label, cf), color in zip(cutflows.items(), colors):
        ax.step(
            range(len(cf)), cf["sum_weights"], where="mid", label=label, color=color
        )
    ax.set_xticks(range(max(len(cf) for cf in cutflows.values())))
    first = next(iter(cutflows.values()))
    ax.set_xticklabels(first["selection"], rotation=45, ha="right")
    if log_y:
        ax.set_yscale("log")
    ax.set_ylabel("SumW")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def _cutflow_svg(
    cutflows: dict[str, pd.DataFrame], out_path: str, log_y: bool
) -> str:
    import math as m

    if not out_path.endswith(".svg"):
        out_path = out_path.rsplit(".", 1)[0] + ".svg"
    width, height, pad = 640, 400, 50
    colors = ["red", "blue", "green", "orange", "purple"]
    all_vals = [
        v for cf in cutflows.values() for v in cf["sum_weights"] if v > 0
    ]
    vmax = max(all_vals) if all_vals else 1.0
    vmin = min(all_vals) if all_vals else 0.1

    def y(v):
        if log_y:
            v = max(v, vmin)
            frac = (m.log10(v) - m.log10(vmin)) / max(
                m.log10(vmax) - m.log10(vmin), 1e-9
            )
        else:
            frac = v / vmax
        return height - pad - frac * (height - 2 * pad)

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
    ]
    n = max(len(cf) for cf in cutflows.values())
    step = (width - 2 * pad) / max(n - 1, 1)
    for (label, cf), color in zip(cutflows.items(), colors):
        pts = " ".join(
            f"{pad + i * step:.1f},{y(v):.1f}" for i, v in enumerate(cf["sum_weights"])
        )
        parts.append(
            f'<polyline points="{pts}" fill="none" stroke="{color}" stroke-width="2"/>'
        )
    first = next(iter(cutflows.values()))
    for i, name in enumerate(first["selection"]):
        parts.append(
            f'<text x="{pad + i * step:.0f}" y="{height - pad + 15}" font-size="10" '
            f'text-anchor="middle">{name}</text>'
        )
    for j, (label, _cf) in enumerate(cutflows.items()):
        parts.append(
            f'<text x="{width - pad - 100}" y="{pad + 15 * j}" font-size="12" '
            f'fill="{colors[j % len(colors)]}">{label}</text>'
        )
    parts.append("</svg>")
    with open(out_path, "w") as f:
        f.write("\n".join(parts))
    return out_path


def write_plotit_yml(
    plots: list,
    catalog,
    out_path: str,
    counters: dict[str, dict[str, float]] | None = None,
) -> str:
    """writePlotIt analog (phaseII-analysis.py:283-286 / SURVEY.md §3.3):
    serialize the rendering configuration — files (per-sample scales from
    the catalog), groups, plot axes/binning, defaults — to a plots.yml a
    renderer consumes. We emit the same structure plotIt reads; rendering
    itself is cutflow_png / stack_by_group here."""
    counters = counters or {}
    cfg: dict = {
        "configuration": {
            "luminosity": {
                era: spec["luminosity"] for era, spec in catalog.eras.items()
            },
            "luminosity-error": catalog.plot_defaults.get("luminosity-error", 0.0),
        },
        "files": {},
        "groups": {},
        "plots": {},
    }
    for name, s in catalog.samples.items():
        entry: dict = {"type": s.type.lower(), "era": s.era}
        if s.is_mc:
            entry["cross-section"] = s.cross_section
            entry["scale"] = catalog.scale(name, counters.get(name))
        if s.group:
            entry["group"] = s.group
            cfg["groups"].setdefault(s.group, {"order": s.stack_index})
        cfg["files"][name] = entry
    for p in plots:
        b = p.binnings[0]
        cfg["plots"][p.name] = {
            "title": p.title,
            "n-bins": getattr(b, "n", None),
            "x-range": [b.edges()[0], b.edges()[-1]],
            "selection": p.selection.name,
        }
    try:
        import yaml

        text = yaml.safe_dump(cfg, sort_keys=True)
    except ImportError:  # pragma: no cover
        import json

        text = json.dumps(cfg, indent=2, sort_keys=True)
    with open(out_path, "w") as f:
        f.write(text)
    return out_path


def split_reports_by_era(
    cutflows_by_sample: dict[str, "pd.DataFrame"], catalog, mode: str = "split"
) -> dict[str, dict[str, "pd.DataFrame"]]:
    """Era selection/combination (phaseII-analysis.py:186-188,246-250):
    'split' -> one report set per era, 'combined' -> single merged set,
    'all' -> both."""
    by_era: dict[str, dict] = {}
    for sample, cf in cutflows_by_sample.items():
        era = catalog.samples[sample].era or "default"
        by_era.setdefault(era, {})[sample] = cf
    out: dict[str, dict] = {}
    if mode in ("split", "all"):
        out.update(by_era)
    if mode in ("combined", "all"):
        out["combined"] = dict(cutflows_by_sample)
    return out
