"""Stacked-histogram image rendering — the plotIt analog (SURVEY.md §3.3).

The reference's final artifacts are per-plot stacked images rendered by
plotIt from the saved histograms + plots.yml (phaseII-analysis.py:282-286,
README.md:82-84). This renders the same content from the engine's stacked
aggregate table (``stack_by_group`` output: one row per plot/bin/group).

Driver-side by design: input is #plots x #bins x #groups rows, never event
data. matplotlib when available; otherwise a dependency-free SVG encoder
(this container has no matplotlib) — same content, different encoder.
"""

from __future__ import annotations

import os

import pandas as pd


def _fold_overflow(bins: dict[int, float], n: int) -> list[float]:
    """Fold underflow (-1) / overflow (n) into the edge bins, per
    ``show-overflow: true`` (jet_test.yml:34)."""
    vals = [float(bins.get(i, 0.0)) for i in range(n)]
    if n:
        vals[0] += float(bins.get(-1, 0.0))
        vals[-1] += float(bins.get(n, 0.0))
    return vals


def stack_series(
    stacked: pd.DataFrame, plot_name: str, n_bins: int, group_order: list[str] | None = None
) -> dict[str, list[float]]:
    """Per-group bin series for one plot, overflow folded, in stack order
    (jet_test.yml:40-51 group order = stack order)."""
    sub = stacked[stacked["plot"] == plot_name]
    groups = list(group_order) if group_order else sorted(sub["group"].unique())
    out = {}
    for g in groups:
        rows = sub[sub["group"] == g]
        out[g] = _fold_overflow(dict(zip(rows["bin"], rows["sumw"])), n_bins)
    return out


_COLORS = ["#e41a1c", "#377eb8", "#4daf4a", "#ff7f00", "#984ea3", "#a65628"]


def _data_mc_ratios(
    data: tuple[list[float], list[float]],
    mc_totals: list[float],
    mc_errs: list[float],
) -> list[tuple[float, float] | None]:
    """Per-bin (ratio, err) via the reference's formula
    (postprocess.data_mc_ratio); None where MC is empty."""
    from .postprocess import data_mc_ratio

    vals, errs = data
    out = []
    for d, de, m, me in zip(vals, errs, mc_totals, mc_errs):
        out.append(data_mc_ratio(d, m, de, me) if m > 0 else None)
    return out


def render_stack(
    series: dict[str, list[float]],
    edges: list[float],
    out_path: str,
    title: str = "",
    y_label: str = "Events",
    data: tuple[list[float], list[float]] | None = None,
) -> str:
    """One stacked per-group histogram image (plotIt's per-plot output).

    ``data`` = (values, errors) per bin draws the unscaled DATA series as
    points with error bars over the MC stack plus a Data/MC ratio panel —
    the reference's data-vs-MC overlay (phaseII-analysis.py:76-78 DATA
    samples; ratio errors per :146-152 via postprocess.data_mc_ratio)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return _stack_svg(series, edges, out_path, title, y_label, data)

    centers = [(a + b) / 2 for a, b in zip(edges, edges[1:])]
    widths = [b - a for a, b in zip(edges, edges[1:])]
    if data is None:
        fig, ax = plt.subplots(figsize=(8, 5))
        rax = None
    else:
        fig, (ax, rax) = plt.subplots(
            2, 1, figsize=(8, 6), sharex=True,
            gridspec_kw={"height_ratios": [3, 1]},
        )
    bottom = [0.0] * len(centers)
    for (g, vals), color in zip(series.items(), _COLORS * 8):
        ax.bar(centers, vals, width=widths, bottom=bottom, label=g, color=color)
        bottom = [b + v for b, v in zip(bottom, vals)]
    if data is not None:
        vals, errs = data
        ax.errorbar(centers, vals, yerr=errs, fmt="ko", markersize=4, label="Data")
        mc_errs = [0.0] * len(bottom)  # per-group sumw2 folded upstream
        ratios = _data_mc_ratios(data, bottom, mc_errs)
        rx = [c for c, r in zip(centers, ratios) if r is not None]
        ry = [r[0] for r in ratios if r is not None]
        re = [r[1] for r in ratios if r is not None]
        assert rax is not None
        rax.errorbar(rx, ry, yerr=re, fmt="ko", markersize=4)
        rax.axhline(1.0, color="gray", linestyle="--", linewidth=1)
        rax.set_ylabel("Data/MC")
    ax.set_title(title)
    ax.set_ylabel(y_label)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def _stack_svg(
    series: dict[str, list[float]],
    edges: list[float],
    out_path: str,
    title: str,
    y_label: str,
    data: tuple[list[float], list[float]] | None = None,
) -> str:
    if not out_path.endswith(".svg"):
        out_path = out_path.rsplit(".", 1)[0] + ".svg"
    width, height, pad = 640, 400, 50
    ratio_h = 110 if data is not None else 0  # Data/MC strip below the stack
    n = len(edges) - 1
    totals = [sum(vals[i] for vals in series.values()) for i in range(n)]
    vmax = max(totals) if any(totals) else 1.0
    if data is not None:
        vmax = max(vmax, max(data[0]) if any(data[0]) else 0.0) or 1.0
    span = max(edges[-1] - edges[0], 1e-12)

    def x(e):
        return pad + (e - edges[0]) / span * (width - 2 * pad)

    def y(v):
        return height - pad - (v / vmax) * (height - 2 * pad)

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height + ratio_h}">',
        f'<rect width="{width}" height="{height + ratio_h}" fill="white"/>',
        f'<text x="{width / 2:.0f}" y="20" font-size="14" text-anchor="middle">{title}</text>',
        f'<text x="15" y="{height / 2:.0f}" font-size="11" transform="rotate(-90 15 {height / 2:.0f})" '
        f'text-anchor="middle">{y_label}</text>',
    ]
    bottom = [0.0] * n
    for (g, vals), color in zip(series.items(), _COLORS * 8):
        for i in range(n):
            if vals[i] <= 0:
                continue
            x0, x1 = x(edges[i]), x(edges[i + 1])
            y1, y0 = y(bottom[i]), y(bottom[i] + vals[i])
            parts.append(
                f'<rect x="{x0:.1f}" y="{y0:.1f}" width="{x1 - x0:.1f}" '
                f'height="{y1 - y0:.1f}" fill="{color}"/>'
            )
        bottom = [b + v for b, v in zip(bottom, vals)]
    for j, (g, _v) in enumerate(series.items()):
        parts.append(
            f'<text x="{width - pad - 100}" y="{pad + 15 * j}" font-size="12" '
            f'fill="{_COLORS[j % len(_COLORS)]}">{g}</text>'
        )
    for e in (edges[0], edges[-1]):
        parts.append(
            f'<text x="{x(e):.0f}" y="{height - pad + 15}" font-size="10" '
            f'text-anchor="middle">{e:g}</text>'
        )
    if data is not None:
        vals, errs = data
        centers = [(a + b) / 2 for a, b in zip(edges, edges[1:])]
        # data points + error bars over the stack
        for c, v, e in zip(centers, vals, errs):
            if v <= 0 and e <= 0:
                continue
            parts.append(
                f'<line x1="{x(c):.1f}" y1="{y(max(v - e, 0.0)):.1f}" '
                f'x2="{x(c):.1f}" y2="{y(v + e):.1f}" stroke="black"/>'
            )
            parts.append(
                f'<circle cx="{x(c):.1f}" cy="{y(v):.1f}" r="3" fill="black" class="data-point"/>'
            )
        parts.append(
            f'<text x="{width - pad - 100}" y="{pad + 15 * len(series)}" '
            f'font-size="12" fill="black">Data</text>'
        )
        # Data/MC ratio strip (reference error formula via data_mc_ratio)
        mc_errs = [0.0] * n
        ratios = _data_mc_ratios(data, totals, mc_errs)
        finite = [r for r in ratios if r is not None]
        rmax = max(2.0, max((r[0] + r[1]) for r in finite)) if finite else 2.0
        r_top, r_bot = height + 10, height + ratio_h - 20

        def ry(v):
            return r_bot - min(v, rmax) / rmax * (r_bot - r_top)

        parts.append(
            f'<line x1="{pad}" y1="{ry(1.0):.1f}" x2="{width - pad}" '
            f'y2="{ry(1.0):.1f}" stroke="gray" stroke-dasharray="4"/>'
        )
        parts.append(
            f'<text x="15" y="{(r_top + r_bot) / 2:.0f}" font-size="10" '
            f'transform="rotate(-90 15 {(r_top + r_bot) / 2:.0f})" '
            f'text-anchor="middle">Data/MC</text>'
        )
        for c, r in zip(centers, ratios):
            if r is None:
                continue
            rv, re_ = r
            parts.append(
                f'<line x1="{x(c):.1f}" y1="{ry(max(rv - re_, 0.0)):.1f}" '
                f'x2="{x(c):.1f}" y2="{ry(rv + re_):.1f}" stroke="black"/>'
            )
            parts.append(
                f'<circle cx="{x(c):.1f}" cy="{ry(rv):.1f}" r="2.5" fill="black" class="ratio-point"/>'
            )
    parts.append("</svg>")
    with open(out_path, "w") as f:
        f.write("\n".join(parts))
    return out_path


def render_stacks(
    stacked: pd.DataFrame,
    plots: list,
    out_dir: str,
    group_order: list[str] | None = None,
    data: pd.DataFrame | None = None,
) -> dict[str, str]:
    """Render every 1D plot's stacked image into ``out_dir`` — the plotIt
    batch output (README.md:82-84). Returns {plot_name: image_path}.

    ``data``: long frame (plot, bin, sumw, sumw2) of the summed UNSCALED
    DATA samples; when given, each image gains the data-points overlay and
    the Data/MC ratio panel."""
    import math

    os.makedirs(out_dir, exist_ok=True)
    out = {}
    for p in plots:
        if len(p.binnings) != 1:
            continue  # plotIt renders 1D; 2D/3D stay in the parquet sink
        b = p.binnings[0]
        series = stack_series(stacked, p.name, b.n, group_order)
        if not any(any(v) for v in series.values()):
            continue  # empty histogram — no image, matching plotIt behavior
        data_series = None
        if data is not None:
            sub = data[data["plot"] == p.name]
            vals = _fold_overflow(dict(zip(sub["bin"], sub["sumw"])), b.n)
            errs = [
                math.sqrt(v)
                for v in _fold_overflow(dict(zip(sub["bin"], sub["sumw2"])), b.n)
            ]
            data_series = (vals, errs)
        out[p.name] = render_stack(
            series,
            b.edges(),
            f"{out_dir}/{p.name}.png",
            title=p.title or p.name,
            data=data_series,
        )
    return out
