"""DerivedPlot — post-hoc arithmetic combinations of booked plots
(SURVEY.md §2.7; filtered for in postProcess at
/root/reference/phaseII-analysis.py:274-276).

A DerivedPlot never touches events: it is a transformation over the
long-format histogram table produced by the single-pass job — ratios,
differences, efficiency curves. Expressed as DataFrame ops over (plot, bin)
so it composes with the rest of the engine and stays trivially cheap.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AXES = ["bin", "bin2", "bin3"]


def derived(
    hist: DataFrame,
    name: str,
    sources: dict[str, str],
    value: Column,
    error: Column | None = None,
) -> DataFrame:
    """General DerivedPlot (the generic class filtered for at
    phaseII-analysis.py:274-276): arbitrary bin-wise arithmetic over N
    source plots.

    ``sources`` maps an alias to a booked plot name; each source is pivoted
    to columns ``{alias}_w`` / ``{alias}_w2`` (sumw / sumw2, missing bins
    -> 0.0) on a full-outer join over the bin axes. ``value`` (and optional
    ``error``) are Column expressions over those names. Never touches
    events — input and output are aggregate-sized histogram tables.
    """
    axes = [a for a in _AXES if a in hist.columns]
    joined: DataFrame | None = None
    for alias, plot in sources.items():
        side = hist.where(F.col("plot") == plot).select(
            *axes,
            F.col("sumw").alias(f"{alias}_w"),
            F.col("sumw2").alias(f"{alias}_w2"),
        )
        joined = side if joined is None else joined.join(side, axes, "full_outer")
    if joined is None:
        raise ValueError("derived plot needs at least one source")
    joined = joined.fillna(
        0.0, subset=[f"{a}_{s}" for a in sources for s in ("w", "w2")]
    )
    out = [F.lit(name).alias("plot"), *axes, value.alias("value")]
    if error is not None:
        out.append(error.alias("error"))
    return joined.select(*out)


def derived_difference(hist: DataFrame, name: str, a: str, b: str) -> DataFrame:
    """Bin-wise a - b with independent-sum error sqrt(s2a + s2b)."""
    aw, bw = F.col("a_w"), F.col("b_w")
    return derived(
        hist,
        name,
        {"a": a, "b": b},
        value=aw - bw,
        error=F.sqrt(F.col("a_w2") + F.col("b_w2")),
    )


def derived_sum(hist: DataFrame, name: str, plots: Iterable[str]) -> DataFrame:
    """Bin-wise sum over N plots, error = sqrt(sum of sumw2)."""
    aliases = {f"p{i}": p for i, p in enumerate(plots)}
    if not aliases:
        raise ValueError("derived_sum needs at least one plot")
    val = sum((F.col(f"{a}_w") for a in aliases), F.lit(0.0))
    err = F.sqrt(sum((F.col(f"{a}_w2") for a in aliases), F.lit(0.0)))
    return derived(hist, name, aliases, value=val, error=err)


def derived_efficiency(
    hist: DataFrame, name: str, numerator: str, denominator: str
) -> DataFrame:
    """Bin-wise selection efficiency num/den with binomial errors
    sqrt(e(1-e)/den) — exact for unit-weight fills (where sumw = N); for
    weighted fills this is the usual effective-N approximation."""
    e = F.col("num_w") / F.col("den_w")
    err = F.when(
        F.col("den_w") > 0, F.sqrt(F.greatest(e * (1 - e) / F.col("den_w"), F.lit(0.0)))
    )
    return derived(
        hist,
        name,
        {"num": numerator, "den": denominator},
        value=F.when(F.col("den_w") > 0, e),
        error=err,
    )


def derived_ratio(
    hist: DataFrame, name: str, numerator: str, denominator: str
) -> DataFrame:
    """Bin-wise ratio plot num/den with binomial-style error propagation
    on sumw (sigma_r^2 = r^2 * (s2n/n^2 + s2d/d^2)). Bins absent from the
    numerator are treated as 0 (ratio 0, error 0); bins absent from the
    denominator yield NULL (undefined ratio), matching histogram-division
    conventions. Built on the generic ``derived()`` machinery, so the
    full-outer join covers EVERY bin axis present in the table (a 3D plot
    pair joins on bin3 too) and num-only bins are emitted rather than
    dropped (round-4 review finding)."""
    num_w, num_w2 = F.col("num_w"), F.col("num_w2")
    den_w, den_w2 = F.col("den_w"), F.col("den_w2")
    r = F.when(den_w != 0.0, num_w / den_w)
    err2 = (r * r) * (num_w2 / (num_w * num_w) + den_w2 / (den_w * den_w))
    err = (
        F.when((den_w != 0.0) & (num_w != 0.0), F.sqrt(err2))
        .when(den_w != 0.0, F.lit(0.0))
    )
    return (
        derived(
            hist,
            name,
            {"num": numerator, "den": denominator},
            value=r,
            error=err,
        )
        .withColumnRenamed("value", "ratio")
        .withColumnRenamed("error", "ratio_err")
    )
