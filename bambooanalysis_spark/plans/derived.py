"""DerivedPlot — post-hoc arithmetic combinations of booked plots
(SURVEY.md §2.7; filtered for in postProcess at
/root/reference/phaseII-analysis.py:274-276).

A DerivedPlot never touches events: it is a transformation over the
long-format histogram table produced by the single-pass job — ratios,
differences, efficiency curves. Expressed as DataFrame ops over (plot, bin)
so it composes with the rest of the engine and stays trivially cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def derived_ratio(
    hist: DataFrame, name: str, numerator: str, denominator: str
) -> DataFrame:
    """Bin-wise ratio plot num/den with binomial-style error propagation
    on sumw (sigma_r^2 = r^2 * (s2n/n^2 + s2d/d^2)). Bins absent from the
    numerator are treated as 0; bins absent from the denominator yield
    NULL (undefined ratio), matching histogram-division conventions."""
    num = hist.where(F.col("plot") == numerator).select(
        "bin", "bin2", F.col("sumw").alias("num_w"), F.col("sumw2").alias("num_w2")
    )
    den = hist.where(F.col("plot") == denominator).select(
        "bin", "bin2", F.col("sumw").alias("den_w"), F.col("sumw2").alias("den_w2")
    )
    joined = den.join(num, ["bin", "bin2"], "left")
    r = F.coalesce(F.col("num_w"), F.lit(0.0)) / F.col("den_w")
    err2 = (r * r) * (
        F.coalesce(F.col("num_w2"), F.lit(0.0))
        / (F.coalesce(F.col("num_w"), F.lit(0.0)) * F.coalesce(F.col("num_w"), F.lit(0.0)))
        + F.col("den_w2") / (F.col("den_w") * F.col("den_w"))
    )
    return joined.select(
        F.lit(name).alias("plot"),
        "bin",
        "bin2",
        r.alias("ratio"),
        F.when(F.coalesce(F.col("num_w"), F.lit(0.0)) != 0.0, F.sqrt(err2))
        .otherwise(F.lit(0.0))
        .alias("ratio_err"),
    )
