"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``bambooanalysis_spark`` (see that package's
docstrings and SURVEY.md for the reference-parity mapping).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_SMALL = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full phaseII-parity analysis pass — 61 histograms
    + 6 cutflow counters computed in ONE single-pass aggregation job
    (SURVEY.md §4.2) over the hep_events fixture derived from sf0.001.

    Returns the long-format histogram table (plot, kind, bin, bin2, sumw,
    sumw2, n).
    """
    from bambooanalysis_spark.analyses import define_phase2
    from bambooanalysis_spark.plans import run_analysis
    from bambooanalysis_spark.sources import build_hep_events

    hep = build_hep_events(spark, SF_SMALL)
    df, plots, cfr, _sels = define_phase2(hep)
    hist = run_analysis(df, plots, [cfr])
    return hist.orderBy("plot", "bin", "bin2")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Alias every computed/aggregate column so names match ``oracle_sql``.
    """
    from bambooanalysis_spark.contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted only for
    genuinely non-SQL-expressible ops, which get rows-only checks)."""
    from bambooanalysis_spark.contract import ORACLES

    return dict(ORACLES)
