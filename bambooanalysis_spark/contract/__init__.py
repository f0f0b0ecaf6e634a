"""Driver contract registry: maps query names -> (spark callable, oracle SQL).

Each module registers operator demonstrations per SURVEY.md §2's inventory
plus the large-scale pipeline extensions. The driver runs the Spark callable
and the DuckDB oracle side-by-side at sf0.01 and compares row-count + schema
+ order-insensitive value hash — so both sides alias columns identically and
stick to bit-reproducible math (or explicit rounding) as documented in each
module.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _with_utc(fn: Callable) -> Callable:
    """The driver runs queries in ITS session, whose timezone we don't
    control; timestamp literals parse in session-local time, so a non-UTC
    session would shift them relative to DuckDB's naive timestamps. Pin
    UTC (runtime-settable) before every query."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def register(name: str, fn: Callable, oracle: str | None = None) -> None:
    QUERIES[name] = _with_utc(fn)
    if oracle is not None:
        ORACLES[name] = oracle


from . import hep  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import extensions  # noqa: E402,F401
