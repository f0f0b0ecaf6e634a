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


def register(name: str, fn: Callable, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


from . import hep  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import extensions  # noqa: E402,F401
