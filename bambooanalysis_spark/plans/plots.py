"""Plots and binnings — weighted 1D/2D histogram declarations.

Mirrors the reference's ``Plot.make1D(name, expr, selection, binning)``
(127 instances across the two modules, SURVEY.md §2.7). A Plot here is pure
metadata + Column expressions; the single-pass histogrammer turns the whole
booked set into one aggregation job.

Binning semantics (ROOT-compatible, with under/overflow like
``show-overflow: true`` at jet_test.yml:34):
  bin -1 = underflow (x < lo), bins 0..n-1 in range (left-closed,
  right-open), bin n = overflow (x >= hi). NULL x -> NULL bin (dropped by
  the histogrammer; the guarding selection is expected to prevent it,
  SURVEY.md §2.5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dlit(v: float) -> str:
    """Textual double literal. A bare `20.0` parses as DECIMAL(3,1) in
    Spark SQL (different arithmetic than F.lit(20.0)'s double!); the
    explicit cast of the full-precision repr reproduces the Column-path
    double exactly."""
    return f"CAST({v!r} AS DOUBLE)"


class EquidistantBinning:
    """n uniform bins over [lo, hi) — ``EqB`` in the reference
    (phaseII-analysis.py:299)."""

    def __init__(self, n: int, lo: float, hi: float):
        self.n, self.lo, self.hi = int(n), float(lo), float(hi)

    def bin_col(self, x: Column) -> Column:
        lo, hi, n = F.lit(self.lo), F.lit(self.hi), self.n
        width = F.lit((self.hi - self.lo) / self.n)
        return (
            F.when(x.isNull(), F.lit(None).cast("int"))
            .when(x < lo, F.lit(-1))
            .when(x >= hi, F.lit(n))
            .otherwise(F.least(F.floor((x - lo) / width).cast("int"), F.lit(n - 1)))
        )

    def bin_sql(self, x: str) -> str:
        """Textual twin of bin_col over a named column reference — the
        single-pass histogrammer assembles its contribs array as ONE parsed
        SQL string (a py4j call per *plot* would otherwise dominate
        plan-build latency; PERFORMANCE.md §22). Semantics are pinned equal
        to bin_col by the 127 golden-plot tests and the hep oracles."""
        lo, hi = _dlit(self.lo), _dlit(self.hi)
        width = _dlit((self.hi - self.lo) / self.n)
        return (
            f"CASE WHEN {x} IS NULL THEN CAST(NULL AS INT) "
            f"WHEN {x} < {lo} THEN -1 "
            f"WHEN {x} >= {hi} THEN {self.n} "
            f"ELSE LEAST(CAST(FLOOR(({x} - {lo}) / {width}) AS INT), {self.n - 1}) END"
        )

    def edges(self) -> list[float]:
        w = (self.hi - self.lo) / self.n
        return [self.lo + i * w for i in range(self.n + 1)]


class VariableBinning:
    """Irregular bin edges (imported by the reference at jet_test.py:338).

    bin(x) = #{edges e : e <= x} - 1 — a branch-free closed form over a
    literal edge array (binary-search-equivalent for the small edge counts
    histograms use); -1 underflow, len(edges)-1 overflow.
    """

    def __init__(self, edges: Sequence[float]):
        if len(edges) < 2 or any(a >= b for a, b in zip(edges, edges[1:])):
            raise ValueError("edges must be strictly increasing, >= 2 values")
        self._edges = [float(e) for e in edges]
        self.n = len(self._edges) - 1

    def bin_col(self, x: Column) -> Column:
        arr = F.array(*[F.lit(e) for e in self._edges])
        return (
            F.when(x.isNull(), F.lit(None).cast("int"))
            .otherwise((F.size(F.filter(arr, lambda e: e <= x)) - 1).cast("int"))
        )

    def bin_sql(self, x: str) -> str:
        """Textual twin of bin_col (see EquidistantBinning.bin_sql)."""
        arr = "array(" + ", ".join(_dlit(e) for e in self._edges) + ")"
        return (
            f"CASE WHEN {x} IS NULL THEN CAST(NULL AS INT) "
            f"ELSE CAST(size(filter({arr}, e -> e <= {x})) - 1 AS INT) END"
        )

    def edges(self) -> list[float]:
        return list(self._edges)


class Plot:
    """A booked histogram: name + value expression(s) + selection + binning.

    ``exprs``/``binnings`` have one entry for 1D, two for 2D, three for 3D
    (the reference exercises 1D only; make2D/make3D are framework
    capability [B], SURVEY.md §2.7).
    """

    MAX_DIMS = 3

    def __init__(self, name: str, exprs, selection, binnings, title: str = ""):
        self.name = name
        self.exprs = list(exprs)
        self.selection = selection
        self.binnings = list(binnings)
        self.title = title
        if len(self.exprs) != len(self.binnings):
            raise ValueError("one binning per axis expression")
        if not 1 <= len(self.exprs) <= self.MAX_DIMS:
            raise ValueError("1 to 3 axes supported")

    @classmethod
    def make1D(cls, name, expr, selection, binning, title: str = "") -> "Plot":
        return cls(name, [expr], selection, [binning], title)

    @classmethod
    def make2D(cls, name, exprs, selection, binnings, title: str = "") -> "Plot":
        if len(exprs) != 2:
            raise ValueError("make2D takes two expressions")
        return cls(name, exprs, selection, binnings, title)

    @classmethod
    def make3D(cls, name, exprs, selection, binnings, title: str = "") -> "Plot":
        """Framework capability [B] (SURVEY.md §2.7): composite bucket key
        (bx, by, bz); the histogrammer carries one bin column per axis."""
        if len(exprs) != 3:
            raise ValueError("make3D takes three expressions")
        return cls(name, exprs, selection, binnings, title)

    @property
    def ndim(self) -> int:
        return len(self.exprs)

    def bin_cols(self) -> list[Column]:
        return [b.bin_col(e) for e, b in zip(self.exprs, self.binnings)]
