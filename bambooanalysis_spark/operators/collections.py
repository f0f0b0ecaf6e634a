"""Within-event collection operators — the ``op.*`` analog surface.

The reference's query vocabulary (SURVEY.md §2.2-§2.5; treefunctions usage in
/root/reference/phaseII-analysis.py and jet_test.py) operates on variable-
length per-event collections. Here a collection is an ``array<struct<...>>``
Column and every operator lowers to a Spark higher-order function — JVM-side,
codegen-friendly, scale-independent (no explode, no shuffle: all work stays
inside the row).

Lambdas receive an :class:`Obj` proxy so analysis code reads like the
reference (``lambda el: el.pt > 20.``). ``Obj.p4`` returns the struct itself;
kinematic functions consume pt/eta/phi/mass fields from it.

Indexing is 0-based like the reference (``coll[0]`` = leading object,
phaseII-analysis.py:331) and maps to Spark's 1-based ``element_at``;
out-of-range yields NULL, which the histogrammer drops — matching "only
filled under a selection that guarantees length" (SURVEY.md §2.5).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions import physics as _phys


class Obj:
    """Lightweight proxy over a struct Column: ``obj.pt`` -> ``col['pt']``."""

    __slots__ = ("_col",)

    def __init__(self, col: Column):
        object.__setattr__(self, "_col", col)

    @property
    def col(self) -> Column:
        return self._col

    @property
    def p4(self) -> Column:
        # Four-momentum view: the struct itself (pt/eta/phi/mass fields).
        return self._col

    def __getattr__(self, name: str) -> Column:
        return self._col[name]

    def __getitem__(self, name: str) -> Column:
        return self._col[name]


def _unwrap(x):
    return x.col if isinstance(x, Obj) else x


def _wrap_pred(pred: Callable) -> Callable[[Column], Column]:
    return lambda c: pred(Obj(c))


class Collection:
    """An array<struct> Column with 0-based indexing, like a decorated
    collection in the reference (``t.elec``, ``muons`` ...)."""

    __slots__ = ("col",)

    def __init__(self, col: Column):
        self.col = col

    def __getitem__(self, i: int) -> Obj:
        # try_element_at: out-of-range -> NULL (Spark 4 ANSI element_at
        # throws instead). NULL then flows into cuts/bins and is dropped,
        # matching the reference's "only filled under a guarding selection".
        return Obj(F.try_element_at(self.col, F.lit(i + 1)))


def _as_arr(coll) -> Column:
    return coll.col if isinstance(coll, Collection) else coll


# --- op.* analogs ----------------------------------------------------------

def select(coll, pred: Callable | None = None) -> Collection:
    """op.select: within-event filter, order preserved
    (phaseII-analysis.py:306-344). No predicate = identity."""
    arr = _as_arr(coll)
    if pred is None:
        return Collection(arr)
    return Collection(F.filter(arr, _wrap_pred(pred)))


def rng_len(coll) -> Column:
    """op.rng_len: item count (phaseII-analysis.py:350)."""
    return F.size(_as_arr(coll))


def rng_any(coll, pred: Callable) -> Column:
    """op.rng_any: correlated EXISTS over another collection of the same
    event (phaseII-analysis.py:315) — the per-event semi-join shape."""
    return F.exists(_as_arr(coll), _wrap_pred(pred))


def rng_count(coll, pred: Callable) -> Column:
    """Count of items passing pred (Bamboo rng_count [B])."""
    return F.size(F.filter(_as_arr(coll), _wrap_pred(pred)))


def rng_sum(coll, fn: Callable, zero=0.0, dtype: str = "double") -> Column:
    """Sum of fn(item) over the collection (Bamboo rng_sum [B])."""
    return F.aggregate(
        _as_arr(coll),
        F.lit(zero).cast(dtype),
        lambda acc, x: acc + fn(Obj(x)).cast(dtype),
    )


def rng_max(coll, fn: Callable) -> Column:
    """Max of fn(item) (Bamboo rng_max [B]); NULL on empty."""
    return F.array_max(F.transform(_as_arr(coll), _wrap_pred(fn)))


def rng_min(coll, fn: Callable) -> Column:
    """Min of fn(item) (Bamboo rng_min [B]); NULL on empty."""
    return F.array_min(F.transform(_as_arr(coll), _wrap_pred(fn)))


def rng_max_element_by(coll, fn: Callable) -> Obj:
    """Item maximizing fn(item) (Bamboo rng_max_element_by [B]): sort
    descending by the key and take the head."""
    arr = _as_arr(coll)
    sorted_arr = F.array_sort(
        arr,
        lambda a, b: F.when(fn(Obj(a)) > fn(Obj(b)), F.lit(-1))
        .when(fn(Obj(a)) < fn(Obj(b)), F.lit(1))
        .otherwise(F.lit(0)),
    )
    return Obj(F.try_element_at(sorted_arr, F.lit(1)))


def rng_min_element_by(coll, fn: Callable) -> Obj:
    """Item minimizing fn(item) (Bamboo rng_min_element_by [B]): stable
    ascending sort by the key, take the head — ties keep collection order
    (the ingest pT-descending invariant), mirrored by the oracles' explicit
    tie-break keys."""
    arr = _as_arr(coll)
    sorted_arr = F.array_sort(
        arr,
        lambda a, b: F.when(fn(Obj(a)) < fn(Obj(b)), F.lit(-1))
        .when(fn(Obj(a)) > fn(Obj(b)), F.lit(1))
        .otherwise(F.lit(0)),
    )
    return Obj(F.try_element_at(sorted_arr, F.lit(1)))


def rng_find(coll, pred: Callable) -> Obj:
    """First item satisfying pred, in collection order (Bamboo rng_find
    [B]); NULL-valued Obj when none matches. F.filter preserves order, so
    head-of-filtered is exactly 'first match'."""
    return Obj(F.try_element_at(F.filter(_as_arr(coll), _wrap_pred(pred)), F.lit(1)))


def switch(cond: Column, if_true, if_false) -> Column:
    """op.switch [B]: two-way conditional expression."""
    return F.when(cond, if_true).otherwise(if_false)


def multi_switch(*args) -> Column:
    """op.multiSwitch [B]: ((cond, value), ..., default) — first matching
    condition wins, like a chained CASE WHEN."""
    *cases, default = args
    out = None
    for cond, val in cases:
        out = F.when(cond, val) if out is None else out.when(cond, val)
    return default if out is None else out.otherwise(default)


def sort(coll, keys: list[tuple[Callable, bool]]) -> Collection:
    """op.sort [B]: stable multi-key sort. ``keys`` = [(fn, descending)].

    Guarantees the pT-descending ordering invariant the reference *assumes*
    of its input (SURVEY.md §2.8) — we enforce it instead.
    """
    arr = _as_arr(coll)

    def cmp(a: Column, b: Column) -> Column:
        oa, ob = Obj(a), Obj(b)
        expr = F.lit(0)
        for fn, desc in reversed(keys):
            ka, kb = fn(oa), fn(ob)
            lt, gt = (F.lit(1), F.lit(-1)) if desc else (F.lit(-1), F.lit(1))
            expr = F.when(ka < kb, lt).when(ka > kb, gt).otherwise(expr)
        return expr

    return Collection(F.array_sort(arr, cmp))


def sort_by_pt(coll) -> Collection:
    """pT-descending with deterministic tie-breaks on the remaining kinematic
    fields — used at ingest to establish the 'leading object' invariant."""
    return sort(
        coll,
        [
            (lambda o: o.pt, True),
            (lambda o: o.phi, False),
            (lambda o: o.eta, False),
            (lambda o: o.mass, False),
        ],
    )


def combine(coll, pred: Callable | None = None) -> Collection:
    """op.combine(2) [B]: all unordered pairs (i<j) as array<struct<_1,_2>>,
    optionally filtered by ``pred(a, b)``.

    Pure higher-order functions: for each index i, pair item i with the
    slice (i+1..n). Arrays are per-event (small), so this stays inside the
    row — no explode/shuffle. For cross-EVENT combinatorics use a relational
    self-join instead (that path shuffles and scales out).
    """
    arr = _as_arr(coll)
    n = F.size(arr)
    pairs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.greatest(n - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("_1"), y.alias("_2")),
            ),
        )
    )
    if pred is not None:
        pairs = F.filter(pairs, lambda p: pred(Obj(p["_1"]), Obj(p["_2"])))
    return Collection(pairs)


# --- scalar op analogs (thin wrappers so analyses mirror the reference) ----

def AND(*conds) -> Column:
    out = None
    for c in conds:
        c = _unwrap(c)
        out = c if out is None else out & c
    return out


def OR(*conds) -> Column:
    out = None
    for c in conds:
        c = _unwrap(c)
        out = c if out is None else out | c
    return out


def NOT(cond) -> Column:
    return ~_unwrap(cond)


def abs_(x) -> Column:
    return F.abs(_unwrap(x))


def product(a, b) -> Column:
    return _unwrap(a) * _unwrap(b)


def in_range(lo, x, hi) -> Column:
    return _phys.in_range_open(lo, _unwrap(x), hi)


def deltaR(p4a, p4b) -> Column:
    a, b = _unwrap(p4a), _unwrap(p4b)
    return _phys.delta_r(a["eta"], a["phi"], b["eta"], b["phi"])


def invariant_mass(p4a, p4b) -> Column:
    return _phys.invariant_mass_p4(_unwrap(p4a), _unwrap(p4b))


def bit(x, k: int) -> Column:
    return _phys.bit_set(_unwrap(x), k)
