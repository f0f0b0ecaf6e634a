"""Selection DAG — the reference's core query-plan shape.

A Selection is a named node in a cut DAG (SURVEY.md §2.6): its condition is
the conjunction of its parent's condition and its own cuts, and its weight is
the product of its parent's weight and its own weight factors
(``Selection.refine``, /root/reference/phaseII-analysis.py:349-363 builds a
6-deep chain; jet_test.py:416-518 a 52-node fan-out).

Spark realization: each node is a boolean mask Column over the SAME
DataFrame — never a separate ``df.filter`` job. The histogrammer evaluates
every node's mask in one pass; Catalyst common-subexpression elimination
dedupes the shared parent conjuncts inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


class Selection:
    """A node in the cut DAG. Create the root with :meth:`root`, children
    with :meth:`refine` (mirrors bamboo's ``noSel`` / ``Selection.refine``).
    """

    def __init__(
        self,
        name: str,
        cond: Column,
        weight: Column,
        parent: "Selection | None" = None,
    ):
        self.name = name
        self.cond = cond
        self.weight = weight
        self.parent = parent
        self.children: list[Selection] = []

    @classmethod
    def root(cls, name: str = "noSel", weight: Column | None = None) -> "Selection":
        """The no-cut selection (mask true, weight 1) — ``noSel``."""
        return cls(name, F.lit(True), weight if weight is not None else F.lit(1.0))

    def refine(
        self,
        name: str,
        cut: Column | list[Column] | None = None,
        weight: Column | list[Column] | None = None,
    ) -> "Selection":
        """Child node: parent AND all cuts; weight multiplied through.

        NULL cuts (e.g. predicates over out-of-range ``element_at``) are
        treated as False, matching "an event that cannot be evaluated does
        not pass" — important because Spark three-valued logic would
        otherwise propagate NULL into the mask.
        """
        cuts = cut if isinstance(cut, (list, tuple)) else ([cut] if cut is not None else [])
        local_cut = None
        for c in cuts:
            c = F.coalesce(c.cast("boolean"), F.lit(False))
            local_cut = c if local_cut is None else (local_cut & c)
        cond = self.cond if local_cut is None else (self.cond & local_cut)
        w = self.weight
        local_weight = None
        weights = (
            weight if isinstance(weight, (list, tuple)) else ([weight] if weight is not None else [])
        )
        for wf in weights:
            local_weight = wf if local_weight is None else (local_weight * wf)
            w = w * wf
        child = Selection(name, cond, w, parent=self)
        # incremental pieces kept so the histogrammer can evaluate the DAG
        # hierarchically (each node's mask = parent mask column AND local
        # cut — shared prefixes computed exactly once per event)
        child.local_cut = local_cut
        child.local_weight = local_weight
        self.children.append(child)
        return child

    def lineage(self) -> list["Selection"]:
        """Root-to-this chain of nodes."""
        chain, node = [], self
        while node is not None:
            chain.append(node)
            node = node.parent
        return list(reversed(chain))

    def __repr__(self) -> str:  # pragma: no cover
        return f"Selection({self.name!r})"
