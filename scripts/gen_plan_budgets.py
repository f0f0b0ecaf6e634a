#!/usr/bin/env python
"""Snapshot plan-shape budgets for the standing bench entries.

For each bench.py headline query, record the executed-plan operator
counts that matter at 100 TB — Exchange (shuffles), BatchEvalPython /
ArrowEvalPython (row-at-a-time vs Arrow Python), BroadcastNestedLoopJoin
and CartesianProduct (the quadratic plans) — into
tests/plan_budgets.json. `tests/test_plan_budget.py` then fails any
future change that INCREASES a count (a silent extra shuffle or a new
Python stage in a hot path), while decreases just prompt re-running this
script with --write.

Counts come from the INITIAL executed plan (before AQE mutates it at
runtime), which is deterministic for a fixed fixture. sf0.01 keeps
model-fitting entries (kmeans, LM) cheap.

    python scripts/gen_plan_budgets.py --write
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "plan_budgets.json",
)
COUNTERS = [
    "Exchange",
    "BatchEvalPython",
    "ArrowEvalPython",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
]


def targets() -> dict:
    """Everything budgeted: the bench headline entries plus EVERY
    registered contract query (r7 added the rel_* family; since r9 the
    budget covers every registration, whatever the current count —
    tests/plan_budgets.json is the authoritative list) — the generic
    counter gate catches what bespoke plan asserts forget, e.g. a
    refactor that re-adds a forced broadcast or a Python stage in any
    operator family."""
    import bench
    from bambooanalysis_spark.contract import QUERIES

    out = dict(bench._headline())
    for name, fn in QUERIES.items():
        out.setdefault(name, fn)
    return out


def collect() -> dict[str, dict[str, int]]:
    from bambooanalysis_spark.session import get_spark

    spark = get_spark("plan-budgets")
    budgets: dict[str, dict[str, int]] = {}
    for name, fn in targets().items():
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        budgets[name] = {c: plan.count(c) for c in COUNTERS}
    return budgets


def main() -> None:
    budgets = collect()
    if "--write" in sys.argv:
        with open(OUT, "w") as fh:
            json.dump(budgets, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {OUT}")
    else:
        print(json.dumps(budgets, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
