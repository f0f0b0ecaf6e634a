"""token_budget_mix (operators/sampling.py): water-filling mixture solver.

The correctness bar is an INDEPENDENT straight-Python transcription of the
spec (sorted quantized ratios, exact cross-multiplied saturation test,
floor shares + largest-remainder) that shares no code with the operator —
the same gate style as test_registered_domain_from_vs_python_reference.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bambooanalysis_spark.operators.sampling import token_budget_mix


def _py_waterfill(avail_w, budget, scale=10_000):
    """Independent reference: dicts + sorts, no Spark, no shared helpers."""
    rows = []
    for s, (a, w) in sorted(avail_w.items()):
        rkey = (a // w) * scale + ((a % w) * scale) // w
        rows.append((s, a, w, rkey))
    rows.sort(key=lambda r: (r[3], r[0]))
    wtot = sum(r[2] for r in rows)
    a_prev = w_prev = 0
    sat = {}
    broke = False
    for s, a, w, _ in rows:
        ok = (not broke) and a * (wtot - w_prev) <= (budget - a_prev) * w
        if not ok:
            broke = True
        sat[s] = ok
        a_prev += a
        w_prev += w
    granted = sum(a for s, a, w, _ in rows if sat[s])
    r = budget - granted
    w_unsat = sum(w for s, a, w, _ in rows if not sat[s])
    out, rem = {}, {}
    for s, a, w, _ in rows:
        if sat[s]:
            out[s] = a
        else:
            out[s] = (r * w) // w_unsat
            rem[s] = (r * w) % w_unsat
    leftover = r - sum(out[s] for s in rem)
    for i, (s, _) in enumerate(sorted(rem.items(), key=lambda kv: (-kv[1], kv[0]))):
        if i < leftover:
            out[s] += 1
    # spec step 4: clamp unsaturated shares at availability (binds only in
    # sub-1/ratio_scale ratio-tie mis-orders)
    for s, a, w, _ in rows:
        if not sat[s]:
            out[s] = min(out[s], a)
    return {s: (out[s], sat[s]) for s, a, w, _ in rows}


def _mk_docs(spark, avail_w, seed=0):
    """Split each stratum's availability over several doc rows."""
    rng = random.Random(seed)
    data, did = [], 0
    for s, (a, _w) in sorted(avail_w.items()):
        left = a
        while left > 0:
            take = min(left, rng.randint(1, max(1, a // 3 + 1)))
            data.append((did, s, take))
            did += 1
            left -= take
        if a == 0:
            data.append((did, s, 0))
            did += 1
    return spark.createDataFrame(data, "doc_id long, src string, toks long")


def test_token_budget_mix_matches_python_reference(spark):
    rng = random.Random(11)
    for trial in range(12):
        n = rng.randint(1, 10)
        avail_w = {
            f"s{i:02d}": (rng.randint(0, 5000), rng.randint(1, 9))
            for i in range(n)
        }
        budget = rng.randint(0, 9000)
        df = _mk_docs(spark, avail_w, seed=trial)
        res = token_budget_mix(
            df, "src", "toks", budget,
            weights={s: w for s, (a, w) in avail_w.items()},
        )
        got = {
            r["strata"]: (r["alloc_tokens"], r["saturated"])
            for r in res.collect()
        }
        want = _py_waterfill(avail_w, budget)
        assert got == want, (trial, avail_w, budget)


def test_token_budget_mix_total_is_exact(spark):
    avail_w = {"a": (100, 1), "b": (300, 2), "c": (50, 5)}
    df = _mk_docs(spark, avail_w)
    w = {s: wv for s, (a, wv) in avail_w.items()}
    # oversubscribed: total == budget
    rows = token_budget_mix(df, "src", "toks", 200, weights=w).collect()
    assert sum(r["alloc_tokens"] for r in rows) == 200
    # undersubscribed: total == total available, everyone saturated
    rows = token_budget_mix(df, "src", "toks", 10_000, weights=w).collect()
    assert sum(r["alloc_tokens"] for r in rows) == 450
    assert all(r["saturated"] for r in rows)
    assert all(r["alloc_tokens"] == r["avail_tokens"] for r in rows)


def test_token_budget_mix_equal_weights_split_within_one(spark):
    # 4 equal strata, none saturated: shares differ by at most 1 and the
    # largest-remainder +1s land deterministically (by stratum name)
    avail_w = {f"x{i}": (1000, 1) for i in range(4)}
    df = _mk_docs(spark, avail_w)
    rows = token_budget_mix(df, "src", "toks", 1002).collect()
    allocs = sorted((r["strata"], r["alloc_tokens"]) for r in rows)
    assert [a for _, a in allocs] == [251, 251, 250, 250]
    assert sum(a for _, a in allocs) == 1002


def test_token_budget_mix_rate_e6(spark):
    avail_w = {"a": (1000, 1), "b": (1000, 1)}
    df = _mk_docs(spark, avail_w)
    rows = token_budget_mix(df, "src", "toks", 500).collect()
    for r in rows:
        assert r["rate_e6"] == (r["alloc_tokens"] * 1_000_000) // r["avail_tokens"]


def test_token_budget_mix_null_strata_excluded(spark):
    df = spark.createDataFrame(
        [(0, "a", 100), (1, None, 100), (2, "a", 50)],
        "doc_id long, src string, toks long",
    )
    rows = token_budget_mix(df, "src", "toks", 1000).collect()
    assert len(rows) == 1 and rows[0]["avail_tokens"] == 150


def test_token_budget_mix_input_validation(spark):
    df = spark.createDataFrame([(0, "a", 10)], "doc_id long, src string, toks long")
    with pytest.raises(ValueError, match="non-negative"):
        token_budget_mix(df, "src", "toks", -1)
    with pytest.raises(ValueError, match="positive integers"):
        token_budget_mix(df, "src", "toks", 10, weights={"a": 0})
    with pytest.raises(ValueError, match="budget too large"):
        token_budget_mix(df, "src", "toks", (1 << 62) // 1_000_000 + 1)


def test_token_budget_mix_weight_above_ratio_scale_rejected(spark):
    """Review r10 repro: weights above ratio_scale defeat the quantized
    sort's tie-safety — a mis-ordered stratum could be handed a share far
    above its availability (observed alloc 201 for avail 45). Such weight
    vectors are rejected at call time."""
    df = spark.createDataFrame(
        [(0, "s0", 271), (1, "s1", 45), (2, "s2", 250), (3, "s3", 215)],
        "doc_id long, src string, toks long",
    )
    with pytest.raises(ValueError, match="ratio_scale"):
        token_budget_mix(
            df, "src", "toks", 602,
            weights={"s0": 10**7, "s1": 10**7, "s2": 2, "s3": 10**7},
        )


def test_token_budget_mix_negative_token_sum_raises(spark):
    df = spark.createDataFrame(
        [(0, "a", 10), (1, "b", -20)], "doc_id long, src string, toks long"
    )
    with pytest.raises(Exception, match="negative token sum"):
        token_budget_mix(df, "src", "toks", 5).collect()


def test_token_budget_mix_alloc_never_exceeds_avail_randomized(spark):
    """Invariant (a) directly, across random draws including weight ==
    ratio_scale at a coarse scale where quantization ties are common."""
    import random

    rng = random.Random(23)
    for trial in range(6):
        scale = rng.choice([1, 2, 10_000])
        n = rng.randint(2, 8)
        avail_w = {
            f"s{i:02d}": (rng.randint(0, 500), rng.randint(1, scale))
            for i in range(n)
        }
        budget = rng.randint(0, 1500)
        df = _mk_docs(spark, avail_w, seed=100 + trial)
        rows = token_budget_mix(
            df, "src", "toks", budget,
            weights={s: w for s, (a, w) in avail_w.items()},
            ratio_scale=scale,
        ).collect()
        for r in rows:
            assert r["alloc_tokens"] <= r["avail_tokens"], (trial, scale, r)
        assert sum(r["alloc_tokens"] for r in rows) <= min(
            budget, sum(a for a, _ in avail_w.values())
        )


def test_token_budget_mix_overflow_guard_raises_in_plan(spark):
    # one stratum holding more tokens than the exact-BIGINT bound allows
    df = spark.createDataFrame(
        [(0, "a", (1 << 62) // 10_000 + 7)], "doc_id long, src string, toks long"
    )
    with pytest.raises(Exception, match="pre-scale the token counts"):
        token_budget_mix(df, "src", "toks", 100).collect()


def test_token_budget_mix_plan_shape(spark):
    # the corpus is touched by exactly one hash aggregate; no Python UDFs
    avail_w = {f"s{i}": (500 + i, 1 + i % 3) for i in range(6)}
    df = _mk_docs(spark, avail_w)
    out = token_budget_mix(
        df, "src", "toks", 900, weights={s: w for s, (a, w) in avail_w.items()}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEval" not in plan and "BatchEval" not in plan
    assert "PythonUDF" not in plan


# --- materialize_token_mix ----------------------------------------------------

def _py_materialize(rows, alloc, n_buckets=10_000, salt="mix"):
    """Independent reference for the two-grain greedy prefix: rows are
    (doc_id, stratum, tokens); returns {doc_id: kept}."""
    import hashlib

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    staged = [
        (s, h64(f"{i}{salt}") % n_buckets, h64(f"{i}{salt}"), i, t)
        for i, s, t in rows
    ]
    kept = {}
    strata = sorted({s for s, *_ in staged})
    for s in strata:
        a = alloc.get(s, 0)
        mine = sorted(
            [r for r in staged if r[0] == s], key=lambda r: (r[1], r[2], r[3])
        )
        # bucket sums in bucket order
        from itertools import groupby

        cum_before = 0
        for b, grp in groupby(mine, key=lambda r: r[1]):
            grp = list(grp)
            bt = sum(r[4] for r in grp)
            if cum_before + bt <= a:
                for r in grp:
                    kept[r[3]] = 1
            else:
                remaining = max(a - cum_before, 0)
                c = 0
                for r in grp:
                    c += r[4]
                    kept[r[3]] = 1 if c <= remaining else 0
            cum_before += bt
    return kept


def test_materialize_matches_python_reference(spark):
    import random

    from bambooanalysis_spark.operators.sampling import materialize_token_mix

    rng = random.Random(3)
    for trial in range(6):
        n = rng.randint(5, 60)
        rows = [
            (i, f"s{rng.randint(0, 3)}", rng.randint(0, 50)) for i in range(n)
        ]
        alloc = {f"s{j}": rng.randint(0, 400) for j in range(4)}
        df = spark.createDataFrame(rows, "doc_id long, src string, toks long")
        adf = spark.createDataFrame(
            sorted(alloc.items()), "strata string, alloc_tokens long"
        )
        got = {
            r["doc_id"]: r["kept_i"]
            for r in materialize_token_mix(df, adf, "src", "toks").collect()
        }
        want = _py_materialize(rows, alloc)
        assert got == want, (trial, rows, alloc)
        # never exceeds the allocation
        by_s = {}
        for i, s, t in rows:
            if got[i]:
                by_s[s] = by_s.get(s, 0) + t
        assert all(v <= alloc[s] for s, v in by_s.items())


def test_materialize_stable_under_repartition(spark):
    from bambooanalysis_spark.operators.sampling import materialize_token_mix

    rows = [(i, f"s{i % 3}", (i * 7) % 40) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, src string, toks long")
    adf = spark.createDataFrame(
        [("s0", 300), ("s1", 100), ("s2", 700)], "strata string, alloc_tokens long"
    )
    a = {r["doc_id"]: r["kept_i"]
         for r in materialize_token_mix(df, adf, "src", "toks").collect()}
    b = {r["doc_id"]: r["kept_i"]
         for r in materialize_token_mix(
             df.repartition(13), adf, "src", "toks").collect()}
    assert a == b


def test_materialize_unknown_stratum_keeps_nothing(spark):
    from bambooanalysis_spark.operators.sampling import materialize_token_mix

    df = spark.createDataFrame(
        [(1, "known", 5), (2, "ghost", 5)], "doc_id long, src string, toks long"
    )
    adf = spark.createDataFrame([("known", 100)], "strata string, alloc_tokens long")
    got = {r["doc_id"]: r["kept_i"]
           for r in materialize_token_mix(df, adf, "src", "toks").collect()}
    assert got == {1: 1, 2: 0}


def test_materialize_negative_tokens_raise(spark):
    import pytest

    from bambooanalysis_spark.operators.sampling import materialize_token_mix

    df = spark.createDataFrame(
        [(1, "a", -5)], "doc_id long, src string, toks long"
    )
    adf = spark.createDataFrame([("a", 100)], "strata string, alloc_tokens long")
    with pytest.raises(Exception, match="negative token count"):
        materialize_token_mix(df, adf, "src", "toks").collect()


def test_materialize_plan_no_python_no_strata_window(spark):
    """The corpus-side window must be partitioned by (stratum, bucket),
    never by the stratum alone — the skew guarantee the docstring claims."""
    from bambooanalysis_spark.operators.sampling import materialize_token_mix

    df = spark.createDataFrame(
        [(i, f"s{i % 2}", i % 9) for i in range(100)],
        "doc_id long, src string, toks long",
    )
    adf = spark.createDataFrame(
        [("s0", 50), ("s1", 50)], "strata string, alloc_tokens long"
    )
    out = materialize_token_mix(df, adf, "src", "toks")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEval" not in plan and "BatchEval" not in plan
    import re

    # review r10: assert the regex actually matched, or a plan-format
    # drift would turn this skew pin vacuous
    per_doc = [
        m
        for m in re.finditer(
            r"Window \[sum\([^]]*windowspecdefinition\(([^)]*)\)", plan
        )
        if "__tm_t" in m.group(0)  # the per-document cumulative sum
    ]
    assert per_doc, "per-document window not found in plan — format drift?"
    for m in per_doc:
        assert "__tm_b" in m.group(1)  # bucket is part of the partition key


def test_materialize_duplicate_alloc_rows_healed(spark):
    """An alloc table unioned twice must not duplicate corpus rows or
    inflate the budget; conflicting duplicates heal to the MIN."""
    from bambooanalysis_spark.operators.sampling import materialize_token_mix

    df = spark.createDataFrame(
        [(i, "a", 10) for i in range(10)], "doc_id long, src string, toks long"
    )
    adf = spark.createDataFrame(
        [("a", 50), ("a", 50), ("a", 30)], "strata string, alloc_tokens long"
    )
    out = materialize_token_mix(df, adf, "src", "toks").collect()
    assert len(out) == 10  # no row multiplication
    kept_tokens = sum(10 for r in out if r["kept_i"] == 1)
    assert kept_tokens <= 30  # MIN allocation wins


def test_token_budget_mix_null_token_stratum_counts_zero(spark):
    """Review r10 pass 2 repro: an all-NULL-token stratum must count as 0
    available (matching materialize_token_mix's NULL-is-0), not slip
    through as NULL and be handed real budget."""
    df = spark.createDataFrame(
        [(0, "a", 100), (1, "b", None), (2, "b", None)],
        "doc_id long, src string, toks long",
    )
    rows = {r["strata"]: r for r in
            token_budget_mix(df, "src", "toks", 150).collect()}
    assert rows["b"]["avail_tokens"] == 0
    assert rows["b"]["alloc_tokens"] == 0 and rows["b"]["saturated"]
    assert rows["a"]["alloc_tokens"] == 100


def test_token_budget_mix_oracle_all_null_stratum_parity():
    """ADVICE r10: the contract oracle's counts CTE must COALESCE per-row
    (SUM over an all-NULL stratum is NULL in plain SQL) to mirror the
    operator's NULL-is-0. Runs the REGISTERED oracle SQL in DuckDB on a
    fixture containing an all-NULL-token stratum and checks the
    avail/alloc columns against the independent Python water-fill."""
    import duckdb
    import pandas as pd

    from bambooanalysis_spark.contract.approx import (
        _TBM_BUDGET,
        ORACLE_SAMPLING_TOKEN_BUDGET_MIX,
    )

    rows = []
    did = 0
    for i in range(8):
        src = f"src{i}"
        for j in range(20):
            # src3 is the all-NULL stratum the ADVICE hazard names
            n = None if i == 3 else 700 + 31 * i + j
            rows.append((did, src, n))
            did += 1
    docs = pd.DataFrame(rows, columns=["doc_id", "source", "n_chars"])
    docs["n_chars"] = docs["n_chars"].astype("Int64")
    con = duckdb.connect()
    con.register("documents", docs)
    got = {
        r[0]: r
        for r in con.execute(ORACLE_SAMPLING_TOKEN_BUDGET_MIX).fetchall()
    }
    con.close()

    avail_w = {}
    for i in range(8):
        a = 0 if i == 3 else sum(700 + 31 * i + j for j in range(20))
        avail_w[f"src{i}"] = (a, 1 + (i % 4))
    want = _py_waterfill(avail_w, _TBM_BUDGET)
    assert got["src3"][1] == 0, "all-NULL stratum must have avail 0, not NULL"
    for s, (alloc, sat) in want.items():
        assert got[s][4] == alloc and got[s][3] == sat, (s, got[s], alloc, sat)
