"""corpus_kl_drift / corpus_kl_e9: fixed-point snapshot-drift KL.

Gate: an independent math.log Python reference (no LUT, no shared code)
within the documented LUT quantization bound, plus planted-drift
direction and guard behavior.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bambooanalysis_spark.operators.corpus import corpus_kl_drift, corpus_kl_e9


def _py_kl(texts_a, texts_b):
    """Smoothed unigram KL(P_a || P_b) in nats, straight floats."""
    ca, cb = {}, {}
    for t in texts_a:
        for tok in t.split():
            if tok:
                ca[tok] = ca.get(tok, 0) + 1
    for t in texts_b:
        for tok in t.split():
            if tok:
                cb[tok] = cb.get(tok, 0) + 1
    vocab = set(ca) | set(cb)
    v = len(vocab)
    na, nb = sum(ca.values()), sum(cb.values())
    kl = 0.0
    for tok in vocab:
        p = (ca.get(tok, 0) + 1) / (na + v)
        q = (cb.get(tok, 0) + 1) / (nb + v)
        kl += p * math.log(p / q)
    return kl


def test_corpus_kl_matches_float_reference(spark):
    texts_a = ["spark table scan join", "table scan filter", "join join agg",
               "spark spark spark window"]
    texts_b = ["table scan filter agg", "window sort merge", "filter filter"]
    a = spark.createDataFrame([(i, t) for i, t in enumerate(texts_a)],
                              "doc_id long, text string")
    b = spark.createDataFrame([(i, t) for i, t in enumerate(texts_b)],
                              "doc_id long, text string")
    drift = corpus_kl_drift(a, b, "text")
    kl_e9 = corpus_kl_e9(drift).collect()[0]["kl_e9"]
    want = _py_kl(texts_a, texts_b)
    # small counts -> every LUT entry exact to 1e-6; the only slack is
    # floor accumulation across terms
    assert abs(kl_e9 / 1e9 - want) < 1e-4, (kl_e9 / 1e9, want)
    assert kl_e9 >= 0


def test_corpus_kl_zero_for_identical_corpora(spark):
    texts = ["alpha beta gamma", "beta beta delta"]
    a = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                              "doc_id long, text string")
    drift = corpus_kl_drift(a, a, "text")
    rows = drift.collect()
    assert all(r["delta_log_e6"] == 0 and r["contrib_num"] == 0 for r in rows)
    assert corpus_kl_e9(drift).collect()[0]["kl_e9"] == 0


def test_corpus_kl_planted_drift_direction(spark):
    """A token over-represented in snapshot A gets a positive delta and
    dominates the positive contributions."""
    base = ["common words here"] * 3
    a = spark.createDataFrame(
        [(i, t) for i, t in enumerate(base + ["novel novel novel novel"])],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(i, t) for i, t in enumerate(base)], "doc_id long, text string"
    )
    rows = {r["token"]: r for r in corpus_kl_drift(a, b, "text").collect()}
    assert rows["novel"]["delta_log_e6"] > 0
    assert rows["novel"]["contrib_num"] == max(
        r["contrib_num"] for r in rows.values()
    )
    # a token only in B drifts negative
    b2 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(base + ["ghost ghost"])],
        "doc_id long, text string",
    )
    rows2 = {r["token"]: r for r in corpus_kl_drift(a, b2, "text").collect()}
    assert rows2["ghost"]["delta_log_e6"] < 0 and rows2["ghost"]["count_a"] == 0


def test_corpus_kl_plan_no_python_and_bounded_broadcasts(spark):
    a = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    b = spark.createDataFrame([(1, "x y w")], "doc_id long, text string")
    out = corpus_kl_drift(a, b, "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEval" not in plan and "BatchEval" not in plan
    # the vocabulary is never windowed in a single partition
    assert "windowspecdefinition()" not in plan.replace(" ", "")


def test_corpus_kl_e9_empty_is_zero_not_null(spark):
    a = spark.createDataFrame([], "doc_id long, text string")
    drift = corpus_kl_drift(a, a, "text")
    assert corpus_kl_e9(drift).collect()[0]["kl_e9"] == 0


# --- windowed drift vs reference (streaming-adjacent) ---------------------------

def test_windowed_value_counts_streaming_matches_batch(spark, tmp_path, sf_oracle):
    """The SAME rollup as a real Structured Streaming query (file source,
    availableNow, memory sink) and as batch — results must agree; the
    drift computed from each must agree too."""
    from bambooanalysis_spark.contract.extensions import _events
    from bambooanalysis_spark.operators.corpus import windowed_kl_vs_reference
    from bambooanalysis_spark.streaming.windows import windowed_value_counts

    events = _events(spark, sf_oracle).limit(2000)
    src = str(tmp_path / "drift_stream")
    events.write.parquet(src)
    events = spark.read.parquet(src)  # fix the row set for both paths

    batch_wc = windowed_value_counts(events, "ts", "event_type", "1 hour")
    batch = {(r["window_start"], r["token"]): r["n"] for r in batch_wc.collect()}

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = windowed_value_counts(stream, "ts", "event_type", "1 hour",
                                watermark="2 hours")
    q = (out.writeStream.format("memory").queryName("drift_wc")
         .outputMode("complete").trigger(availableNow=True).start())
    # a timeout must fail HERE, not as a confusing partial-result diff
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    got_wc = spark.sql("SELECT * FROM drift_wc")
    got = {(r["window_start"], r["token"]): r["n"] for r in got_wc.collect()}
    assert got == batch and len(got) > 0

    ref = events.groupBy(
        events.event_type.cast("string").alias("token")
    ).agg(F.count(F.lit(1)).alias("n"))
    a = {r["window_start"]: r["kl_e9"]
         for r in windowed_kl_vs_reference(batch_wc, ref).collect()}
    b = {r["window_start"]: r["kl_e9"]
         for r in windowed_kl_vs_reference(got_wc, ref).collect()}
    assert a == b


def test_windowed_kl_identical_reference_near_zero(spark):
    """A window whose distribution IS the reference drifts ~0 (smoothing
    noise only); a window missing a dominant reference token drifts more."""
    from datetime import datetime

    from bambooanalysis_spark.operators.corpus import windowed_kl_vs_reference

    wc = spark.createDataFrame(
        [
            # window 1: matches reference shape exactly
            (datetime(2024, 1, 1, 0), "click", 80),
            (datetime(2024, 1, 1, 0), "view", 20),
            # window 2: 'click' collapsed
            (datetime(2024, 1, 1, 1), "click", 2),
            (datetime(2024, 1, 1, 1), "view", 98),
        ],
        "window_start timestamp, token string, n long",
    )
    ref = spark.createDataFrame(
        [("click", 800), ("view", 200)], "token string, n long"
    )
    rows = {r["window_start"].hour: r
            for r in windowed_kl_vs_reference(wc, ref).collect()}
    assert rows[0]["kl_e9"] < 5_000_000       # < 0.005 nats: same shape
    assert rows[1]["kl_e9"] > 100_000_000     # > 0.1 nats: collapsed head
    assert rows[0]["n_tokens"] == 100 and rows[0]["v_union"] == 2


def test_windowed_kl_token_missing_from_reference_counted(spark):
    """Union-vocabulary semantics: a window token absent from the
    reference still enters V and contributes positive drift."""
    from datetime import datetime

    from bambooanalysis_spark.operators.corpus import windowed_kl_vs_reference

    wc = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0), "novel", 50),
         (datetime(2024, 1, 1, 0), "click", 50)],
        "window_start timestamp, token string, n long",
    )
    ref = spark.createDataFrame([("click", 100)], "token string, n long")
    row = windowed_kl_vs_reference(wc, ref).collect()[0]
    assert row["v_union"] == 2
    assert row["kl_e9"] > 0


# --- KS drift (numeric CDF) -----------------------------------------------------

def test_ks_drift_hand_computed_and_reference(spark):
    import random

    from bambooanalysis_spark.operators.corpus import ks_drift

    # A={1,2,3,4}, B={3,4,5,6}: CDFs diverge most at v=2 (1.0-0.5... 0.5)
    a = spark.createDataFrame([(v,) for v in [1, 2, 3, 4]], "v long")
    b = spark.createDataFrame([(v,) for v in [3, 4, 5, 6]], "v long")
    r = ks_drift(a, b, "v").collect()[0]
    assert (r["ks_e6"], r["ks_at_value"]) == (500_000, 2)
    assert (r["n_a"], r["n_b"], r["n_values"]) == (4, 4, 6)

    # independent cross-multiplied Python reference on random integers
    rng = random.Random(5)
    xa = [rng.randint(0, 30) for _ in range(200)]
    xb = [rng.randint(5, 35) for _ in range(150)]
    na, nb = len(xa), len(xb)
    best = max(
        abs(sum(1 for x in xa if x <= v) * nb - sum(1 for x in xb if x <= v) * na)
        for v in set(xa) | set(xb)
    )
    want = (best * 1_000_000) // (na * nb)
    sa = spark.createDataFrame([(v,) for v in xa], "v long")
    sb = spark.createDataFrame([(v,) for v in xb], "v long")
    assert ks_drift(sa, sb, "v").collect()[0]["ks_e6"] == want


def test_ks_drift_identical_zero_and_degenerate(spark):
    from bambooanalysis_spark.operators.corpus import ks_drift

    a = spark.createDataFrame([(v,) for v in [1, 2, 2, 9]], "v long")
    assert ks_drift(a, a, "v").collect()[0]["ks_e6"] == 0
    e = spark.createDataFrame([], "v long")
    both = ks_drift(e, e, "v").collect()[0]
    assert both["ks_e6"] == 0 and both["n_values"] == 0
    assert ks_drift(a, e, "v").collect()[0]["ks_e6"] == 1_000_000
    assert ks_drift(e, a, "v").collect()[0]["ks_e6"] == 1_000_000


def test_ks_drift_shift_detected(spark):
    """A location shift the same histogram bucketing could blur is the
    KS statistic's home turf: +10 shift on identical shapes -> large KS."""
    from bambooanalysis_spark.operators.corpus import ks_drift

    base = [v % 20 for v in range(200)]
    a = spark.createDataFrame([(v,) for v in base], "v long")
    b = spark.createDataFrame([(v + 10,) for v in base], "v long")
    r = ks_drift(a, b, "v").collect()[0]
    assert r["ks_e6"] == 500_000  # half the mass separates at the midpoint


def test_windowed_kl_top_movers_planted(spark):
    """The collapsed-head window's top mover must be the collapsed token,
    with the sign telling the direction (under-represented -> negative
    delta)."""
    from datetime import datetime

    import pytest

    from bambooanalysis_spark.operators.corpus import windowed_kl_top_movers

    wc = spark.createDataFrame(
        [
            (datetime(2024, 1, 1, 0), "click", 80),
            (datetime(2024, 1, 1, 0), "view", 20),
            (datetime(2024, 1, 1, 1), "click", 2),
            (datetime(2024, 1, 1, 1), "view", 98),
        ],
        "window_start timestamp, token string, n long",
    )
    ref = spark.createDataFrame(
        [("click", 800), ("view", 200)], "token string, n long"
    )
    rows = windowed_kl_top_movers(wc, ref, k=1).collect()
    by_hour = {r["window_start"].hour: r for r in rows}
    assert len(rows) == 2  # k=1 per window
    # KL(P_window || P_ref) weights by the WINDOW's probability, so the
    # token that absorbed the mass ('view', now 96%) is the top mover,
    # with a positive delta; the collapsed head ranks below it
    assert by_hour[1]["token"] == "view"
    assert by_hour[1]["delta_log_e6"] > 0
    two = windowed_kl_top_movers(wc, ref, k=2).collect()
    h1 = {r["token"]: r for r in two if r["window_start"].hour == 1}
    assert h1["click"]["mover_rank"] == 2
    assert h1["click"]["delta_log_e6"] < 0  # under-represented vs reference
    # rank bound respected at larger k than vocab
    allrows = windowed_kl_top_movers(wc, ref, k=10).collect()
    assert max(r["mover_rank"] for r in allrows) <= 2  # union vocab is 2
    with pytest.raises(ValueError, match="k must be"):
        windowed_kl_top_movers(wc, ref, k=0)


def test_windowed_kl_movers_consistent_with_aggregate(spark):
    """Summing EVERY per-token contribution (k >= vocab) and dividing by
    the window norm reproduces the aggregate's kl_e9 — the two views
    really are one computation."""
    from datetime import datetime

    from bambooanalysis_spark.operators.corpus import (
        windowed_kl_top_movers, windowed_kl_vs_reference,
    )

    wc = spark.createDataFrame(
        [(datetime(2024, 1, 1, h), t, n)
         for h, pairs in [(0, [("a", 50), ("b", 30), ("c", 20)]),
                          (1, [("a", 5), ("b", 90), ("d", 5)])]
         for t, n in pairs],
        "window_start timestamp, token string, n long",
    )
    ref = spark.createDataFrame(
        [("a", 400), ("b", 300), ("c", 200), ("d", 100)],
        "token string, n long",
    )
    agg = {r["window_start"]: r
           for r in windowed_kl_vs_reference(wc, ref).collect()}
    movers = windowed_kl_top_movers(wc, ref, k=100).collect()
    per_win = {}
    for r in movers:
        per_win.setdefault(r["window_start"], []).append(r["contrib_num"])
    for ws, contribs in per_win.items():
        norm = agg[ws]["n_tokens"] + agg[ws]["v_union"]
        s = max(sum(contribs), 0)
        want = (s // norm) * 1000 + ((s % norm) * 1000) // norm
        assert agg[ws]["kl_e9"] == want


def test_ks_drift_oracle_degenerate_cohorts_parity(spark):
    """ADVICE r10: the registered KS oracle must carry the operator's
    degenerate arms (both cohorts empty -> 0, one empty -> 1e6), not
    divide by MAX(n)*0. Runs the REGISTERED oracle SQL in DuckDB on
    events fixtures with one/both cohorts empty and compares against the
    Spark operator on the same rows."""
    import duckdb
    import pandas as pd

    from bambooanalysis_spark.contract.approx import (
        ORACLE_EVENTS_VALUE_KS_DRIFT,
    )
    from bambooanalysis_spark.operators.corpus import ks_drift

    def both_sides(events_pdf):
        con = duckdb.connect()
        con.register("events", events_pdf)
        duck = con.execute(ORACLE_EVENTS_VALUE_KS_DRIFT).df()
        con.close()
        ev = spark.createDataFrame(
            events_pdf if len(events_pdf) else [],
            "user_id long, value double",
        ).withColumn("vc", F.round(F.col("value") * 100).cast("long"))
        got = ks_drift(
            ev.where("user_id % 2 = 0"), ev.where("user_id % 2 <> 0"), "vc"
        ).toPandas()
        return got, duck

    # one cohort empty: every user_id even
    one = pd.DataFrame(
        {"user_id": [0, 2, 4, 6], "value": [1.0, 2.5, 2.5, 9.0]}
    )
    got, duck = both_sides(one)
    assert int(got["ks_e6"][0]) == 1_000_000
    for c in ("n_a", "n_b", "n_values", "ks_e6", "ks_at_value"):
        assert got[c].fillna(-1).tolist() == duck[c].fillna(-1).tolist(), c

    # both cohorts empty
    got, duck = both_sides(pd.DataFrame({"user_id": [], "value": []}))
    assert int(got["ks_e6"][0]) == 0 and int(got["n_values"][0]) == 0
    for c in ("n_a", "n_b", "n_values", "ks_e6"):
        assert got[c].fillna(-1).tolist() == duck[c].fillna(-1).tolist(), c


def test_windowed_hdr_sketch_streaming_matches_batch(spark, tmp_path, sf_oracle):
    """The windowed HDR sketch as a real Structured Streaming query
    (file source, availableNow, memory sink) and as batch — the bucket
    tables must agree exactly, and the quantiles read off each must
    agree too (the monitor's full path: in-stream mergeable rollup,
    batch-side rank extraction)."""
    from bambooanalysis_spark.contract.extensions import _events
    from bambooanalysis_spark.operators.retrieval import hdr_quantiles
    from bambooanalysis_spark.streaming.windows import windowed_hdr_sketch

    events = (
        _events(spark, sf_oracle).limit(2000)
        .withColumn("vc", F.round(F.col("value") * 100).cast("long"))
    )
    src = str(tmp_path / "hdr_stream")
    events.write.parquet(src)
    events = spark.read.parquet(src)  # fix the row set for both paths

    batch_sk = windowed_hdr_sketch(events, "ts", "vc", "1 hour")
    batch = {(r["window_start"], r["bucket"]): r["cnt"]
             for r in batch_sk.collect()}

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = windowed_hdr_sketch(stream, "ts", "vc", "1 hour",
                              watermark="2 hours")
    q = (out.writeStream.format("memory").queryName("hdr_sk")
         .outputMode("complete").trigger(availableNow=True).start())
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    got_sk = spark.sql("SELECT * FROM hdr_sk")
    got = {(r["window_start"], r["bucket"]): r["cnt"]
           for r in got_sk.collect()}
    assert got == batch and len(got) > 0

    qa = {(r["window_start"], r["q_e6"]): (r["value_low"], r["n"])
          for r in hdr_quantiles(batch_sk, ["window_start"], [0.5, 0.99]).collect()}
    qb = {(r["window_start"], r["q_e6"]): (r["value_low"], r["n"])
          for r in hdr_quantiles(got_sk, ["window_start"], [0.5, 0.99]).collect()}
    assert qa == qb and len(qa) > 0


def test_corpus_snapshot_diff_planted(spark):
    """Planted two-snapshot fixture covering all four statuses, plus the
    canonicalization contract: a punctuation-only edit is 'unchanged'."""
    from bambooanalysis_spark.operators.corpus import (
        corpus_snapshot_diff, snapshot_diff_summary,
    )

    old = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "gamma text"),
         (4, "delta text")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "alpha text"),          # unchanged
         (2, "beta text!!!"),        # punctuation-only -> unchanged
         (3, "gamma text edited"),   # changed
         (5, "epsilon text")],       # added; 4 removed
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"]
           for r in corpus_snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "unchanged", 3: "changed",
                   4: "removed", 5: "added"}
    summary = {r["status"]: r["n_docs"]
               for r in snapshot_diff_summary(
                   corpus_snapshot_diff(old, new)).collect()}
    assert summary == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}
