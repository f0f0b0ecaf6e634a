"""NB quality classifier (operators/classifier.py): planted-signal
recovery, determinism of the integer scoring, and plan shape."""

from pyspark.sql import functions as F

from bambooanalysis_spark.operators.classifier import (
    nb_predict,
    nb_scores,
    train_nb,
)


def _corpus(spark):
    # two classes with genuinely different token mixes plus shared noise
    rows = []
    for i in range(40):
        if i % 2 == 0:
            text = "good clean prose flows here " + ("verily " * (i % 3))
            label = "keep"
        else:
            text = "buy cheap pills now click spam " + ("now " * (i % 3))
            label = "drop"
        rows.append((i, text.strip(), label))
    return spark.createDataFrame(rows, "doc_id long, text string, label string")


def test_nb_recovers_planted_signal(spark):
    df = _corpus(spark)
    model = train_nb(df.where("doc_id < 30"))
    held = df.where("doc_id >= 30").select("doc_id", "text")
    pred = {r["doc_id"]: r["predicted"] for r in nb_predict(model, held).collect()}
    truth = {r["doc_id"]: r["label"] for r in df.where("doc_id >= 30").collect()}
    assert pred == truth  # fully separable vocabularies -> perfect recall


def test_nb_scores_are_deterministic_integers(spark):
    df = _corpus(spark)
    model = train_nb(df.where("doc_id < 30"))
    held = df.where("doc_id >= 30").select("doc_id", "text")
    a = sorted(map(tuple, nb_scores(model, held).collect()))
    b = sorted(map(tuple, nb_scores(model, held).collect()))
    assert a == b
    for row in a:
        # every published column is an exact integer (the oracle contract)
        assert all(isinstance(v, (int, str)) for v in row), row


def test_nb_margin_and_tie_break(spark):
    # a doc of only-unseen tokens scores identically under both classes
    # when priors and smoothing denominators match -> tie broken by label asc
    rows = [(1, "aa bb", "x"), (2, "aa bb", "y")]
    train = spark.createDataFrame(rows, "doc_id long, text string, label string")
    model = train_nb(train)
    held = spark.createDataFrame([(9, "zz qq")], "doc_id long, text string")
    out = nb_predict(model, held).collect()[0]
    assert out["predicted"] == "x" and out["margin_e6"] == 0


def test_nb_plan_no_python_udfs(spark):
    df = _corpus(spark)
    model = train_nb(df)
    plan = (
        nb_scores(model, df.select("doc_id", "text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- mode='log': true NB ranking in shared fixed-point (VERDICT r9 #5) --------


def test_ilog_fixed_point_accuracy():
    """ilog_e6 = LUT[m] + s*LN2_E6 must track 1e6*ln(x): exact (to the
    floor) below 1024, within the documented 10-bit-mantissa bound
    above — checked in pure Python against math.log, across magnitudes
    up to 2^55."""
    import math

    from bambooanalysis_spark.operators import classifier as C

    lut = dict(C.log_lut())

    def ilog(x):
        s = max(0, x.bit_length() - C.LOG_LUT_BITS)
        return lut[x >> s] + s * C.LN2_E6

    for x in range(1, 1024):
        assert ilog(x) == math.floor(1e6 * math.log(x))
    bound = math.log(1 + 2 ** -(C.LOG_LUT_BITS - 1)) * 1e6 + 60  # +floor slack
    for x in [1024, 1025, 4097, 65535, 10**6 + 7, 2**31 - 1, 2**55 + 11]:
        assert abs(ilog(x) - 1e6 * math.log(x)) < bound, x


def test_log_mode_matches_python_reference(spark):
    """score_log_e6 re-derived in plain Python from the same LUT but
    independent algebra (collections.Counter, no Spark) — pins the
    whole Spark plan (CASE chains, LUT joins, aggregation)."""
    from collections import Counter

    from bambooanalysis_spark.operators import classifier as C

    df = _corpus(spark)
    train = df.where("doc_id < 30")
    held = df.where("doc_id >= 30").select("doc_id", "text")
    model = train_nb(train)
    got = {
        (r["doc_id"], r["label"]): (r["loglik_e6"], r["prior_log_e6"],
                                    r["score_log_e6"])
        for r in nb_scores(model, held, mode="log").collect()
    }

    lut = dict(C.log_lut())

    def ilog(x):
        s = max(0, x.bit_length() - C.LOG_LUT_BITS)
        return lut[x >> s] + s * C.LN2_E6

    def toks(text):
        import re
        return re.findall(r"[a-z0-9]+", text.lower())

    rows = train.collect()
    counts = Counter()
    label_toks = Counter()
    label_docs = Counter()
    vocab = set()
    for r in rows:
        for t in toks(r["text"]):
            counts[(r["label"], t)] += 1
            label_toks[r["label"]] += 1
            vocab.add(t)
        label_docs[r["label"]] += 1
    v, n_total = len(vocab), len(rows)
    expect = {}
    for h in held.collect():
        ts = toks(h["text"])
        for lab in label_docs:
            s = sum(ilog(counts.get((lab, t), 0) + 1) for t in ts)
            loglik = s - len(ts) * ilog(label_toks[lab] + v)
            prior = ilog(label_docs[lab]) - ilog(n_total)
            expect[(h["doc_id"], lab)] = (loglik, prior, loglik + prior)
    assert got == expect


def test_log_mode_rank_divergence(spark):
    """The documented mean-vs-NB divergence, demonstrated: a held doc
    whose tokens are common in class A but contain ONE token that class
    A has never seen (and class B has) — the near-zero factor collapses
    the NB product (log mode flips to B) while the arithmetic mean
    barely moves (mean mode stays A)."""
    rows = []
    # class A: 30 docs of common tokens, has NEVER seen 'rare'
    # (p(rare|A) = 1/125 smoothed -> ln ~ -4.8 per occurrence)
    for i in range(30):
        rows.append((i, "alpha beta gamma delta", "A"))
    # class B: tiny corpus (prior 10x smaller) sharing the common
    # tokens, where 'rare' is frequent (p = 7/23 -> ln ~ -1.2)
    for i in range(3):
        rows.append((100 + i, "alpha beta gamma delta rare rare", "B"))
    train = spark.createDataFrame(
        rows, "doc_id long, text string, label string"
    )
    model = train_nb(train)
    # two 'rare' occurrences: ~7.3 nats against A in log space, while
    # the e6-scale mean moves by a few 1e4 against A's ~8.2e5 prior edge
    held = spark.createDataFrame(
        [(500, "alpha beta gamma delta rare rare")],
        "doc_id long, text string",
    )
    mean_pred = nb_predict(model, held).collect()[0]["predicted"]
    log_pred = nb_predict(model, held, mode="log").collect()[0]["predicted"]
    assert mean_pred != log_pred, (mean_pred, log_pred)
    assert mean_pred == "A"   # mean barely moves on one rare token
    assert log_pred == "B"    # the unseen-token factor collapses A


def test_log_mode_plan_no_python_udfs(spark):
    df = _corpus(spark)
    model = train_nb(df)
    plan = (
        nb_scores(model, df.select("doc_id", "text"), mode="log")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan


def test_ilog_sql_matches_python_at_extreme_magnitudes(spark):
    """Self-review r10: the CASE chain's ELSE branch must keep the
    mantissa INSIDE the LUT for x in [2^62, 2^63) — an off-by-one shift
    put it at [1024, 2047], where the LUT left-join went NULL and the
    term silently vanished from the score. Pin SQL == Python across the
    branch boundaries including the ELSE range."""
    from bambooanalysis_spark.operators import classifier as C

    lut = dict(C.log_lut())

    def pyilog(x):
        s = max(0, x.bit_length() - C.LOG_LUT_BITS)
        return lut[x >> s] + s * C.LN2_E6

    xs = [1, 2, 1023, 1024, 2047, 2048, (1 << 61) - 1, 1 << 61,
          (1 << 62) - 1, 1 << 62, (1 << 62) + 99, (1 << 63) - 1]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    lut_df = spark.createDataFrame(C.log_lut(), "m int, ln_e6 long")
    out = C._attach_ilog(df, "x", "ilog", lut_df, "t")
    got = {r["x"]: r["ilog"] for r in out.collect()}
    for x in xs:
        assert got[x] == pyilog(x), x


def test_threshold_sweep_hand_computed(spark):
    """4 scored docs, every (tp, fp) transition hand-checked."""
    from bambooanalysis_spark.operators.classifier import threshold_sweep

    df = spark.createDataFrame(
        [(1, 90, 1), (2, 80, 0), (3, 80, 1), (4, 10, 0)],
        "doc_id long, score long, label long",
    )
    rows = {r["threshold"]: r for r in
            threshold_sweep(df, "score", "label").collect()}
    assert set(rows) == {90, 80, 10}
    r = rows[90]   # predict >= 90: doc 1 only
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 0, 1, 2)
    assert r["precision_e6"] == 1_000_000 and r["recall_e6"] == 500_000
    r = rows[80]   # docs 1,2,3
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 1, 0, 1)
    assert r["precision_e6"] == 666_666  # floor(2e6/3)
    assert r["f1_e6"] == 800_000
    r = rows[10]   # everything predicted positive
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 2, 0, 0)
    assert r["recall_e6"] == 1_000_000


def test_threshold_sweep_no_positives_recall_zero(spark):
    from bambooanalysis_spark.operators.classifier import threshold_sweep

    df = spark.createDataFrame(
        [(1, 5, 0), (2, 7, 0)], "doc_id long, score long, label long"
    )
    for r in threshold_sweep(df, "score", "label").collect():
        assert r["tp"] == 0 and r["recall_e6"] == 0 and r["f1_e6"] == 0


def test_threshold_sweep_rejects_non_binary_labels(spark):
    import pytest

    from bambooanalysis_spark.operators.classifier import threshold_sweep

    df = spark.createDataFrame(
        [(1, 5, 2)], "doc_id long, score long, label long"
    )
    with pytest.raises(Exception, match="must be 0/1"):
        threshold_sweep(df, "score", "label").collect()


def test_threshold_sweep_plan_shape(spark):
    from bambooanalysis_spark.operators.classifier import threshold_sweep

    df = spark.createDataFrame(
        [(i, i % 17, i % 2) for i in range(100)],
        "doc_id long, score long, label long",
    )
    out = threshold_sweep(df, "score", "label")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEval" not in plan and "BatchEval" not in plan
    # exactly one aggregation pass over the input rows (partial+final)
    assert plan.count("HashAggregate") <= 2


def test_threshold_sweep_rejects_string_labels(spark):
    """Review r10: non-numeric labels must hit the loud guard, not vanish
    through a silent cast-to-NULL filter."""
    import pytest

    from bambooanalysis_spark.operators.classifier import threshold_sweep

    df = spark.createDataFrame(
        [(1, 5, "yes"), (2, 7, "no")], "doc_id long, score long, label string"
    )
    with pytest.raises(Exception, match="must be 0/1"):
        threshold_sweep(df, "score", "label").collect()


def test_threshold_sweep_rejects_fractional_labels(spark):
    """Review r10 pass 2 repro: a probability column (0.7) long-truncates
    to 0 and must trip the guard, not silently count as a negative."""
    import pytest

    from bambooanalysis_spark.operators.classifier import threshold_sweep

    df = spark.createDataFrame(
        [(1, 5, 0.7), (2, 7, 1.0)], "doc_id long, score long, label double"
    )
    with pytest.raises(Exception, match="must be 0/1"):
        threshold_sweep(df, "score", "label").collect()
    # exact 0.0/1.0 doubles round-trip cleanly and stay accepted
    ok = spark.createDataFrame(
        [(1, 5, 0.0), (2, 7, 1.0)], "doc_id long, score long, label double"
    )
    rows = threshold_sweep(ok, "score", "label").collect()
    assert sum(r["tp"] for r in rows) > 0
