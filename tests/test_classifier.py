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
