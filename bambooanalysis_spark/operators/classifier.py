"""Multinomial Naive-Bayes text classifier — train/apply, the
fastText-style quality-classifier shape used to curate pretraining
corpora (label a reference slice, score the crawl, keep what classifies
as reference; GPT-3/LLaMA-style data curation). The reference engine has
no classifier surface; this extends the training-data family next to the
bigram LM (operators/lm.py) and DSIR importance weights.

Exactness contract (the lm.py pattern): every published column is
integer fixed-point — per-token Laplace-smoothed class probabilities as
``(c(tok,label)+1) * 1e6 div (T_label + V)``, per-doc mean via integer
division, class prior as ``n_docs_label * 1e6 div n_docs`` — so the
DuckDB oracle hash-matches bit-for-bit. (A true NB log-likelihood needs
ln; transcendental columns would be engine-divergent in the last ulp, so
the decision rule is defined ON the fixed-point scores. NOTE — VERDICT
r8 #2: the arithmetic mean of per-token probabilities is a CORRELATED
BUT DIFFERENT decision rule from the NB log-likelihood (a geometric
mean): a document with one very-rare token can rank differently under
the two rules, because one near-zero factor collapses a product but
barely moves a mean. The mean mode is exact, deterministic, and
planted-signal-tested as a curation score; for the TRUE NB-posterior
ranking pass ``mode='log'`` — it scores by the log-likelihood using a
shared integer log-LUT (see the fixed-point log block below), staying
bit-exact across engines, and the rank divergence between the two
modes on a rare-token document is pinned by
tests/test_classifier.py::test_log_mode_rank_divergence.)

Scale shape: the model is one (label, token) count aggregation plus a
label-sized stats table and a 1-row meta aggregate — vocabulary-sized,
never corpus-sized; map-side combine collapses hot tokens. Scoring
explodes the scored docs' tokens ONCE, crossJoins the label list (a
bounded handful of rows — broadcast), LEFT-joins the count table
(broadcast when the vocab fits, shuffled hash otherwise), and reduces
per (doc, label). The model is three lazy DataFrames — persist or write
as parquet to amortize across scoring batches; nothing collects to the
driver.
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _fan_out
from .similarity import _maybe_broadcast
from .text import tokens

# --- shared fixed-point logarithm (mode='log', VERDICT r9 #5) -----------------
# True NB ranking needs ln, but transcendental COLUMNS would be
# engine-divergent in the last ulp. Every ln argument in the NB score is
# an INTEGER (c+1, tok_total+v, n_docs, n_docs_total), so ln becomes
# exact integer algebra over a shared table: write x = m * 2^s with
# s = max(0, bitlen(x) - LOG_LUT_BITS) via plain integer comparisons
# (no log2 doubles), look floor(1e6*ln m) up in a 1023-row LUT generated
# ONCE in Python, and add s * floor(1e6*ln 2). Exact for x < 1024; above
# that it quantizes the mantissa to 10 bits (error < ln(1+2^-9) ~ 1953
# e6-units per factor — invisible next to inter-class ln gaps, and
# IDENTICAL in both engines because the LUT rows and CASE algebra are
# generated from the same Python source).

LOG_LUT_BITS = 10
LOG_LUT_SIZE = 1 << LOG_LUT_BITS  # mantissa domain 1..1023
LN2_E6 = 693147                   # floor(1e6 * ln 2)
# CASE branches cover s = 0..52 (largest bound literal 1024 << 52 =
# 2^62, still a valid BIGINT); the ELSE catches x in [2^62, 2^63) with
# s = 53, whose mantissa x DIV 2^53 lands in [512, 1024) — INSIDE the
# LUT (self-review r10: an ELSE of s=52 put the mantissa at
# [1024, 2047], off the LUT, and the left join would have silently
# dropped the term from the score instead of raising)
_MAX_SHIFT = 52
_ELSE_SHIFT = 53


def log_lut() -> list[tuple[int, int]]:
    """(m, floor(1e6 * ln m)) for m in 1..1023 — one Python source of
    truth consumed as DATA by both Spark and the DuckDB oracle, so libm
    ulp differences cannot diverge the engines."""
    return [
        (m, math.floor(1e6 * math.log(m))) for m in range(1, LOG_LUT_SIZE)
    ]


def mantissa_shift_sql(x: str, div: str = "DIV") -> tuple[str, str]:
    """Integer CASE chains computing (m, s) of ``x``: constant bounds
    and constant power-of-two divisors only, so Spark SQL (div='DIV')
    and DuckDB (div='//') produce identical integers."""
    m_b, s_b = [], []
    for s in range(_MAX_SHIFT + 1):
        bound = LOG_LUT_SIZE << s
        m_b.append(f"WHEN ({x}) < {bound} THEN ({x}) {div} {1 << s}")
        s_b.append(f"WHEN ({x}) < {bound} THEN {s}")
    m_sql = (
        "CASE " + " ".join(m_b)
        + f" ELSE ({x}) {div} {1 << _ELSE_SHIFT} END"
    )
    s_sql = "CASE " + " ".join(s_b) + f" ELSE {_ELSE_SHIFT} END"
    return m_sql, s_sql


def ilog_e6_oracle_sql(x: str, lut: str = "lut") -> str:
    """DuckDB fragment: the fixed-point ilog of integer expression ``x``
    via a scalar lookup in the ``lut(m, ln_e6)`` CTE."""
    m_sql, s_sql = mantissa_shift_sql(x, div="//")
    return (
        f"((SELECT ln_e6 FROM {lut} WHERE m = ({m_sql}))"
        f" + ({s_sql}) * {LN2_E6})"
    )


def log_lut_values_sql() -> str:
    """The LUT as a DuckDB VALUES list for the oracle CTE."""
    return ", ".join(f"({m}, {v})" for m, v in log_lut())


def _attach_ilog(
    df: DataFrame, x_sql: str, out_col: str, lut_df: DataFrame, tag: str
) -> DataFrame:
    """ilog_e6(x) as a column: compute (m, s) JVM-side, broadcast-join
    the 1023-row LUT on m, add s * LN2_E6."""
    m_sql, s_sql = mantissa_shift_sql(x_sql, div="DIV")
    lut = lut_df.select(
        F.col("m").alias(f"__m{tag}"), F.col("ln_e6").alias(f"__l{tag}")
    )
    return (
        df.withColumn(f"__m{tag}", F.expr(m_sql).cast("int"))
        .join(F.broadcast(lut), f"__m{tag}", "left")
        .withColumn(
            out_col, F.expr(f"__l{tag} + ({s_sql}) * {LN2_E6}L")
        )
        .drop(f"__m{tag}", f"__l{tag}")
    )


class NBModel(NamedTuple):
    """(label, tok, c) counts; (label, tok_total, n_docs) per-class
    stats; 1-row meta (v = distinct training tokens, n_docs)."""

    token_counts: DataFrame
    label_stats: DataFrame
    meta: DataFrame


def train_nb(
    docs: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> NBModel:
    # fan out on narrow local scans: the explode + both aggregates' map
    # sides otherwise run on the scan's 1-2 splits (r11, guide §2.5;
    # no-op on many-split inputs at scale)
    toks = _fan_out(
        docs.select(F.col(id_col), F.col(label_col), F.col(text_col)), id_col
    ).select(
        F.col(id_col).alias("__id"),
        F.col(label_col).alias("label"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    token_counts = toks.groupBy("label", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    label_stats = toks.groupBy("label").agg(
        F.count(F.lit(1)).alias("tok_total"),
        F.count_distinct("__id").alias("n_docs"),
    )
    meta = toks.agg(
        F.count_distinct("tok").alias("v"),
        F.count_distinct("__id").alias("n_docs_total"),
    )
    return NBModel(token_counts, label_stats, meta)


def nb_scores(
    model: NBModel,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_limit: int = 2_000_000,
    mode: str = "mean",
) -> DataFrame:
    """Per (doc, label): token count, OOV-for-this-class count, and the
    class score. ``mode='mean'`` (default): the fixed-point mean smoothed
    token probability ``tok_mean_e6``, the class prior ``prior_e6``, and
    their sum ``score_e6`` — exact, but a CORRELATED-NOT-IDENTICAL
    decision rule vs NB (see module docstring). ``mode='log'`` (VERDICT
    r9 #5): the TRUE multinomial-NB log-likelihood ranking in shared
    fixed-point — ``loglik_e6 = sum ilog(c+1) - n_toks*ilog(tok_total+v)``
    (= sum of smoothed log token probabilities), ``prior_log_e6 =
    ilog(n_docs) - ilog(n_docs_total)``, ``score_log_e6`` their sum —
    still bit-exact across engines because ilog is LUT data + integer
    CASE algebra, not libm."""
    if mode not in ("mean", "log"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "log":
        return _nb_scores_log(model, docs, id_col, text_col,
                              broadcast_limit)
    toks = _fan_out(docs.select(F.col(id_col), F.col(text_col)), id_col).select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    labels = model.label_stats.select("label", "tok_total", "n_docs")
    pairs = toks.crossJoin(F.broadcast(labels)).join(
        _maybe_broadcast(model.token_counts, broadcast_limit),
        ["label", "tok"],
        "left",
    ).crossJoin(F.broadcast(model.meta))
    # integer `div` throughout (NOT `/`, which is double division and can
    # floor differently than integer division in the last ulp — the
    # lm.py/BM25 exactness convention)
    tok_e6 = F.expr(
        "(coalesce(c, 0L) + 1L) * 1000000L div (tok_total + v)"
    )
    return (
        pairs.groupBy("doc_id", "label")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum((F.col("c").isNull()).cast("long")).alias("n_oov"),
            F.sum(tok_e6).alias("__sum_e6"),
            # group-invariant; carried through the agg as firsts
            F.first(
                F.expr("n_docs * 1000000L div n_docs_total")
            ).alias("prior_e6"),
        )
        .select(
            "doc_id",
            "label",
            "n_toks",
            "n_oov",
            F.expr("__sum_e6 div n_toks").alias("tok_mean_e6"),
            "prior_e6",
            F.expr("__sum_e6 div n_toks + prior_e6").alias("score_e6"),
        )
    )


def _nb_scores_log(
    model: NBModel,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    broadcast_limit: int,
) -> DataFrame:
    """mode='log' body: every ln argument is an integer, so the score is
    pure LUT + integer algebra (see the fixed-point log block above).
    Plan shape mirrors mode='mean' — the only additions are 1023-row
    broadcast LUT joins (one on the exploded pairs, three on the
    label-count-sized stats table)."""
    lut_df = docs.sparkSession.createDataFrame(
        log_lut(), "m int, ln_e6 long"
    )
    labels = model.label_stats.crossJoin(F.broadcast(model.meta))
    labels = _attach_ilog(labels, "tok_total + v", "__ln_tv", lut_df, "tv")
    labels = _attach_ilog(labels, "n_docs", "__ln_nd", lut_df, "nd")
    labels = _attach_ilog(
        labels, "n_docs_total", "__ln_ndt", lut_df, "ndt"
    )
    labels = labels.select(
        "label",
        "__ln_tv",
        F.expr("__ln_nd - __ln_ndt").alias("prior_log_e6"),
    )
    toks = _fan_out(docs.select(F.col(id_col), F.col(text_col)), id_col).select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    pairs = toks.crossJoin(F.broadcast(labels)).join(
        _maybe_broadcast(model.token_counts, broadcast_limit),
        ["label", "tok"],
        "left",
    )
    pairs = _attach_ilog(
        pairs, "coalesce(c, 0L) + 1L", "__ln_c1", lut_df, "c1"
    )
    return (
        pairs.groupBy("doc_id", "label")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum((F.col("c").isNull()).cast("long")).alias("n_oov"),
            F.sum("__ln_c1").alias("__sum_ln"),
            F.first("__ln_tv").alias("__ln_tv"),
            F.first("prior_log_e6").alias("prior_log_e6"),
        )
        .select(
            "doc_id",
            "label",
            "n_toks",
            "n_oov",
            F.expr("__sum_ln - n_toks * __ln_tv").alias("loglik_e6"),
            "prior_log_e6",
            F.expr(
                "__sum_ln - n_toks * __ln_tv + prior_log_e6"
            ).alias("score_log_e6"),
        )
    )


def nb_predict(
    model: NBModel,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_limit: int = 2_000_000,
    mode: str = "mean",
) -> DataFrame:
    """argmax label per doc (ties broken by label ascending — exact,
    deterministic) plus the winning and runner-up scores. ``mode='log'``
    ranks by the true NB log-likelihood (score_log_e6) instead of the
    mean-probability score; output schema is identical, with best/margin
    on the chosen score."""
    scored = nb_scores(model, docs, id_col, text_col, broadcast_limit,
                       mode=mode)
    score_col = "score_log_e6" if mode == "log" else "score_e6"
    w = Window.partitionBy("doc_id").orderBy(
        F.col(score_col).desc(), F.col("label").asc()
    )
    # r11 (guide §1.2 "don't compute things you throw away"): the
    # runner-up is lead() over the SAME window at rank 1 — the old
    # rk==1 / rk==2 split + left join executed the whole nb_scores
    # subtree (tokenize -> model joins -> aggregate -> window) TWICE and
    # re-sorted both halves for a SortMergeJoin (105-operator plan,
    # plans/r11/nb_predict_before.txt). lead() on the identical
    # (partition, order) spec shares one window pass; values unchanged:
    # the row after rank 1 in this ordering IS the old __rk == 2 row,
    # and a single-label doc gets NULL -> COALESCE 0 exactly as the
    # left join produced.
    ranked = scored.select(
        "doc_id",
        "label",
        F.col(score_col),
        F.row_number().over(w).alias("__rk"),
        F.lead(score_col).over(w).alias("__second"),
    )
    return ranked.where(F.col("__rk") == 1).select(
        "doc_id",
        F.col("label").alias("predicted"),
        F.col(score_col).alias("best_e6"),
        (F.col(score_col) - F.coalesce(F.col("__second"), F.lit(0)))
        .cast("long")
        .alias("margin_e6"),
    )


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Classifier-cutoff selection: for EVERY distinct score value t,
    the confusion matrix and fixed-point precision/recall/F1 of the rule
    "predict positive iff score >= t" — the table a curation pipeline
    reads to pick its quality-filter threshold (the fastText/CCNet "keep
    documents the classifier scores above X" step needs an X, and this
    is how X is chosen).

    ``label_col`` must be 0/1 integers; ``score_col`` an integer score
    (the fixed-point *_e6 scores of nb_scores / quality_score_e4 are the
    intended inputs — float scores would make the cumulative sums
    engine-ordering-dependent). All outputs are BIGINT: precision_e6 =
    tp*1e6 DIV (tp+fp) (the predicted-positive set is non-empty at every
    listed threshold, since the threshold itself is an occurring score),
    recall_e6 guards the no-positives corpus to 0, f1_e6 = 2*tp*1e6 DIV
    (2*tp + fp + fn).

    Scale shape: ONE map-side-combined hash aggregate over the corpus
    (per-score positive/negative counts), then windows over the distinct-
    score table. That table is bounded by the score RESOLUTION, not the
    corpus — a *_e6 score has at most ~2M distinct values no matter how
    many documents — so the single-partition cumulative window is
    bounded metadata, the same class as temperature_mix's totals.
    """
    raw = F.col(label_col).try_cast("long")
    # in-plan contract guard: anything outside {0,1} would silently skew
    # every cumulative count, so it fails the job loudly instead. The
    # when-branch is isin(0,1) (NOT a negated test): a non-numeric label
    # try_casts to NULL, falls through to the otherwise, and raises with
    # the ORIGINAL value — review r10 caught the cast-then-filter version
    # silently dropping string labels before the guard could fire. The
    # round-trip equality catches fractional numerics too: a probability
    # column (0.7) long-truncates to 0 and would pass isin, but
    # 0.7 <> 0.0 trips the guard (review r10 pass 2, confirmed repro).
    roundtrip_ok = (
        F.col(label_col).try_cast("double").eqNullSafe(raw.cast("double"))
    )
    lbl = F.when(
        raw.isin(0, 1) & roundtrip_ok,
        raw,
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("threshold_sweep: label_col must be 0/1, got "),
                F.coalesce(F.col(label_col).cast("string"), F.lit("NULL")),
            )
        ).cast("long")
    )
    agg = (
        df.where(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .groupBy(F.col(score_col).cast("long").alias("threshold"))
        .agg(
            F.sum(lbl).alias("__n_pos"),
            F.sum(F.lit(1) - lbl).alias("__n_neg"),
        )
    )
    desc = Window.orderBy(F.col("threshold").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    everything = Window.partitionBy()
    out = (
        agg.withColumn("tp", F.sum("__n_pos").over(desc))
        .withColumn("fp", F.sum("__n_neg").over(desc))
        .withColumn("__tot_pos", F.sum("__n_pos").over(everything))
        .withColumn("__tot_neg", F.sum("__n_neg").over(everything))
        .withColumn("fn", F.col("__tot_pos") - F.col("tp"))
        .withColumn("tn", F.col("__tot_neg") - F.col("fp"))
        .withColumn(
            "precision_e6", F.expr("(tp * 1000000) DIV (tp + fp)")
        )
        .withColumn(
            "recall_e6",
            F.when(
                F.col("__tot_pos") > 0,
                F.expr("(tp * 1000000) DIV __tot_pos"),
            ).otherwise(F.lit(0).cast("long")),
        )
        .withColumn(
            "f1_e6", F.expr("(2 * tp * 1000000) DIV (2 * tp + fp + fn)")
        )
    )
    return out.select(
        "threshold", "tp", "fp", "fn", "tn",
        "precision_e6", "recall_e6", "f1_e6",
    )
