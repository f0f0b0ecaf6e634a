"""Bigram language-model training + perplexity scoring — the CCNet-style
quality filter (Wenzek et al. 2019: score web text against an LM trained
on a reference corpus; low perplexity ~ fluent, in-domain text). The
reference engine has no LM surface; this belongs to the large-scale
training-data extension family (SURVEY.md north-star extensions), next to
`corpus.bigram_coherence` (the self-corpus, smoothing-free proxy). What
this adds over coherence: a TRAIN/APPLY split (the scored docs need not —
and at 100 TB must not — be the training slice), Laplace smoothing with a
real vocabulary size (so unseen bigrams and unseen prefixes score sanely
instead of dropping out), an OOV count, and a true perplexity.

Exactness contract: the e6 fixed-point smoothed-probability score uses
ONLY integer arithmetic (`(c12+1)*1e6 div (c1+V)`, floor-mean per doc) so
the driver oracle hash-matches bit-for-bit; the float log-prob/perplexity
columns are transcendental (ln/exp differ engine-to-engine at the last
ulp) and are unit-tested against plain Python instead — the same split as
BM25 (`operators/retrieval.py`).

Scale shape: the model is two count aggregations over the train slice
whose key spaces are the bigram/prefix vocabularies (map-side combine
collapses hot keys) plus a 1-row vocab-size aggregate; scoring is two
equi-joins of the scored docs' bigrams against those tables — broadcast
when the vocabulary fits (`_maybe_broadcast`), shuffled hash otherwise —
and one final per-doc aggregation. Nothing is ever collected to the
driver; the model stays distributed (persist it when scoring many
batches, or write it as parquet — it IS the serialized model).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .corpus import doc_bigrams
from .similarity import _maybe_broadcast


class BigramLM(NamedTuple):
    """A trained bigram LM as three lazy DataFrames (all vocab-sized):
    ``bigrams`` (w1, w2, c12), ``prefixes`` (w1, c1 — bigram occurrences
    starting with w1), ``vocab`` (1 row: v = distinct training tokens)."""

    bigrams: DataFrame
    prefixes: DataFrame
    vocab: DataFrame


def train_bigram_lm(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> BigramLM:
    """Count bigrams/prefixes over the training corpus. ``min_count``
    prunes rare bigrams from the MODEL (standard at scale — the count
    table must stay vocab-sized, not corpus-sized); pruned bigrams score
    as unseen at apply time, which only lowers their smoothed probability.
    Prefix counts and V are computed BEFORE pruning so the probability
    denominator stays the true MLE denominator."""
    from .dedup import _fan_out
    from .text import tokens

    bg = doc_bigrams(docs, id_col, text_col).select(
        F.split("bg", "\t").getItem(0).alias("w1"),
        F.split("bg", "\t").getItem(1).alias("w2"),
    )
    cbg = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    if min_count > 1:
        cbg = cbg.where(F.col("c12") >= min_count)
    cpre = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        # fan out on narrow local scans (r11, guide §2.5): the explode +
        # distinct-count map side otherwise run on the scan's 1-2 splits
        _fan_out(docs.select(F.col(id_col), F.col(text_col)), id_col)
        .select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    return BigramLM(cbg, cpre, vocab)


def save_bigram_lm(model: BigramLM, path: str) -> None:
    """Persist the model as three parquet tables under ``path`` — the
    serialized form for scoring later batches/streams without retraining
    (the persisted-index lifecycle, same as the IVF-PQ ANN index:
    build once on the training slice, serve many times). Overwrites."""
    model.bigrams.write.mode("overwrite").parquet(f"{path}/bigrams")
    model.prefixes.write.mode("overwrite").parquet(f"{path}/prefixes")
    model.vocab.write.mode("overwrite").parquet(f"{path}/vocab")


def load_bigram_lm(spark, path: str) -> BigramLM:
    """Load a model written by save_bigram_lm. The tables come back as
    plain parquet scans — static snapshots, directly usable as the static
    side of a streaming quality gate."""
    return BigramLM(
        spark.read.parquet(f"{path}/bigrams"),
        spark.read.parquet(f"{path}/prefixes"),
        spark.read.parquet(f"{path}/vocab"),
    )


def score_bigram_lm(
    docs: DataFrame,
    model: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_limit: int = 1_000_000,
) -> DataFrame:
    """Per-document LM quality: (id, n_bigrams, n_oov_bigrams,
    lm_score_e6, avg_logprob, perplexity) over every doc with >= 2
    tokens. Laplace-smoothed p(w2|w1) = (c12 + 1) / (c1 + V); unseen
    bigram -> c12 = 0, unseen prefix -> c1 = 0 (never a dropped row: both
    joins are LEFT). ``lm_score_e6`` is the integer floor-mean of
    floor(1e6 * p) — engine-exact, oracle-checkable; ``avg_logprob`` /
    ``perplexity`` are the conventional float forms (exp of mean negative
    ln p), unit-tested against plain Python."""
    bg = doc_bigrams(docs, id_col, text_col).select(
        id_col,
        F.split("bg", "\t").getItem(0).alias("w1"),
        F.split("bg", "\t").getItem(1).alias("w2"),
    )
    joined = (
        bg.join(_maybe_broadcast(model.bigrams, broadcast_limit), ["w1", "w2"], "left")
        .join(_maybe_broadcast(model.prefixes, broadcast_limit), "w1", "left")
        .crossJoin(F.broadcast(model.vocab))
    )
    num = F.coalesce(F.col("c12"), F.lit(0)) + 1
    den = F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")
    p_e6 = F.expr(
        "(coalesce(c12, 0) + 1) * 1000000 div (coalesce(c1, 0) + v)"
    )
    nll = -F.log(num.cast("double") / den.cast("double"))
    per_bg = joined.select(
        id_col,
        F.col("c12").isNull().cast("long").alias("__oov"),
        p_e6.alias("__p_e6"),
        nll.alias("__nll"),
    )
    return per_bg.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("__oov").alias("n_oov_bigrams"),
        F.expr("sum(__p_e6) div count(1)").alias("lm_score_e6"),
        (-F.avg("__nll")).alias("avg_logprob"),
        F.exp(F.avg("__nll")).alias("perplexity"),
    )
