"""Corpus-level token statistics: vocabulary building and TF-IDF.

The scale-critical shape: NEVER ``count(distinct doc_id)`` straight off an
exploded token stream (Spark plans an Expand that doubles the shuffle
volume). Aggregate per (doc, token) first — that layer combines map-side
and collapses each document's repeats — then the token-level layer counts
rows for document frequency and sums for term frequency. Two small shuffles
beat one huge one at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _maybe_broadcast
from .text import tokens


def doc_term_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc, token, tf) — per-document term frequencies. First aggregation
    level: map-side combine soaks up within-partition repeats of hot
    tokens before anything shuffles."""
    return (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
    )


def vocabulary(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """(token, tf, df) over the corpus: total term frequency and document
    frequency, built on doc_term_counts so df is a plain count, not a
    count-distinct (no Expand in the plan)."""
    per_doc = doc_term_counts(docs, id_col, text_col)
    out = per_doc.groupBy("token").agg(
        F.sum("tf").alias("tf"), F.count("*").alias("df")
    )
    return out.where(F.col("df") >= min_df) if min_df > 1 else out


def tfidf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """(doc, token, tf, df, tfidf) with the standard smoothed IDF
    ``ln((1+N)/(1+df)) + 1`` (scikit-learn's convention, public docs).

    Join shape: the vocabulary side is corpus-metadata-sized, so it
    broadcasts when small and falls back to a shuffled equi-join on token
    when not (_maybe_broadcast guard) — the same candidate-shrinking
    pattern as the ANN operators. Float output: transcendental results are
    engine-specific at the last ulp, so this op is unit-tested against
    numpy rather than oracle-hashed (see ADVICE round 1 on 1-ulp
    boundaries)."""
    per_doc = doc_term_counts(docs, id_col, text_col)
    n_docs = docs.select(F.countDistinct(id_col)).first()[0]
    vocab = vocabulary(docs, id_col, text_col, min_df=min_df).select(
        "token", F.col("df").alias("df")
    )
    joined = per_doc.join(_maybe_broadcast(vocab, 1_000_000), "token", "inner")
    idf = F.log((1.0 + float(n_docs)) / (1.0 + F.col("df"))) + F.lit(1.0)
    return joined.select(
        id_col, "token", "tf", "df", (F.col("tf") * idf).alias("tfidf")
    )
