"""Entity resolution (record linkage): blocking → pairwise scoring →
greedy resolution, the standard dirty-data dedup/match workload.

Spark-first shape: candidate generation is an equi-join on BLOCKING KEYS
(never an n² cross join — the same principle as the LSH/deletion-variant
candidate joins elsewhere in the engine); scoring is per-pair Column
expressions (levenshtein + exact-field comparisons, all integer, so
results are engine-exact and oracle-checkable); resolution is a per-left-
record window argmin. At 100 TB the block key is the shuffle key — pick
keys that bound block size (the classic blocking-key design problem), and
compose several passes with different keys to recover recall lost to a
dirty blocking field.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def blocked_candidates(
    left: DataFrame,
    right: DataFrame,
    block_cols: Sequence[str],
    left_id: str = "id_l",
    right_id: str = "id_r",
) -> DataFrame:
    """Candidate pairs sharing every blocking column (equi-join on the
    block key). Returns left.* + right.* for the scoring stage; rows with
    NULL in any block column never match (standard blocking semantics)."""
    lb = left.select(
        F.col(left_id), *[F.col(c).alias(f"{c}_l") for c in left.columns if c != left_id]
    )
    rb = right.select(
        F.col(right_id),
        *[F.col(c).alias(f"{c}_r") for c in right.columns if c != right_id],
    )
    if not block_cols:
        raise ValueError(
            "blocked_candidates: block_cols is empty — a blocking-free "
            "join is the unbounded cross product this module exists to "
            "avoid; pass at least one blocking column"
        )
    cond = None
    for c in block_cols:
        eq = F.col(f"{c}_l") == F.col(f"{c}_r")
        cond = eq if cond is None else (cond & eq)
    return lb.join(rb, cond)


def score_pairs(
    pairs: DataFrame,
    fuzzy_fields: dict[str, int],
    exact_fields: dict[str, int] | None = None,
) -> DataFrame:
    """Integer match score per candidate pair: for each fuzzy field,
    penalty = levenshtein(l, r) * weight; each exact field adds its weight
    when equal. score = Σ exact bonuses − Σ fuzzy penalties — all integer,
    deterministic, engine-portable."""
    exact_fields = exact_fields or {}
    score: Column = F.lit(0)
    for c, w in exact_fields.items():
        score = score + F.when(F.col(f"{c}_l") == F.col(f"{c}_r"), w).otherwise(0)
    for c, w in fuzzy_fields.items():
        score = score - F.levenshtein(F.col(f"{c}_l"), F.col(f"{c}_r")) * w
    return pairs.withColumn("score", score.cast("long"))


def resolve_best_match(
    scored: DataFrame,
    left_id: str = "id_l",
    right_id: str = "id_r",
    min_score: int | None = None,
) -> DataFrame:
    """Greedy per-left-record resolution: keep the highest-scoring match
    (ties break to the smallest right id — deterministic), optionally
    thresholded. One window over the candidate set keyed by the left id."""
    w = Window.partitionBy(left_id).orderBy(F.col("score").desc(), F.col(right_id))
    out = scored.withColumn("__rk", F.row_number().over(w)).where(F.col("__rk") == 1)
    if min_score is not None:
        out = out.where(F.col("score") >= min_score)
    return out.drop("__rk")
