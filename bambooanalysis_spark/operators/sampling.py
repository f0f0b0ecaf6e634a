"""Deterministic hash-based sampling and dataset splitting.

A 100 TB pipeline can't use ``df.sample`` for anything that must be
reproducible or re-derivable (resuming a failed run, joining a sample back
to its source, auditing what went into a training set): Spark's sampler is
seed-and-partitioning dependent. Everything here derives from an md5 bucket
of a stable key instead — per-row, shuffle-free, identical on any engine
(the DuckDB oracles replicate it bit-for-bit), and stable under
repartitioning, retries, and engine swaps.

Reference parity note: the reference has no sampling operators (its event
skims are physics cuts); this family is part of the training-data-pipeline
extension surface (SURVEY.md §2.9-2.10 scope).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import hash64

N_BUCKETS = 10_000  # 1e-4 sampling resolution


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Stable bucket in [0, N_BUCKETS): md5-derived 62-bit hash of the
    key (cast to string) plus an optional salt, mod N_BUCKETS. Different
    salts give independent bucketings — use one salt per decision so a
    row's sample membership and its split assignment don't correlate."""
    return hash64(F.concat(key.cast("string"), F.lit(salt))) % N_BUCKETS


def hash_sample(df: DataFrame, key: str, fraction: float, salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by stable hash bucket. Exact set
    membership is a pure function of (key, salt, fraction) — rerunning,
    repartitioning, or re-reading the data yields the SAME sample."""
    return df.where(hash_bucket(F.col(key), salt) < int(fraction * N_BUCKETS))


def split_column(
    key: Column, weights: dict[str, float], salt: str = "split"
) -> Column:
    """Assign each row a split label ('train'/'val'/'test'...) by hash
    bucket, proportional to ``weights`` (normalized; insertion order sets
    the bucket layout). Pure Column expression — usable inside any select."""
    total = sum(weights.values())
    bucket = hash_bucket(key, salt)
    expr: Column | None = None
    acc = 0.0
    labels = list(weights)
    for label in labels[:-1]:
        acc += weights[label] / total
        edge = int(acc * N_BUCKETS)
        expr = (
            F.when(bucket < edge, F.lit(label))
            if expr is None
            else expr.when(bucket < edge, F.lit(label))
        )
    # last label takes the remainder so the buckets always partition
    return F.lit(labels[-1]) if expr is None else expr.otherwise(F.lit(labels[-1]))


def train_val_test_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column partitioning rows into named datasets by
    stable hash — the reproducible replacement for randomSplit."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn("split", split_column(F.col(key), weights, salt))


def stratified_sample(
    df: DataFrame,
    key: str,
    strata: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum hash sampling: stratum s keeps ~fractions[s] of its rows
    (``default_fraction`` for unlisted strata). The per-stratum threshold is
    a small CASE expression, not a join — zero shuffle, skew-immune (a hot
    stratum costs nothing extra, unlike sampleBy's per-key maps at the
    partition level this is exactly equivalent in shape)."""
    bucket = hash_bucket(F.col(key), salt)
    thresh: Column = F.lit(int(default_fraction * N_BUCKETS))
    for s, frac in fractions.items():
        thresh = F.when(F.col(strata) == s, F.lit(int(frac * N_BUCKETS))).otherwise(
            thresh
        )
    return df.where(bucket < thresh)
