"""Custom stateful streaming operator via applyInPandasWithState —
the 'custom stateful operators' extension path (Structured Streaming's
arbitrary-state API, Arrow-batched).

``running_user_totals`` keeps per-user running aggregates across
micro-batches: the canonical shape for streaming enrichment state
(feature counters, rate limits, dedup caches) that windowed aggregation
cannot express. State is per-key and partitioned by the shuffle on the
grouping key — horizontally scalable, checkpointable, and bounded by an
optional idle-timeout eviction.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, value_sum double"
STATE_SCHEMA = "n bigint, v double"


def _update(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, v))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "value_sum": [v]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) maintained in operator state.

    On a streaming DataFrame each micro-batch emits the updated totals for
    the users it touched (output mode 'update'); on repeated batches the
    state accumulates — which is the point, and what the test asserts by
    forcing one file per trigger.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEDUP_OUTPUT_SCHEMA = "doc_id bigint, fp string"
DEDUP_STATE_SCHEMA = "min_id bigint"


def _dedup_update(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    batch_min = None
    for pdf in pdf_iter:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            batch_min = m if batch_min is None else min(batch_min, m)
    if batch_min is None:
        return
    if state.exists:
        (cur,) = state.get
        if batch_min >= cur:
            return  # current representative already the smaller id
    state.update((batch_min,))
    yield pd.DataFrame({"doc_id": [batch_min], "fp": [key[0]]})


def streaming_exact_dedup(docs_with_fp: DataFrame) -> DataFrame:
    """Streaming exact dedup with BATCH-equivalent semantics: per-key state
    holds the minimum doc_id seen so far; a new emission happens only when
    a smaller id arrives (output mode 'update'). The LATEST emission per
    fingerprint therefore equals batch exact_dedup's representative (the
    global min doc_id) regardless of how the corpus is split into batches
    or replayed. State is sharded by the shuffle on fp — horizontally
    scalable, checkpointable; at 100 TB it is one tiny record per distinct
    doc, evictable via timeout if the dedup window is bounded.

    Input: streaming DataFrame with (doc_id, fp) — fp from
    operators.text.fingerprint.
    """
    return docs_with_fp.groupBy("fp").applyInPandasWithState(
        _dedup_update,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming near-dup dedup (MinHash-LSH, round 3) -------------------------

BAND_VOTE_SCHEMA = "doc_id bigint, band_key string, is_first int"
BAND_STATE_SCHEMA = "min_id bigint"


def _band_votes_update(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    ids: list[int] = []
    for pdf in pdf_iter:
        ids.extend(int(x) for x in pdf["doc_id"])
    if not ids:
        return
    cur = state.get[0] if state.exists else None
    gmin = min(ids) if cur is None else min(cur, min(ids))
    state.update((int(gmin),))
    yield pd.DataFrame(
        {
            "doc_id": ids,
            "band_key": [key[0]] * len(ids),
            "is_first": [1 if i == gmin else 0 for i in ids],
        }
    )


def streaming_lsh_band_votes(banded: DataFrame) -> DataFrame:
    """Streaming MinHash-LSH near-dup dedup, stage 1: per-bucket claim
    state. Input is the exploded (doc_id, band_key) stream
    (operators.dedup.banded_docs); per band bucket the state holds the
    minimum doc id seen so far, and each arriving doc gets a VOTE
    is_first = 1 iff it is that minimum. A document is a near-duplicate
    exactly when any of its buckets votes 0 — the assembly
    (groupBy(doc_id).min(is_first)) is stateless because all of a doc's
    votes are emitted in its own micro-batch, so it runs in foreachBatch
    or over the collected sink (tests do the latter).

    Semantics match batch `lsh_first_claim_keeps` whenever docs arrive in
    id order (the online reality: earlier item claims the bucket). State
    is one long per DISTINCT band bucket, sharded by the shuffle on
    band_key — the same key space as the batch LSH join, checkpointable,
    evictable by timeout when the dedup window is bounded."""
    return banded.groupBy("band_key").applyInPandasWithState(
        _band_votes_update,
        outputStructType=BAND_VOTE_SCHEMA,
        stateStructType=BAND_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_url_first_claim(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Streaming exact-URL dedup (round 9) — the online form of
    ``urlops.url_dedup``: canonicalize each URL with the SAME
    normalize_url Column algebra (pure map, stream-safe) and claim each
    canonical URL with the band-vote state machinery above, keyed by the
    canonical string instead of an LSH bucket. Output rows are
    (doc_id, band_key = canonical_url, is_first): is_first = 1 exactly
    for the claimer, so the keep-list needs no assembly step (one bucket
    per doc). Matches batch url_dedup's min-id keeper whenever ids
    arrive monotonically — the crawl-frontier reality. Malformed /
    hostless URLs (NULL canonical form) are excluded, the batch
    contract. State: one long per DISTINCT canonical URL; bound it with
    a dedup window + timeout in a production frontier."""
    from pyspark.sql import functions as F

    from ..operators.urlops import normalize_url

    keyed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        normalize_url(F.col(url_col)).alias("band_key"),
    ).where(F.col("band_key").isNotNull())
    return streaming_lsh_band_votes(keyed)
