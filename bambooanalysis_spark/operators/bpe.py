"""Byte-pair-encoding tokenizer: distributed-friendly train + apply.

The split of labor mirrors sentencepiece/GPT-2 practice and is exactly the
100 TB shape:

- ``bpe_train`` learns the merge table from the corpus WORD-FREQUENCY
  table, not the raw text: one distributed groupBy(token) collapses any
  corpus to a bounded vocabulary (map-side partials; cap with top-N by
  frequency), and the driver's classic greedy pair-merging loop runs over
  that small dict. Deterministic: ties break lexicographically, so the
  same corpus always yields the same merges.
- ``bpe_encode`` applies the merge table corpus-wide. Greedy ranked
  merging is genuinely not expressible with SQL/HOF primitives (each merge
  step depends on the previous one, unbounded iteration per word), so this
  is the sanctioned Arrow path: ``mapInPandas`` with the merge-rank dict
  in the task closure — batch-columnar transfer, no per-row Python UDF
  overhead, embarrassingly parallel, zero shuffle. A per-task LRU word
  cache exploits Zipf: the hot words encode once per batch, not once per
  occurrence.

Contract: deterministic but non-SQL-expressible -> registered as a
rows-only query (driver records rows+schema), with the algorithm pinned by
hand-computed examples and reconstruction/determinism properties in
tests/test_extensions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

# end-of-word marker, appended as a distinct final symbol (GPT-2 style
# would prepend space; the marker keeps word boundaries reconstructible)
EOW = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str = "text", max_vocab: int | None = None
) -> list[tuple[str, int]]:
    """Corpus word-frequency table, descending by (count, word) —
    the bounded input BPE training actually needs. One shuffle."""
    wf = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ordered = wf.orderBy(F.col("n").desc(), F.col("w"))
    if max_vocab is not None:
        ordered = ordered.limit(max_vocab)
    rows = ordered.collect()
    return [(r["w"], int(r["n"])) for r in rows]


def bpe_train(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    max_vocab: int | None = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus word-frequency table.
    Classic Sennrich et al. 2016 (public) greedy loop: repeatedly merge
    the most frequent adjacent symbol pair (ties -> lexicographically
    smallest pair) across the weighted vocabulary. Returns the ordered
    merge list; earlier = higher priority."""
    vocab = {
        tuple(list(w) + [EOW]): n for w, n in word_frequencies(df, text_col, max_vocab)
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        top = max(pair_counts.values())
        best_pair = min(p for p, c in pair_counts.items() if c == top)
        if top < 2:
            break
        merges.append(best_pair)
        merged = best_pair[0] + best_pair[1]
        out: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            res: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best_pair[0]
                    and syms[i + 1] == best_pair[1]
                ):
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            key = tuple(res)
            out[key] = out.get(key, 0) + n
        vocab = out
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_words, n_subwords, subwords_csv): greedy ranked BPE encode of
    every document — lowest-rank (earliest-learned) merge first, the
    standard GPT-2-style application order. Executed via mapInPandas
    (Arrow batches); the merge table rides the task closure (bounded
    driver metadata, like the ANN codebooks)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    # id column keeps ITS OWN type (string fingerprint ids are common in
    # the dedup family); hardcoding long crashed every non-integer id
    id_t = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_t}, n_words long, n_subwords long, subwords_csv string"
    )

    def run(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc(text: str) -> tuple[int, int, str]:
            words = [w for w in (text or "").split(" ") if w]
            subs: list[str] = []
            for w in words:
                got = cache.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    if len(cache) < 65536:
                        cache[w] = got
                subs.extend(got)
            return len(words), len(subs), ",".join(subs)

        for pdf in batches:
            res = [enc(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_words": [r[0] for r in res],
                    "n_subwords": [r[1] for r in res],
                    "subwords_csv": [r[2] for r in res],
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)
