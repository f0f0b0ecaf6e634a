"""Winnowing document fingerprints — the MOSS local fingerprinting
algorithm (Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for
Document Fingerprinting", SIGMOD 2003): hash every k-gram of the
squashed text, slide a window of w consecutive k-gram hashes, select
the MINIMUM of each window (rightmost on ties), and keep the distinct
selected (position, hash) pairs. Guarantees: any shared substring of
length >= k + w - 1 between two documents yields at least one shared
fingerprint, and ~2/(w+1) of grams are selected — a position-robust
dedup/overlap signal that whole-document hashing (text.fingerprint)
and random shingle sampling both miss.

Reference surface: the round brief's text-analysis list names
"document fingerprinting (rolling hash)" directly; this is the
canonical algorithm for it.

Spark-first shape: everything through fingerprint selection is PURE
ARRAY ALGEBRA on the JVM — transform/sequence builds the k-gram hash
array, a second transform computes each window's rightmost argmin,
array_distinct collapses repeats; zero shuffles, zero Python until the
caller aggregates. The k-gram hash is the polynomial
sum(ascii(c_j) * B^(k-1-j)) mod M with B=257, M=2^31-1 — written as a
flat integer expression (max intermediate 122*257^6*7 ~ 2.5e17, well
inside BIGINT), so a rolling evaluation is unnecessary and BOTH
engines compute the identical integer. Every fragment below is
generated from ONE template with dialect substitutions (the
classifier-LUT convention), so the DuckDB oracle cannot drift from the
Spark plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

B = 257
M = (1 << 31) - 1  # 2147483647

# dialect substitutions: template text is written in Spark SQL; the
# DuckDB rendering swaps the array-function spellings (semantics are
# identical: 1-based positions, inclusive slices of length L,
# first-match position, NULL-less mins on non-empty lists)
_DUCK = {
    "array_distinct(": "list_distinct(",
    "array_position(": "list_position(",
    "array_min(": "list_min(",
    "transform(": "list_transform(",
    "reverse(": "list_reverse(",
    # sequence(a, b) is inclusive; range(a, b) is exclusive stop
    "sequence(0, ": "range(0, 1 + ",
    "sequence(1, ": "range(1, 1 + ",
}


def _render(template: str, dialect: str) -> str:
    if dialect == "spark":
        return template
    if dialect != "duck":
        raise ValueError(f"unknown dialect {dialect!r}")
    out = template
    for a, b in _DUCK.items():
        out = out.replace(a, b)
    return out


def squash_sql(text: str, dialect: str = "spark") -> str:
    """Lowercase and strip every non-alphanumeric char (MOSS squashing:
    whitespace/punctuation must not break gram continuity)."""
    flags = ", 'g'" if dialect == "duck" else ""
    return f"regexp_replace(lower({text}), '[^a-z0-9]', ''{flags})"


def gram_hash_sql(s: str, i: str, k: int) -> str:
    """Polynomial hash of the k-gram of ``s`` starting at 1-based ``i``
    — a flat sum with precomputed B-powers, identical text in both
    dialects (substr/ascii agree)."""
    terms = [
        f"ascii(substr({s}, {i} + {j}, 1)) * {B ** (k - 1 - j)}"
        for j in range(k)
    ]
    return f"(({' + '.join(terms)}) % {M})"


def hashes_sql(s: str, k: int, dialect: str = "spark") -> str:
    """Array of all k-gram hashes of ``s`` (empty when shorter than k)."""
    t = (
        f"CASE WHEN length({s}) < {k} THEN array()"
        f" ELSE transform(sequence(1, length({s}) - {k} + 1),"
        f" i -> CAST({gram_hash_sql(s, 'i', k)} AS BIGINT)) END"
    )
    if dialect == "duck":
        t = t.replace("THEN array()", "THEN CAST([] AS BIGINT[])")
    return _render(t, dialect)


def winnow_positions_sql(hs: str, m: str, w: int, dialect: str = "spark") -> str:
    """Distinct selected positions (1-based into the hash array):
    window t covers hashes[t+1 .. t+L], L = least(w, m - t); selected =
    rightmost argmin = t + L + 1 - position of the min in the REVERSED
    slice (first match in the reversal is the rightmost original —
    the paper's tie rule). Windows slide t = 0 .. greatest(m - w, 0),
    which degrades gracefully to one whole-array window when m < w."""
    L = f"least({w}, {m} - t)"
    sl = f"slice({hs}, t + 1, {L})"
    if dialect == "duck":
        sl = f"{hs}[t + 1 : t + {L}]"
    t = (
        f"CASE WHEN {m} < 1 THEN array()"
        f" ELSE array_distinct(transform(sequence(0, greatest({m} - {w}, 0)),"
        f" t -> t + {L} + 1 - array_position(reverse({sl}), array_min({sl}))))"
        f" END"
    )
    if dialect == "duck":
        t = t.replace("THEN array()", "THEN CAST([] AS BIGINT[])")
    return _render(t, dialect)


def winnow_fingerprints(
    df: DataFrame,
    k: int = 7,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pos, fp_hash) — one row per selected fingerprint; ``pos`` is
    the 1-based gram position in the squashed text. Documents squashing
    to fewer than k chars contribute no rows (nothing to fingerprint)."""
    # ONE expression with let-bindings via the aggregate() HOF (zero is
    # evaluated once per row; the finish lambda BINDS it as a variable).
    # Without this, Catalyst's project collapsing inlines the squash
    # regex into every gram term and the hash-array transform into
    # every window slice — measured 16 s/doc on 300-char docs (the
    # whole squash re-ran ~2000x per row); bound, the full corpus pass
    # is sub-second. The winnow/hash/squash FRAGMENTS stay shared with
    # the DuckDB oracle (which references plain CTE columns — DuckDB
    # materializes per-row column values, so it needs no binding trick).
    empty = "CAST(array() AS ARRAY<STRUCT<pos: BIGINT, fp_hash: BIGINT>>)"
    fp_expr = (
        f"aggregate(array(1), {squash_sql(text_col)}, (acc, x) -> acc,"
        f" sq -> aggregate(array(1), {hashes_sql('sq', k)},"
        f" (a, x) -> a, hs -> CASE WHEN size(hs) < 1 THEN {empty}"
        f" ELSE transform({winnow_positions_sql('hs', 'size(hs)', w)},"
        f" p -> struct(CAST(p AS BIGINT) AS pos,"
        f" hs[CAST(p AS INT) - 1] AS fp_hash)) END))"
    )
    return (
        # NULL text drops here: downstream, Spark's NULL-SKIPPING
        # greatest/least would otherwise turn the NULL hash array into
        # a single (NULL, NULL) fingerprint row instead of zero rows
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(F.expr(fp_expr)).alias("__fp"))
        .select(id_col, "__fp.pos", "__fp.fp_hash")
    )


def winnow_fingerprints_exploded(
    df: DataFrame,
    k: int = 7,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Alternative physical plan for ``winnow_fingerprints`` — identical
    output (pinned by test_winnow_exploded_identity), different cost
    model: explode grams to rows and do the sliding rightmost-min with
    a codegen'd WINDOW function instead of interpreted array HOFs.
    min(struct(hash, -pos)) over [CURRENT, w-1 FOLLOWING] gives each
    window's (min hash, rightmost position) deterministically —
    struct ordering breaks hash ties toward the LARGEST pos, the
    paper's tie rule. Pays one corpus-sized shuffle (partitionBy doc)
    that the HOF path avoids; wins when per-row interpretation
    dominates (long docs), loses when the shuffle does (measured in
    PERFORMANCE §56 — the HOF path stays the default)."""
    from pyspark.sql import Window

    sq = squash_sql(text_col)
    # bind sq once (the §53 lesson), emit (pos, hash) rows
    grams = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.expr(sq).alias("__sq"))
        .where(F.length("__sq") >= k)
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"aggregate(array(1), __sq, (acc, x) -> acc, sq ->"
                    f" transform(sequence(1, length(sq) - {k} + 1),"
                    f" i -> struct(CAST(i AS BIGINT) AS pos,"
                    f" CAST({gram_hash_sql('sq', 'i', k)} AS BIGINT)"
                    f" AS h)))"
                )
            ).alias("__g"),
        )
        .select(id_col, "__g.pos", "__g.h")
    )
    n_w = Window.partitionBy(id_col)
    frame = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    # windows START only at t <= m - w (or the single t=1 window when
    # m < w) — rows past that carry suffix windows the algorithm
    # doesn't slide
    sel = (
        grams.withColumn("__m", F.count(F.lit(1)).over(n_w))
        .withColumn(
            "__win",
            F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).over(
                frame
            ),
        )
        .where(
            (F.col("pos") <= F.col("__m") - w + 1) | (F.col("pos") == 1)
        )
        .select(
            id_col,
            (-F.col("__win.np")).alias("pos"),
            F.col("__win.h").alias("fp_hash"),
        )
        .distinct()
    )
    return sel


def _fingerprint_impl(impl: str):
    """Resolve a fingerprint-stage implementation by name: 'hof' (pure
    JVM array algebra, the no-Python-plan default), 'exploded'
    (codegen'd window formulation, PERFORMANCE §56), or 'numpy'
    (Arrow-batched vectorized — the measured scale path for large
    corpora, §70: the interpreted O(m*w) HOF constant is ~30 ms/doc
    vs ~0.1 ms/doc vectorized; at 100x corpus scale that is the
    difference between the slowest rehearsal entry and a scan-bound
    one). All three are output-identical (identity gates in
    tests/test_fingerprint.py)."""
    impls = {
        "hof": winnow_fingerprints,
        "exploded": winnow_fingerprints_exploded,
        "numpy": winnow_fingerprints_numpy,
    }
    if impl not in impls:
        raise ValueError(f"unknown winnow impl {impl!r}; one of {sorted(impls)}")
    return impls[impl]


def winnow_overlap_pairs(
    df: DataFrame,
    k: int = 7,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    impl: str = "hof",
) -> DataFrame:
    """Candidate near-dup/overlap pairs: documents sharing >=
    ``min_shared`` DISTINCT fingerprint hashes. The no-miss guarantee
    lives at the FINGERPRINT layer: a common squashed substring of
    length >= k + w - 1 always yields >= 1 shared fingerprint (unlike
    random shingle sampling). This PAIR query then trades recall for
    join safety on top of it, explicitly: ``min_shared`` > 1 means a
    pair sharing only one short run is NOT emitted, and ``max_df``
    drops hashes present in more than that many documents before the
    self-join (boilerplate grams otherwise turn it quadratic; same
    production contract as the common-substring cap in dedup.py), so
    overlaps carried ONLY by boilerplate fingerprints are skipped too.
    Set min_shared=1, max_df=corpus size to recover the raw guarantee
    at the join's quadratic risk."""
    fps = _fingerprint_impl(impl)(df, k, w, text_col, id_col).select(
        F.col(id_col).alias("i"), "fp_hash"
    ).distinct()
    rare = (
        fps.groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
        .select("fp_hash")
    )
    keyed = fps.join(rare, "fp_hash")
    other = keyed.select(F.col("i").alias("j"), "fp_hash")
    return (
        keyed.join(other, "fp_hash")
        .where(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def fingerprint_df_histogram(
    df: DataFrame,
    k: int = 7,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    impl: str = "hof",
) -> DataFrame:
    """Document-frequency histogram of winnow fingerprints: one row per
    occurring df value — (df, n_hashes, n_postings) where n_hashes =
    distinct fingerprint hashes appearing in exactly ``df`` documents
    and n_postings = df * n_hashes (the join fan-in those hashes would
    contribute).

    This is the datum ``winnow_overlap_pairs``' ``max_df`` must be read
    from (measured rule, PERFORMANCE §65a): the cap has to sit ABOVE
    the corpus' duplication factor — at a 10x-replicated corpus the
    production df<=5 cap dropped whole replica families and recall fell
    0.56 -> 0.08 — while staying BELOW boilerplate df (thousands).
    The histogram's gap between the duplicate-family mode and the
    boilerplate tail is where max_df belongs; eyeball it, or take the
    largest df whose cumulative n_postings keeps the pair join budget.

    Scale shape: fingerprints (shuffle-free HOF pass) -> distinct ->
    ONE map-side-combined aggregate per grain (hash -> df, df -> count).
    Output is bounded by the distinct df VALUES (<= max family size),
    metadata-sized at any corpus scale.
    """
    fps = _fingerprint_impl(impl)(df, k, w, text_col, id_col).select(
        id_col, "fp_hash"
    ).distinct()
    per_hash = fps.groupBy("fp_hash").agg(F.count(F.lit(1)).alias("df"))
    return (
        per_hash.groupBy("df")
        .agg(F.count(F.lit(1)).alias("n_hashes"))
        .select(
            "df",
            "n_hashes",
            (F.col("df") * F.col("n_hashes")).alias("n_postings"),
        )
    )


def winnow_fingerprints_numpy(
    df: DataFrame,
    k: int = 7,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched numpy twin of `winnow_fingerprints` — identical
    output (pinned by test_winnow_numpy_identity), third cost model
    beside the HOF default and the exploded-window variant: the per-row
    O(m*w) interpreted-expression constant becomes ~k+2 vectorized
    passes per document (polynomial gram hash as k strided
    multiply-adds — no per-gram mod needed, the flat sum maxes at
    ~2.5e17, inside int64 like the SQL fragment — then a
    sliding_window_view rightmost-argmin for the winnow). This is the
    documented-extension-path exception to the no-Python rule
    (PERFORMANCE §70 measures when it pays): one ArrowEval stage, zero
    shuffles, O(batch) task memory.

    Semantics notes pinned by the identity gate: squash is the same
    '[^a-z0-9]' class after lower() (post-squash text is pure ASCII, so
    np.frombuffer of the encoded bytes matches SQL ascii()); reversed
    argmin takes the FIRST minimum of the reversed window = the
    paper's rightmost tie rule; m < w degrades to one whole-array
    window; NULL/too-short docs contribute no rows."""
    import re

    import numpy as np
    import pandas as pd

    pw = [B ** (k - 1 - j) for j in range(k)]
    pat = re.compile("[^a-z0-9]")
    # carry the caller's id type through — the three impls behind
    # _fingerprint_impl are interchangeable, so a string/int doc id must
    # work here exactly as it does on the HOF and exploded paths
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, pos long, fp_hash long"

    def run(batches):
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            ids, cnts, poss, hss = [], [], [], []
            for did, txt in zip(
                pdf[id_col].to_numpy(), pdf[text_col].to_numpy()
            ):
                if txt is None:
                    continue
                sq = pat.sub("", txt.lower())
                if len(sq) < k:
                    continue
                arr = np.frombuffer(sq.encode("ascii"), dtype=np.uint8)
                n = len(sq) - k + 1
                h = np.zeros(n, dtype=np.int64)
                for j in range(k):
                    h += arr[j : j + n].astype(np.int64) * pw[j]
                h %= M
                if n < w:
                    sel = np.array([n - 1 - h[::-1].argmin()])
                else:
                    wv = sliding_window_view(h, w)
                    ridx = wv[:, ::-1].argmin(axis=1)
                    sel = np.arange(n - w + 1) + (w - 1 - ridx)
                sel = np.unique(sel)
                # id-type-generic: np.repeat over an object/int array
                # (r11 — one repeat per doc beats a 10^6-element Python
                # list build; measured 11.2 -> 8.4 s single-threaded on
                # the sf1 corpus, output byte-identical)
                ids.append(did)
                cnts.append(len(sel))
                poss.append(sel + 1)
                hss.append(h[sel])
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: np.repeat(np.array(ids), np.array(cnts)),
                        "pos": np.concatenate(poss),
                        "fp_hash": np.concatenate(hss),
                    }
                )

    # r11 (guide §2.5 input skew): a local small-file corpus arrives as
    # 1-2 splits, serializing the whole Arrow stage onto one core —
    # conditional fan-out exactly as the signature paths do (no-op at
    # scale where the source already has >= parallelism splits)
    from .dedup import _fan_out

    return _fan_out(df.select(id_col, text_col), id_col).mapInPandas(
        run, out_schema
    )
