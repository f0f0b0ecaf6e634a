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


def doc_bigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, bg) — one row per adjacent token pair, tab-joined ("w1\\tw2").
    Documents with fewer than two tokens contribute nothing. The explicit
    size guard exists because ``sequence(1, 0)`` in Spark counts DOWN
    (step sign is inferred), which would fabricate phantom bigrams.

    The token array is materialized through a staging barrier BEFORE the
    per-position transform: Catalyst has no CSE inside higher-order-function
    lambdas, so an inlined ``split()`` would re-tokenize the whole document
    for every element access — 2 x len(doc) full splits per document
    (PERFORMANCE.md: HOF lambda CSE absence; measured 3x on this operator)."""
    from .dedup import _barrier, _fan_out

    # fan out on narrow (local small-file) inputs: tokenize + the bigram
    # explode + the map-side partial aggregate all run BEFORE the first
    # exchange, i.e. on the scan's split count — 1-2 tasks for a local
    # single-file corpus (r11, guide §2.5 input skew; no-op at scale)
    staged = _barrier(
        _fan_out(docs.select(F.col(id_col), F.col(text_col)), id_col)
        .withColumn("__toks", tokens(F.col(text_col)))
    )
    t = F.col("__toks")
    idx = F.when(
        F.size(t) >= 2, F.sequence(F.lit(1), F.size(t) - 1)
    ).otherwise(F.array().cast("array<int>"))
    bgs = F.transform(
        idx,
        lambda i: F.concat_ws(
            "\t", F.try_element_at(t, i), F.try_element_at(t, i + 1)
        ),
    )
    return staged.select(F.col(id_col), F.explode(bgs).alias("bg"))


def bigram_coherence(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, n_bigrams, coherence_e6): a statistical fluency signal — the
    per-document average of the corpus conditional bigram frequency
    floor(1e6 * c(w1 w2) / c(w1 ·)), where c(w1 ·) counts bigram
    occurrences starting with w1. Text stitched together from unrelated
    fragments scores low; text reusing the corpus's own collocations scores
    high — the classic cheap proxy for an LM-perplexity quality filter.

    Every ratio is floored to e6 fixed-point BEFORE averaging and the
    average is an integer floor-mean, so the whole statistic is engine-exact
    (no float-sum ordering anywhere) and fully SQL-oracle-checkable.

    Scale shape: two count aggregations whose key spaces are the bigram and
    unigram vocabularies (map-side combine collapses hot keys), then
    equi-joins back on those keys — broadcast when the vocab is small,
    shuffled hash otherwise (_maybe_broadcast). Per-doc floor-mean is one
    final shuffle on doc id. No explode ever self-joins, so hot tokens cost
    their count, not their count squared."""
    # two-level aggregation (the doc_term_counts pattern): collapse repeats
    # to (doc, bg, k) first — map-side combine soaks up hot bigrams, the
    # corpus count layer then reads per-doc-distinct rows, and the two
    # consumers of the (doc, bg) aggregate share ONE exchange (plan-reused)
    # instead of re-tokenizing the corpus per consumer. c(w1 ·) rolls up
    # from the bigram counts — vocab-sized input, never the token stream.
    db = (
        doc_bigrams(docs, id_col, text_col)
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    cbg = db.groupBy("bg").agg(F.sum("k").alias("c_bg"))
    w1 = F.split(F.col("bg"), "\t").getItem(0)
    cpre = cbg.select(w1.alias("w1"), "c_bg").groupBy("w1").agg(
        F.sum("c_bg").alias("c_pre")
    )
    r = (
        db.join(_maybe_broadcast(cbg, 1_000_000), "bg")
        .withColumn("w1", w1)
        .join(_maybe_broadcast(cpre, 1_000_000), "w1")
        .select(
            id_col,
            "k",
            F.floor(F.lit(1_000_000) * F.col("c_bg") / F.col("c_pre")).alias("r_e6"),
        )
    )
    return r.groupBy(id_col).agg(
        F.sum("k").alias("n_bigrams"),
        F.floor(F.sum(F.col("k") * F.col("r_e6")) / F.sum("k")).alias("coherence_e6"),
    )


def corpus_datacard(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str | None = "source",
    lang_col: str | None = "lang",
    short_doc_tokens: int = 20,
) -> DataFrame:
    """One-pass corpus datasheet ("Datasheets for Datasets"-style summary):
    per (source, lang) ROLLUP — so per-source, per-lang, per-pair and
    grand-total rows ride ONE aggregation over ONE scan — of the integer
    statistics a training-data release publishes:

        n_docs, n_tokens, n_chars, n_distinct_texts (exact, via md5
        fingerprint), n_short_docs (< short_doc_tokens), n_exact_dup_docs
        (docs minus distinct texts).

    All counts are exact integers (count-distinct on the 32-char
    fingerprint, never the text), so the output is engine-exact and
    oracle-checkable. Missing grouping columns are labeled 'ALL', matching
    the rel_pricing_summary rollup convention.

    Scale shape: one scan; the only shuffle keys are (source, lang,
    grouping-set id) plus the fingerprint for the distinct count —
    partial aggregation collapses everything map-side. Output is
    #sources x #langs rows — driver-safe at any corpus size."""
    from . import text as T

    groups = [c for c in (source_col, lang_col) if c]
    toks = T.token_count(F.col(text_col))
    fp = T.fingerprint(F.col(text_col))
    agg = (
        docs.rollup(*groups)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).cast("bigint").alias("n_tokens"),
            F.sum(F.length(text_col).cast("bigint")).alias("n_chars"),
            F.countDistinct(fp).alias("n_distinct_texts"),
            F.sum((toks < short_doc_tokens).cast("bigint")).alias("n_short_docs"),
        )
        .withColumn(
            "n_exact_dup_docs", F.col("n_docs") - F.col("n_distinct_texts")
        )
    )
    for c in groups:
        agg = agg.withColumn(c, F.coalesce(F.col(c), F.lit("ALL")))
    return agg.orderBy(*groups) if groups else agg


# shared fixed-point KL plumbing (corpus_kl_drift / corpus_kl_e9 /
# windowed_kl_vs_reference — review r10 pass 3: one copy of the overflow
# guards and the remainder-refined e9 division, not three)
_KL_LIMIT = (1 << 62) - 1


def _kl_contrib_guarded(n_col, delta, token, op: str):
    """(n+1) * delta with the in-plan overflow raise. The test multiplies
    in DECIMAL(38,0) — any BIGINT pair's product is < 2^126/2 ~ 8.5e37 <
    1e38, so the guard product itself can never overflow, and the bound
    is EXACT: (n+1)*(|delta|+1) > LIMIT is the integer-floor-division
    condition (n+1) > LIMIT div (|delta|+1) with no double-rounding fuzz
    (ADVICE r10: the previous LIMIT / (|delta|+1) double division was
    ~2^10 ulps approximate near 2^62)."""
    dec = "decimal(38,0)"
    return F.when(
        (n_col + F.lit(1)).cast(dec) * (F.abs(delta) + F.lit(1)).cast(dec)
        > F.lit(_KL_LIMIT).cast(dec),
        F.raise_error(
            F.concat(
                F.lit(f"{op}: contribution overflow for token "),
                token,
                F.lit(" — pre-aggregate or pre-scale the counts first"),
            )
        ).cast("long"),
    ).otherwise((n_col + F.lit(1)) * delta)


def _kl_e9_refined(df: DataFrame, sd_col: str, norm_col: str, op: str) -> DataFrame:
    """DECIMAL(38,0) numerator -> guarded BIGINT -> >=0 clamp (KL is
    non-negative; a tiny negative sum is LUT noise, and positivity keeps
    Spark DIV truncation and DuckDB // flooring identical) -> e9 via
    quotient*1000 + refined remainder. Adds ``__kl_e9``."""
    s_long = F.when(
        F.abs(F.col(sd_col)) > F.lit(_KL_LIMIT).cast("decimal(38,0)"),
        F.raise_error(
            F.lit(
                f"{op}: drift numerator exceeds exact BIGINT range — "
                "pre-scale the counts (e.g. aggregate per thousand)"
            )
        ).cast("long"),
    ).otherwise(F.col(sd_col).cast("long"))
    return df.withColumn(
        "__s", F.greatest(s_long, F.lit(0).cast("long"))
    ).withColumn(
        "__kl_e9",
        F.expr(f"(__s DIV {norm_col}) * 1000")
        + F.expr(f"((__s % {norm_col}) * 1000) DIV {norm_col}"),
    )


def corpus_kl_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Distribution drift between two corpus snapshots: the per-token
    decomposition of KL(P_a || P_b) over Laplace-smoothed unigram
    distributions — the monitoring primitive for "did this crawl/filter
    change what the model will see" (new-snapshot vs old, train vs val,
    pre- vs post-dedup). Positive ``delta_log_e6`` marks tokens
    over-represented in A relative to B; ``contrib_num`` is the token's
    (unnormalized) share of the total divergence.

    With V = |union vocabulary|, N_x = total tokens in corpus x and
    smoothed p_x(t) = (c_x(t)+1)/(N_x+V):

        KL = sum_t p_a(t) * [ln(c_a+1) - ln(c_b+1) + ln(N_b+V) - ln(N_a+V)]

    Every ln argument is an integer, so ln is the classifier module's
    shared fixed-point LUT (operators/classifier.py:log_lut — the same
    1023-row table + shift algebra both engines consume as DATA), making
    the whole drift table engine-exact: delta_log_e6 is the bracketed
    term in 1e-6 nats, contrib_num = (c_a+1) * delta_log_e6. Divide
    sum(contrib_num) by (N_a+V) for the total — ``corpus_kl_e9`` does
    this with remainder refinement, summing in DECIMAL(38,0) behind a
    loud guard so neither the per-token products (guarded here) nor the
    vocabulary-wide total can overflow silently.

    In-plan guards raise (rather than overflow) when a token's
    (c_a+1) * |delta| product would exceed 2^62 — at ~1e11 occurrences
    of one token, pre-aggregate or sample first.

    Scale shape: one map-side-combined token-count aggregate per corpus,
    a vocabulary-sized full-outer join on token, four LUT attaches (1023-
    row broadcasts), and the two total counts attached as ONE-ROW
    broadcast aggregates — no window ever runs over the vocabulary in a
    single partition, so a billion-token union vocabulary stays
    partitioned throughout.
    """
    from .classifier import LN2_E6, _attach_ilog, log_lut
    from .text import tokens as _tokens

    spark = df_a.sparkSession
    lut_df = spark.createDataFrame(log_lut(), "m int, ln_e6 long")

    def counts(df: DataFrame, side: str) -> DataFrame:
        return (
            df.select(
                F.explode(_tokens(F.col(text_col))).alias("token")
            )
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(f"count_{side}"))
        )

    ca, cb = counts(df_a, "a"), counts(df_b, "b")
    j = (
        ca.join(cb, "token", "full_outer")
        .withColumn("count_a", F.coalesce(F.col("count_a"), F.lit(0)))
        .withColumn("count_b", F.coalesce(F.col("count_b"), F.lit(0)))
    )
    # union-vocab size and totals as a ONE-ROW broadcast aggregate (the
    # lm.py/retrieval.py stats pattern) — never a single-partition window
    # over the vocabulary
    totals = j.agg(
        F.count(F.lit(1)).alias("__v"),
        F.sum("count_a").alias("__na"),
        F.sum("count_b").alias("__nb"),
    )
    j = j.crossJoin(F.broadcast(totals))

    j = _attach_ilog(j, "count_a + 1", "__la", lut_df, "kla")
    j = _attach_ilog(j, "count_b + 1", "__lb", lut_df, "klb")
    j = _attach_ilog(j, "__na + __v", "__lna", lut_df, "klna")
    j = _attach_ilog(j, "__nb + __v", "__lnb", lut_df, "klnb")
    delta = (
        F.col("__la") - F.col("__lb") + F.col("__lnb") - F.col("__lna")
    ).cast("long")
    guarded = _kl_contrib_guarded(
        F.col("count_a"), delta, F.col("token"), "corpus_kl_drift"
    )
    return j.select(
        "token",
        F.col("count_a").cast("long").alias("count_a"),
        F.col("count_b").cast("long").alias("count_b"),
        delta.alias("delta_log_e6"),
        guarded.cast("long").alias("contrib_num"),
        (F.col("__na") + F.col("__v")).cast("long").alias("norm_a"),
    )


def corpus_kl_e9(drift: DataFrame) -> DataFrame:
    """Total KL(P_a || P_b) in 1e-9 nats from a ``corpus_kl_drift``
    table: sum the per-token numerators, divide by the (constant) norm
    with integer remainder refinement — quotient*1000 + carry — so the
    e9 precision costs no product beyond what the drift table already
    guarded. The vocabulary-wide SUM itself runs in DECIMAL(38,0) (the
    per-token guard bounds each term, not the total; at ~9.2e18
    e6-weighted nats — a few trillion tokens of drift — a BIGINT sum
    would overflow: wrapping silently under non-ANSI configs, or dying
    with a generic overflow under ANSI) and converts back behind a loud
    in-plan guard. Empty drift tables total 0, not NULL."""
    s = drift.agg(
        F.coalesce(
            F.sum(F.col("contrib_num").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("__sd"),
        F.coalesce(F.max("norm_a"), F.lit(1).cast("long")).alias("__n"),
    )
    return _kl_e9_refined(s, "__sd", "__n", "corpus_kl_e9").select(
        F.col("__kl_e9").alias("kl_e9")
    )


def _windowed_drift_rows(wc: DataFrame, ref: DataFrame, op: str) -> DataFrame:
    """Shared per-(window, token) drift rows for the windowed KL family:
    (window_start, token, n_win, n_ref, __nw, __nr, __v, delta_log_e6,
    contrib_num). The aggregate (windowed_kl_vs_reference) and the
    detail view (windowed_kl_top_movers) both read this one plan."""
    from .classifier import _attach_ilog, log_lut

    spark = wc.sparkSession
    lut_df = spark.createDataFrame(log_lut(), "m int, ln_e6 long")

    refc = ref.select(
        F.col("token").cast("string").alias("token"),
        F.col("n").cast("long").alias("n_ref"),
    ).groupBy("token").agg(F.sum("n_ref").alias("n_ref"))
    # both join sides derive from wc: alias every column to FRESH
    # attributes so the full-outer join cannot see conflicting references
    # (a memory-sink/view lineage fails resolution otherwise — caught by
    # the streaming==batch gate)
    windows = (
        wc.select(F.col("window_start").alias("__ws")).distinct()
    )
    expanded = windows.crossJoin(F.broadcast(refc))
    counts = wc.select(
        F.col("window_start").alias("__ws"),
        F.col("token").cast("string").alias("token"),
        F.col("n").cast("long").alias("n_win"),
    )
    j = (
        expanded.join(counts, ["__ws", "token"], "full_outer")
        .withColumn("n_win", F.coalesce(F.col("n_win"), F.lit(0).cast("long")))
        .withColumn("n_ref", F.coalesce(F.col("n_ref"), F.lit(0).cast("long")))
    )
    totals = j.groupBy("__ws").agg(
        F.count(F.lit(1)).alias("__v"),
        F.sum("n_win").alias("__nw"),
        F.sum("n_ref").alias("__nr"),
    )
    # the totals' ilogs are constant per window: attach them on the
    # window-count-sized totals table (W rows through the LUT joins),
    # not on the W x |ref| expanded table (review r10 pass 3)
    totals = _attach_ilog(totals, "__nw + __v", "__lnw", lut_df, "nwkl")
    totals = _attach_ilog(totals, "__nr + __v", "__lnr", lut_df, "nrkl")
    j = j.join(totals, "__ws").withColumnRenamed("__ws", "window_start")

    j = _attach_ilog(j, "n_win + 1", "__lw", lut_df, "wkl")
    j = _attach_ilog(j, "n_ref + 1", "__lr", lut_df, "rkl")
    delta = (
        F.col("__lw") - F.col("__lr") + F.col("__lnr") - F.col("__lnw")
    ).cast("long")
    contrib = _kl_contrib_guarded(F.col("n_win"), delta, F.col("token"), op)
    return j.withColumn("delta_log_e6", delta).withColumn(
        "contrib_num", contrib.cast("long")
    )


def windowed_kl_top_movers(
    wc: DataFrame,
    ref: DataFrame,
    k: int = 10,
) -> DataFrame:
    """The detail behind a drift alert: per window, the ``k`` tokens
    contributing MOST divergence (by |contrib_num|, ties by token) —
    what an on-call engineer reads after windowed_kl_vs_reference fires.
    Columns: (window_start, token, n_win, n_ref, delta_log_e6,
    contrib_num, mover_rank). Same exact fixed-point rows as the
    aggregate — the two views share one plan builder.

    Scale shape: one rank window partitioned BY WINDOW over the
    per-window union vocabulary; Spark's window-group-limit pushes the
    rank <= k cutoff into the ranking (the per_group_cap argument), so a
    large vocabulary never materializes its full ranked list per task.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    rows = _windowed_drift_rows(wc, ref, "windowed_kl_top_movers")
    w = Window.partitionBy("window_start").orderBy(
        F.abs(F.col("contrib_num")).desc(), F.col("token").asc()
    )
    return (
        rows.withColumn("mover_rank", F.row_number().over(w))
        .where(F.col("mover_rank") <= k)
        .select(
            "window_start",
            "token",
            "n_win",
            "n_ref",
            "delta_log_e6",
            "contrib_num",
            F.col("mover_rank").cast("long").alias("mover_rank"),
        )
    )


def windowed_kl_vs_reference(
    wc: DataFrame,
    ref: DataFrame,
) -> DataFrame:
    """Per-window distribution drift against a reference: for each
    event-time window in ``wc`` (window_start, token, n — e.g. from
    streaming/windows.windowed_value_counts), KL(P_window || P_ref) over
    Laplace-smoothed distributions, where P_ref comes from ``ref``
    (token, n) — a curated reference table (yesterday's corpus, the
    training mix, the SLA distribution). The alerting primitive for
    "did this hour's traffic/crawl change shape".

    Same fixed-point discipline as ``corpus_kl_drift``: the union
    vocabulary is per-window (a window missing a reference token still
    pays its mass), every ln is the shared 1023-row LUT, the per-window
    numerator sums in DECIMAL(38,0) behind a guard, and the result —
    (window_start, n_tokens, v_union, kl_e9) — is engine-exact.

    Scale shape: windows x |ref| expansion via ONE broadcast of the
    reference (bounded: a reference distribution is a curated table,
    not a corpus), a full-outer join against the window counts
    partitioned by (window, token), per-window totals as a groupBy
    joined back on window (window-count-sized), LUT broadcasts; no
    single-partition windows anywhere.
    """
    j = _windowed_drift_rows(wc, ref, "windowed_kl_vs_reference")

    per_win = j.groupBy("window_start").agg(
        F.max("__nw").alias("n_tokens"),
        F.max("__v").alias("v_union"),
        F.coalesce(
            F.sum(F.col("contrib_num").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("__sd"),
        (F.max("__nw") + F.max("__v")).alias("__norm"),
    )
    return _kl_e9_refined(
        per_win, "__sd", "__norm", "windowed_kl_vs_reference"
    ).select(
        "window_start",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("v_union").cast("long").alias("v_union"),
        F.col("__kl_e9").alias("kl_e9"),
    )


def ks_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
) -> DataFrame:
    """Kolmogorov–Smirnov drift between two snapshots of a NUMERIC
    column — the companion to the KL family above (KL reads categorical
    shape; KS reads a numeric column's whole CDF, catching mean/tail
    shifts a histogram bucketing would blur). Returns ONE row:
    (n_a, n_b, n_values, ks_e6, ks_at_value) where ks_e6 =
    floor(1e6 * max_v |CDF_a(v) - CDF_b(v)|) and ks_at_value is the
    smallest value attaining the max.

    Exactness: ``value_col`` must be integer fixed-point (cents, *_e4 —
    cast to BIGINT; floats would make both the distinct-value table and
    the tie behavior engine-fragile). The CDF comparison is
    cross-multiplied — |cum_a * n_b - cum_b * n_a| in DECIMAL(38,0), so
    nothing overflows below 1e38 — and the final ratio is integral
    division, bit-identical in both engines. NULL values are excluded.
    Degenerate inputs: both sides empty -> ks 0; exactly one side empty
    -> ks 1e6 (total drift).

    Scale shape: one map-side-combined count aggregate per side keyed by
    VALUE, a full-outer join of the two value tables, and cumulative
    sums over the distinct-value table — bounded by the fixed-point
    RESOLUTION, not the corpus (the threshold_sweep argument), so the
    single-partition ordered window is bounded metadata.
    """
    from pyspark.sql import Window

    def counts(df: DataFrame, side: str) -> DataFrame:
        return (
            df.where(F.col(value_col).isNotNull())
            .groupBy(F.col(value_col).cast("long").alias("v"))
            .agg(F.count(F.lit(1)).alias(f"c_{side}"))
        )

    j = (
        counts(df_a, "a").join(counts(df_b, "b"), "v", "full_outer")
        .withColumn("c_a", F.coalesce(F.col("c_a"), F.lit(0).cast("long")))
        .withColumn("c_b", F.coalesce(F.col("c_b"), F.lit(0).cast("long")))
    )
    order = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    everything = Window.partitionBy()
    staged = (
        j.withColumn("cum_a", F.sum("c_a").over(order))
        .withColumn("cum_b", F.sum("c_b").over(order))
        .withColumn("n_a", F.sum("c_a").over(everything))
        .withColumn("n_b", F.sum("c_b").over(everything))
        .withColumn(
            "diff",
            F.abs(
                F.col("cum_a").cast("decimal(38,0)")
                * F.col("n_b").cast("decimal(38,0)")
                - F.col("cum_b").cast("decimal(38,0)")
                * F.col("n_a").cast("decimal(38,0)")
            ),
        )
    )
    staged = staged.withColumn("__maxdiff", F.max("diff").over(everything))
    na = F.coalesce(F.max("n_a"), F.lit(0).cast("long"))
    nb = F.coalesce(F.max("n_b"), F.lit(0).cast("long"))
    return staged.agg(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.when((na == 0) & (nb == 0), F.lit(0).cast("long"))
        .when((na == 0) | (nb == 0), F.lit(1_000_000).cast("long"))
        .otherwise(
            F.expr(
                "CAST(max(diff) * CAST(1000000 AS DECIMAL(38,0)) AS "
                "DECIMAL(38,0)) DIV (CAST(max(n_a) AS DECIMAL(38,0)) * "
                "CAST(max(n_b) AS DECIMAL(38,0)))"
            ).cast("long")
        )
        .alias("ks_e6"),
        F.min(F.when(F.col("diff") == F.col("__maxdiff"), F.col("v")))
        .cast("long")
        .alias("ks_at_value"),
    )


def corpus_snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document-level diff between two corpus snapshots — the dataset-card
    question "what changed since the last crawl?" as one row per doc id
    present in EITHER snapshot: status in {'added', 'removed', 'changed',
    'unchanged'} (changed = both present, canonical fingerprint differs;
    the fingerprint is md5 of the normalized text, so formatting-only
    edits outside [a-z0-9 ] read as unchanged — the same canonical form
    exact dedup keys on). fp_old/fp_new ride along for downstream joins
    (e.g. route 'changed' docs back through quality scoring).

    Scale shape: two per-row fingerprint maps (zero shuffle, text never
    leaves its partition) + ONE full-outer hash join on (id, 36-byte
    fp) rows. Compose with `snapshot_diff_summary` for the aggregate
    card, or `exact_dedup_incremental` when you want the durable-store
    continuous form instead of a two-snapshot compare."""
    from . import text as T

    o = old.select(
        F.col(id_col), T.fingerprint(F.col(text_col)).alias("fp_old")
    )
    n = new.select(
        F.col(id_col), T.fingerprint(F.col(text_col)).alias("fp_new")
    )
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") == F.col("fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(id_col, status.alias("status"), "fp_old", "fp_new")


def snapshot_diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n_docs) rollup of `corpus_snapshot_diff` — the 4-row
    dataset-card header. One map-side-combined aggregate."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))
