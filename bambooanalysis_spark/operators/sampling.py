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


def temperature_mix(
    df: DataFrame,
    key: str,
    strata: str,
    budget: int,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-weighted source mixing (sqrt temperature, i.e. alpha=0.5):
    down-weight head sources and up-weight tail sources so the sampled corpus
    targets ~``budget`` rows distributed proportionally to sqrt(n_s) across
    strata — the standard multi-source training-mix reweighting.

    Per-stratum keep threshold: floor(budget * w_s * N_BUCKETS / (W * n_s))
    with w_s = floor(sqrt(n_s) * 1e6) and W = sum(w_s) — ALL integer
    arithmetic after one correctly-rounded sqrt, so the kept set is a pure
    function of the data (bit-identical across engines and reruns; the
    DuckDB oracle replicates it exactly). Thresholds cap at N_BUCKETS, so a
    tail stratum whose tempered share exceeds its size is kept whole.

    Scale shape: the stratum-count aggregate is tiny (one row per source),
    the thresholds come back via a broadcast join, and membership is the
    same shuffle-free hash-bucket filter as everywhere else in this module —
    no skew sensitivity to hot sources.
    """
    from pyspark.sql import Window

    counts = df.groupBy(strata).agg(F.count(F.lit(1)).alias("__n"))
    w = counts.withColumn(
        "__w", F.floor(F.sqrt(F.col("__n").cast("double")) * F.lit(1_000_000.0))
    )
    # grand total via an unpartitioned window over the (tiny) per-stratum
    # frame — the single-partition shuffle touches one row per source, and
    # it avoids the self-join lineage a crossJoin with w.agg() would have
    total = F.sum("__w").over(Window.partitionBy())
    thresholds = w.select(
        strata,
        F.least(
            F.floor(
                F.lit(int(budget) * N_BUCKETS) * F.col("__w") / (total * F.col("__n"))
            ),
            F.lit(N_BUCKETS),
        ).alias("__thresh"),
    )
    bucket = hash_bucket(F.col(key), salt)
    return (
        df.join(F.broadcast(thresholds), on=strata, how="inner")
        .where(bucket < F.col("__thresh"))
        .drop("__thresh")
    )


def training_order(
    df: DataFrame, id_col: str = "doc_id", seed: int = 0, n_shards: int = 64
) -> DataFrame:
    """Deterministic global shuffle for training-data export: every row
    gets a (shard, pos) address from an md5 sort key — reproducible across
    reruns, engines and partitionings (no rand(), no zipWithIndex), and
    re-seedable per epoch. Readers stream shards in pos order and see a
    uniform random permutation of the corpus.

    Scale shape: shard = key mod n_shards partitions the corpus; pos is a
    ROW_NUMBER per shard — the sort is per-shard (corpus/n_shards rows),
    parallel across shards, never a single global sort. A global
    zipWithIndex-style total order would serialize at the final stage;
    per-shard addresses are what shard-sharded training readers consume
    anyway.
    """
    key = hash64(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    from pyspark.sql import Window

    staged = df.select(F.col(id_col), key.alias("__key")).withColumn(
        "shard", F.pmod(F.col("__key"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("__key", id_col)
    return staged.select(
        id_col,
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    each row draws priority u^(1/w) from a deterministic md5-uniform u and
    the global top-k priorities win — inclusion probability proportional
    to weight, reproducible across reruns/partitionings (no rand()), and
    re-drawable via ``salt``.

    Scale shape: priorities are a per-row projection; the top-k is
    sort+limit (TakeOrdered — per-partition top-k then a k-sized driver
    merge, never a global sort). Rows with weight <= 0 are excluded.
    Priorities are IEEE doubles (pow) — deterministic on one platform and
    gated by a numpy property test rather than a SQL-hash oracle.
    """
    # u in (0, 1]: (hash + 1) / 2^60 over the raw 60-bit md5-derived key
    u = (
        hash64(F.concat(F.col(id_col).cast("string"), F.lit(salt))) + 1
    ) / F.lit(float(2**60))
    w = F.col(weight_col).cast("double")
    pri = F.pow(u, F.lit(1.0) / w)
    return (
        df.where(w > 0)
        .withColumn("__pri", pri)
        .orderBy(F.col("__pri").desc(), F.col(id_col))
        .limit(k)
        .drop("__pri")
    )


def per_group_cap(
    df: DataFrame,
    group_col: str,
    order_col: str,
    cap: int,
    descending: bool = False,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen by a deterministic
    per-group order — the C4/RefinedWeb-style per-domain document cap
    (bound any one source's share of the training mix). Adds
    ``rank_in_group`` (1-based).

    Plan: one window shuffle on the group key with a rank cutoff; Spark
    pushes the `rank <= cap` filter into the window via its group-limit
    optimization, so a 10M-row domain never materializes its full ranked
    list per task at 100 TB. Hot domains are EXACTLY the rows this
    operator exists to bound, and the cutoff applies while ranking.
    """
    from pyspark.sql import Window

    # order_col must totally order rows within a group (use a unique key,
    # or the kept set is nondeterministic under ties)
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(group_col).orderBy(oc)
    return (
        df.withColumn("rank_in_group", F.row_number().over(w))
        .where(F.col("rank_in_group") <= cap)
    )


def token_budget_mix(
    df: DataFrame,
    strata: str,
    tokens_col: str,
    budget: int,
    weights: dict[str, int] | None = None,
    ratio_scale: int = 10_000,
) -> DataFrame:
    """Token-budget mixture solver (water-filling): given per-row token
    counts and a target training budget, decide how many tokens to TAKE
    from each stratum so that (a) no stratum gives more than it has,
    (b) unsaturated strata contribute proportionally to their mixture
    weight, and (c) the total is exactly ``min(budget, total available)``.
    This is the mixture-design step of a multi-source pretraining corpus
    (the Pile/DoReMi-style "how much of each domain do we actually train
    on" decision): temperature_mix picks WHICH rows once rates are known;
    this operator computes the rates themselves under availability caps.

    Algorithm (classic water-filling, but specified deterministically so
    a SQL oracle reproduces it bit-for-bit):

    1. aggregate ``tokens_col`` per stratum (rows with a NULL stratum are
       excluded — they have no mixture identity);
    2. order strata by the QUANTIZED availability/weight ratio
       ``rkey = (avail DIV w) * ratio_scale + ((avail % w) * ratio_scale)
       DIV w`` (ties by stratum name). The quantization keeps the sort
       key in exact BIGINT arithmetic — two ratios closer than
       1/ratio_scale ABSOLUTE may order by name, which both engines do
       identically. Weights are therefore capped at ``ratio_scale``
       (ValueError above it): with w <= ratio_scale a quantization
       mis-order can distort a stratum's share by at most w/ratio_scale
       <= 1 token before the clamp in step 4, so invariant (a) holds
       unconditionally (review r10: uncapped weights let a mis-ordered
       stratum be handed a proportional share far above its
       availability);
    3. walk in that order and saturate (alloc = avail) while the EXACT
       cross-multiplied water-level test holds:
       ``avail_i * W_rem_i <= (budget - A_prev_i) * w_i`` with
       ``A_prev`` = tokens already granted to earlier (saturated) strata
       and ``W_rem`` = total weight from i onward. The test is monotone
       along the sorted order (once it fails, every later larger-ratio
       stratum fails too), so it is ONE cumulative-AND window, not a
       loop;
    4. split the remaining budget over unsaturated strata proportionally
       to weight with floor division, handing out the remainder by the
       largest-remainder method (ties by stratum name), then clamp each
       share at the stratum's availability. The total equals
       ``min(budget, total available)`` exactly unless the clamp binds —
       which requires two ratios within 1/ratio_scale of the water level
       (a measure-zero tie class) and then costs at most ~1 token per
       tied stratum; the clamp guarantees invariant (a) in exactly those
       cases.

    All arithmetic is BIGINT (both engines floor positive division the
    same way). In-plan ``raise_error`` guards reject inputs whose
    cross-products could overflow: negative per-stratum token sums
    (always a data bug, same contract as materialize_token_mix) and a
    TOTAL availability above 2^62 / max(total weight, ratio_scale,
    1e6) — at larger corpus sizes pre-scale the token counts (report in
    thousands).

    Returns one row per stratum: (strata, avail_tokens, weight,
    saturated, alloc_tokens, rate_e6) where rate_e6 is the per-stratum
    downstream sampling rate in parts-per-million (pair with
    hash_sample / hash_bucket to materialize the mix).

    Scale shape: the corpus is touched by exactly ONE map-side-combined
    hash aggregate; everything after runs on the strata table (one row
    per source — metadata-sized), where the single-partition windows are
    the same bounded pattern as temperature_mix's total.
    """
    from pyspark.sql import Window

    if budget < 0:
        raise ValueError("budget must be non-negative")
    wmap = weights or {}
    for s, wv in wmap.items():
        if int(wv) < 1:
            raise ValueError(
                f"mixture weight for stratum {s!r} is {wv}; weights must "
                "be positive integers (a zero-weight stratum is expressed "
                "by filtering it out before the mix)"
            )
        if int(wv) > ratio_scale:
            raise ValueError(
                f"mixture weight for stratum {s!r} is {wv}, above "
                f"ratio_scale={ratio_scale}: the quantized-ratio sort is "
                "only tie-safe for weights <= ratio_scale (scale the whole "
                "weight vector down, or raise ratio_scale)"
            )
    counts = (
        df.where(F.col(strata).isNotNull())
        .groupBy(F.col(strata).cast("string").alias("strata"))
        # NULL token counts are 0, matching materialize_token_mix — and
        # keeping an all-NULL stratum's sum at 0 instead of NULL, which
        # would slip past the negative guard, sort NULLS-FIRST in Spark
        # vs NULLS-LAST in DuckDB, AND be handed real budget (review r10
        # pass 2, confirmed repro)
        .agg(
            F.sum(
                F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
            ).alias("avail_tokens")
        )
    )
    if wmap:
        spark = df.sparkSession
        wdf = spark.createDataFrame(
            [(str(s), int(v)) for s, v in sorted(wmap.items())],
            "strata string, weight long",
        )
        counts = counts.join(F.broadcast(wdf), "strata", "left").withColumn(
            "weight", F.coalesce(F.col("weight"), F.lit(1).cast("long"))
        )
    else:
        counts = counts.withColumn("weight", F.lit(1).cast("long"))

    avail, w = F.col("avail_tokens"), F.col("weight")
    # overflow guards, in-plan: every later cross-product is bounded by
    # max(budget, TOTAL avail) * max(total weight, ratio_scale, 1e6) —
    # the 1e6 covers rate_e6, ratio_scale covers rkey and the per-stratum
    # weight cap, wtot covers the saturation test. Division keeps the
    # guard itself overflow-free. Negative per-stratum sums fail loudly
    # (a negative avail would both mis-sort and re-inflate the pool —
    # the materialize_token_mix contract, review r10).
    limit = (1 << 62) - 1
    guard_mul = max(int(ratio_scale), 1_000_000)
    everything = Window.partitionBy()
    wtot = F.sum("weight").over(everything)
    ta = F.sum("avail_tokens").over(everything)
    guard_den = F.greatest(wtot, F.lit(guard_mul).cast("long"))
    staged = counts.withColumn(
        "avail_tokens",
        F.when(
            avail < 0,
            F.raise_error(
                F.concat(
                    F.lit(
                        "token_budget_mix: negative token sum for stratum "
                    ),
                    F.col("strata"),
                    F.lit(" ("),
                    avail.cast("string"),
                    F.lit(") — token counts must be non-negative"),
                )
            ).cast("long"),
        )
        .when(
            ta > F.lit(limit) / guard_den,
            F.raise_error(
                F.concat(
                    F.lit(
                        "token_budget_mix: total availability too large "
                        "for exact BIGINT water-filling (total="
                    ),
                    ta.cast("string"),
                    F.lit(
                        ") — pre-scale the token counts (e.g. report in "
                        "thousands)"
                    ),
                )
            ).cast("long"),
        )
        .otherwise(avail),
    )
    if budget > limit // guard_mul:
        raise ValueError(
            "token_budget_mix: budget too large for exact BIGINT "
            "water-filling — pre-scale the token counts and budget"
        )

    staged = staged.withColumn(
        "rkey",
        F.expr(
            f"(avail_tokens DIV weight) * {int(ratio_scale)}"
            f" + ((avail_tokens % weight) * {int(ratio_scale)}) DIV weight"
        ),
    )

    order = Window.orderBy("rkey", "strata")
    prev = order.rowsBetween(Window.unboundedPreceding, -1)
    everything = Window.partitionBy()
    a_prev = F.coalesce(F.sum("avail_tokens").over(prev), F.lit(0).cast("long"))
    w_prev = F.coalesce(F.sum("weight").over(prev), F.lit(0).cast("long"))
    w_rem = F.sum("weight").over(everything) - w_prev
    sat_here = (avail * w_rem) <= (F.lit(int(budget)) - a_prev) * w
    flagged = staged.withColumn("__sat_here", sat_here.cast("int"))
    cum = Window.orderBy("rkey", "strata").rowsBetween(
        Window.unboundedPreceding, 0
    )
    flagged = flagged.withColumn(
        "saturated", F.min("__sat_here").over(cum) == 1
    )

    sat = F.col("saturated")
    granted = F.sum(F.when(sat, avail).otherwise(F.lit(0))).over(everything)
    w_unsat = F.sum(F.when(sat, F.lit(0).cast("long")).otherwise(w)).over(
        everything
    )
    r_budget = F.lit(int(budget)) - granted
    solved = (
        flagged.withColumn("__r_budget", r_budget)
        .withColumn("__w_unsat", w_unsat)
        .withColumn(
            "__base",
            F.when(sat, avail).otherwise(
                F.expr("(__r_budget * weight) DIV __w_unsat")
            ),
        )
        .withColumn(
            "__rem",
            F.when(sat, F.lit(0).cast("long")).otherwise(
                F.expr("(__r_budget * weight) % __w_unsat")
            ),
        )
    )
    # largest-remainder hand-out: leftover = r_budget - sum(base) over the
    # unsaturated rows; top-`leftover` remainders (ties by name) get +1
    leftover = F.col("__r_budget") - F.sum(
        F.when(sat, F.lit(0).cast("long")).otherwise(F.col("__base"))
    ).over(everything)
    rem_rank = F.row_number().over(
        Window.orderBy(
            sat.cast("int"), F.col("__rem").desc(), F.col("strata")
        )
    )
    solved = (
        solved.withColumn("__leftover", leftover)
        .withColumn("__rem_rank", rem_rank)
        .withColumn(
            "alloc_tokens",
            # the least() clamp binds only when a sub-1/ratio_scale ratio
            # tie mis-orders the walk (docstring step 4); it makes
            # alloc <= avail unconditional at the cost of <= ~1 token of
            # budget per tied stratum
            F.when(sat, avail).otherwise(
                F.least(
                    F.col("__base")
                    + F.when(
                        F.col("__rem_rank") <= F.col("__leftover"), F.lit(1)
                    )
                    .otherwise(F.lit(0))
                    .cast("long"),
                    avail,
                )
            ),
        )
        .withColumn(
            "rate_e6",
            F.when(
                avail > 0,
                F.expr("(alloc_tokens * 1000000) DIV avail_tokens"),
            ).otherwise(F.lit(0).cast("long")),
        )
    )
    return solved.select(
        "strata",
        "avail_tokens",
        "weight",
        "saturated",
        "alloc_tokens",
        "rate_e6",
    )


def materialize_token_mix(
    df: DataFrame,
    alloc: DataFrame,
    strata: str,
    tokens_col: str,
    id_col: str = "doc_id",
    salt: str = "mix",
    out_col: str = "kept_i",
) -> DataFrame:
    """Execute a token-budget allocation: flag, per stratum, a
    deterministic hash-ordered PREFIX of documents whose token counts sum
    to at most that stratum's ``alloc_tokens`` (the companion to
    ``token_budget_mix``, which decides the allocations; this picks the
    actual documents). The kept set is a pure function of
    (id, salt, tokens, allocation) — stable under repartitioning, reruns
    and engine swaps, like everything else in this module — and greedy:
    documents are taken in md5 order until the NEXT one would overshoot,
    so a stratum undershoots its allocation by less than one document's
    tokens and never exceeds it.

    ``alloc`` is a (strata, alloc_tokens) table — normally the output of
    ``token_budget_mix``; duplicate strata rows are healed conservatively
    (MIN allocation wins). Strata missing from it — and documents with a
    NULL stratum — keep nothing (kept_i=0); NULL token counts count as 0;
    negative token counts fail the job in-plan (a negative count would
    let the cumulative sum re-enter the budget after overshooting —
    always a data bug).

    Scale shape (the reason this is NOT one window over each stratum):
    ``Window.partitionBy(strata)`` would sort every document of the
    hottest source in a single task — exactly the skew this operator's
    callers have (a head domain can be a double-digit share of a crawl).
    Instead the cumulative sum runs at two grains:

    1. per (stratum, hash-bucket) token sums — N_BUCKETS buckets per
       stratum, one map-side-combined aggregate; the running total over
       BUCKETS (a metadata-sized window) classifies each bucket as fully
       kept, fully dropped, or THE cutoff bucket (at most one per
       stratum);
    2. only the cutoff bucket's documents — ~1/N_BUCKETS of the stratum —
       are ordered per document (md5, then id) against the bucket's
       remaining budget.

    The corpus is shuffled ONCE, on (stratum, bucket) — a key the hash
    spreads N_BUCKETS-ways regardless of how hot the stratum is — and the
    per-document window rides that same partitioning.
    """
    h = hash64(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    toks_raw = F.col(tokens_col).cast("long")
    toks = F.when(
        toks_raw < 0,
        F.raise_error(
            F.concat(
                F.lit("materialize_token_mix: negative token count "),
                toks_raw.cast("string"),
                F.lit(" (id="),
                F.col(id_col).cast("string"),
                F.lit(")"),
            )
        ).cast("long"),
    ).otherwise(F.coalesce(toks_raw, F.lit(0).cast("long")))

    staged = (
        df.withColumn("__tm_h", h)
        .withColumn("__tm_b", (F.col("__tm_h") % N_BUCKETS).cast("int"))
        .withColumn("__tm_t", toks)
        .withColumn("__tm_s", F.col(strata).cast("string"))
    )

    per_bucket = staged.groupBy("__tm_s", "__tm_b").agg(
        F.sum("__tm_t").alias("__bt")
    )
    from pyspark.sql import Window

    before = (
        Window.partitionBy("__tm_s")
        .orderBy("__tm_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_bucket.withColumn(
        "__cum_before",
        F.coalesce(F.sum("__bt").over(before), F.lit(0).cast("long")),
    )
    # duplicate-row guard (the bloom_might_contain hazard class): an alloc
    # table accidentally unioned twice would multiply bucket rows through
    # the join and duplicate corpus rows downstream. Re-aggregating the
    # strata-sized table is cheap; MIN is the conservative heal (conflicting
    # duplicates can only under-spend, never blow the budget).
    al = (
        alloc.select(
            F.col("strata").cast("string").alias("__tm_s"),
            F.col("alloc_tokens").cast("long").alias("__alloc"),
        )
        .groupBy("__tm_s")
        .agg(F.min("__alloc").alias("__alloc"))
    )
    buckets = (
        cum.join(F.broadcast(al), "__tm_s", "left")
        .withColumn("__alloc", F.coalesce(F.col("__alloc"), F.lit(0).cast("long")))
        .select(
            "__tm_s",
            "__tm_b",
            (F.col("__cum_before") + F.col("__bt") <= F.col("__alloc")).alias(
                "__full"
            ),
            # remaining budget entering this bucket; meaningful only for
            # the (at most one) cutoff bucket, clamped at 0 for dropped ones
            F.greatest(
                F.col("__alloc") - F.col("__cum_before"),
                F.lit(0).cast("long"),
            ).alias("__remaining"),
        )
    )

    joined = staged.join(buckets, ["__tm_s", "__tm_b"], "left")
    wdoc = (
        Window.partitionBy("__tm_s", "__tm_b")
        .orderBy("__tm_h", F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    doc_cum = F.sum("__tm_t").over(wdoc)
    kept = F.when(F.col("__full"), F.lit(1)).otherwise(
        F.when(doc_cum <= F.col("__remaining"), F.lit(1)).otherwise(F.lit(0))
    )
    out_cols = df.columns
    return joined.withColumn(out_col, kept.cast("long")).select(
        *out_cols, out_col
    )
