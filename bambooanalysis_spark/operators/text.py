"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, codegen-friendly, shuffle-free per
row) — the patterns a 100 TB document pipeline needs: tokenization, quality
scoring, language-ID heuristics, fingerprinting, shingling, and a 62-bit
md5-derived hash used by the dedup family.

Determinism contract: every function here is a deterministic function of its
input text using only engine-portable primitives (split on a literal,
regexp_replace with simple character classes, md5), so DuckDB oracles can
replicate results exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small english stopword set used by quality scoring (public, standard list
# prefix) — deliberately tiny so oracle SQL can inline it
STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "on", "for"]


def tokens(text: Column) -> Column:
    """Whitespace tokens (single-space split, empties dropped)."""
    return F.filter(F.split(text, " "), lambda t: F.length(t) > 0)


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def punct_count(text: Column) -> Column:
    """Number of ASCII punctuation characters . , ! ? ; :"""
    return (F.length(text) - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))).cast("long")


def stopword_count(text: Column) -> Column:
    arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(arr, t))).cast("long")


def avg_token_len_e4(text: Column) -> Column:
    """Mean token length in 1e-4 fixed-point (BIGINT-safe for oracles).

    floor() before every integer cast: Spark's double->long cast truncates
    while DuckDB's rounds, so the explicit floor is what keeps engines
    agreeing.
    """
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    n = F.size(toks)
    return F.when(n > 0, F.floor(total * 10000 / n).cast("long")).otherwise(
        F.lit(0).cast("long")
    )


def quality_score_e4(text: Column) -> Column:
    """Heuristic document quality in [0, 10000] fixed-point:
    rewards moderate length and low punctuation/stopword density.

    score = clamp(len/500, 0, 1) * (1 - punct_ratio) * (1 - stop_ratio),
    each term floored to 1e-4 fixed-point (see avg_token_len_e4 on floor).
    """
    n_char = char_count(text)
    n_tok = token_count(text)
    len_term = F.floor(F.least(n_char * 10000 / 500, F.lit(10000.0))).cast("long")
    punct_term = F.when(
        n_char > 0, F.floor(10000 - punct_count(text) * 10000 / n_char)
    ).otherwise(F.lit(0)).cast("long")
    stop_term = F.when(
        n_tok > 0, F.floor(10000 - stopword_count(text) * 10000 / n_tok)
    ).otherwise(F.lit(0)).cast("long")
    return F.floor(len_term * punct_term / 10000 * stop_term / 10000).cast("long")


# Gopher-style corpus-filter thresholds (Rae et al. 2021, appendix A1
# subset, adapted to the signals above; 1e-4 fixed-point for fractions so
# the rule evaluation is integer-exact across engines)
GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_AVG_TOK_LEN_E4 = 30_000  # mean word length >= 3 chars
GOPHER_MAX_AVG_TOK_LEN_E4 = 100_000  # mean word length <= 10 chars
GOPHER_MIN_STOPWORDS = 2
GOPHER_MAX_TOP2_FRAC_E4 = 2_000  # top 2-gram covers <= 20% of chars
GOPHER_MAX_DUP5_FRAC_E4 = 1_500  # <= 15% of chars in duplicated 5-grams


def quality_flags(text: Column, r2: Column, r5: Column) -> dict[str, Column]:
    """Per-rule Gopher keep/drop booleans plus the combined ``keep``.

    ``r2``/``r5`` are staged ``run_stats`` structs over the sorted 2-gram /
    5-gram arrays — the caller stages them (HOF lambdas get no CSE, so
    passing precomputed structs avoids recomputing each gram pass per rule).
    All rules are per-row integer comparisons: one scan, zero shuffle.
    """
    nt = token_count(text)
    flags = {
        "keep_len": (nt >= GOPHER_MIN_TOKENS) & (nt <= GOPHER_MAX_TOKENS),
        "keep_avg_len": (avg_token_len_e4(text) >= GOPHER_MIN_AVG_TOK_LEN_E4)
        & (avg_token_len_e4(text) <= GOPHER_MAX_AVG_TOK_LEN_E4),
        "keep_stop": stopword_count(text) >= GOPHER_MIN_STOPWORDS,
        "keep_rep2": top_ngram_char_frac_e4(r2, text) <= GOPHER_MAX_TOP2_FRAC_E4,
        "keep_rep5": dup_ngram_char_frac_e4(r5, text) <= GOPHER_MAX_DUP5_FRAC_E4,
    }
    keep = F.lit(True)
    for c in flags.values():
        keep = keep & c
    flags["keep"] = keep
    return flags


# Marker words per language for the n-gram/marker language-ID heuristic.
# (The driver's synthetic documents share one vocabulary, so this is
# exercised as a deterministic scoring function, not a classifier claim.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "value", "fast"],
    "de": ["der", "und", "nicht", "das", "ist", "ein"],
    "es": ["el", "la", "de", "que", "los", "una"],
    "fr": ["le", "la", "les", "des", "une", "est"],
}


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")
    return out


def lang_id(text: Column) -> Column:
    """argmax over marker-hit counts; deterministic tie-break by language
    code order en < de < es < fr (first registered wins ties)."""
    scores = lang_scores(text)
    langs = list(LANG_MARKERS)
    best_lang = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        is_better = scores[lang] > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return F.when(best_score > 0, best_lang).otherwise(F.lit("und"))


def normalize(text: Column) -> Column:
    """lowercase + strip everything outside [a-z0-9 ] — the canonical form
    used by fingerprinting and exact dedup."""
    return F.regexp_replace(F.lower(text), r"[^a-z0-9 ]", "")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 hex of the normalized text. md5 is
    standardized, so any engine reproduces it byte-for-byte."""
    return F.md5(normalize(text))


def hash64(s: Column) -> Column:
    """62-bit positive integer hash: first 15 hex chars of md5, parsed
    base-16. Portable: DuckDB's ('0x' || substr(md5(x),1,15))::BIGINT
    yields the identical value."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def shingles_from_tokens(toks: Column, k: int) -> Column:
    """Word k-gram shingles (space-joined) over a precomputed token array —
    use this form when several shingle widths share one staged token column
    (HOF lambdas get no CSE, so recomputing tokens() per width is k× work)."""
    n = F.size(toks)
    # guard: sequence(1, 0) would produce a DESCENDING [1, 0] in Spark, so
    # short texts get an explicit empty shingle list
    empty = F.array().cast("array<string>")
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(toks, (i + j).cast("int")) for j in range(k)]
        ),
    )
    return F.when(n >= k, grams).otherwise(empty)


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-gram shingles (space-joined) over whitespace tokens."""
    return shingles_from_tokens(tokens(text), k)


def run_stats(sorted_arr: Column) -> Column:
    """Repetition statistics over a SORTED string array in ONE aggregate
    pass: struct(top string, top_count long, dup_chars long) where `top` is
    the most frequent element (ties -> lexicographically smallest, which is
    the first max run in sorted order), `top_count` its multiplicity, and
    `dup_chars` = sum over elements occurring >1 times of count*length —
    the "characters inside duplicated grams" mass of the Gopher repetition
    rules. Empty array -> (NULL, 0, 0).

    Run-length trick: on a sorted array equal elements are adjacent, so a
    5-field accumulator (prev, run, best, arg, dup) computes argmax-by-count
    and the duplicate mass without any map-building or a second pass.
    """
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(None).cast("string").alias("arg"),
        F.lit(0).cast("long").alias("dup"),
    )

    def step(acc: Column, x: Column) -> Column:
        run2 = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        # a run reaching 2 retro-credits the first occurrence (2*len); each
        # further repeat adds len -> total contribution = count*len
        dup2 = acc["dup"] + F.when(run2 == 2, F.length(x) * 2).otherwise(
            F.when(run2 > 2, F.length(x)).otherwise(F.lit(0))
        ).cast("long")
        better = run2 > acc["best"]
        return F.struct(
            x.alias("prev"),
            run2.alias("run"),
            F.when(better, run2).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["arg"]).alias("arg"),
            dup2.alias("dup"),
        )

    return F.aggregate(
        sorted_arr,
        init,
        step,
        lambda acc: F.struct(
            acc["arg"].alias("top"),
            acc["best"].alias("top_count"),
            acc["dup"].alias("dup_chars"),
        ),
    )


def _frac_e4(chars: Column, total_chars: Column) -> Column:
    """least(10000, floor(chars*10000/total)) — capped because overlapping
    n-grams can carry more characters than the document holds. floor-then-
    cast keeps Spark/DuckDB integer semantics identical (see avg_token_len_e4)."""
    return F.when(
        total_chars > 0,
        F.least(F.lit(10000).cast("long"), F.floor(chars * 10000 / total_chars).cast("long")),
    ).otherwise(F.lit(0).cast("long"))


def top_ngram_char_frac_e4(stats: Column, text: Column) -> Column:
    """Gopher rule for small n (2-4): fraction of characters covered by the
    single most frequent word n-gram, from a run_stats struct."""
    covered = F.when(
        stats["top_count"] > 1, stats["top_count"] * F.length(stats["top"])
    ).otherwise(F.lit(0).cast("long"))
    return _frac_e4(covered, F.length(text))


def dup_ngram_char_frac_e4(stats: Column, text: Column) -> Column:
    """Gopher rule for large n (5-10): fraction of characters inside word
    n-grams that occur more than once, from a run_stats struct."""
    return _frac_e4(stats["dup_chars"], F.length(text))


def lines(text: Column) -> Column:
    """Non-empty lines."""
    return F.filter(F.split(text, "\n"), lambda l: F.length(l) > 0)


def dup_line_char_frac_e4(text: Column) -> Column:
    """Fraction of characters sitting in duplicated lines (C4/Gopher line
    dedup rule), 1e-4 fixed point. Same run-length machinery as the n-gram
    rules with whole lines as the grams."""
    return _frac_e4(
        run_stats(F.array_sort(lines(text)))["dup_chars"], F.length(text)
    )


# BPE-ish pre-tokenization classes: letter runs, digit runs, single
# non-alnum marks — the regex level of a byte-pair tokenizer's pre-split
# (portable subset: identical semantics in Java regex and RE2/DuckDB)
BPE_SPLIT_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def bpe_tokens(text: Column) -> Column:
    """BPE-style pre-tokenization over the lowercased text: letter runs,
    digit runs, individual punctuation marks. A deterministic proxy for
    subword token counting in data-pipeline budgeting."""
    return F.regexp_extract_all(F.lower(text), F.lit(BPE_SPLIT_PATTERN), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text)).cast("long")


def hashed_bow(
    df: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 16,
) -> "DataFrame":
    """Feature-hashing (hashing-trick) bag-of-words: a deterministic signed
    token-count vector per document — the model-free text->vector bridge
    (Weinberger et al. 2009, public) that feeds the embedding-side
    operators (cosine near-dup, ANN, k-means) from raw text.

    bucket(token) = hash64(token) % dim; sign(token) = +1 if bit 1 of
    hash64(token) set else -1 (independent of the bucket bits);
    vec[j] = sum of sign over token OCCURRENCES hashing to bucket j;
    nnz = number of distinct buckets touched by any token.

    Plan shape: pure per-row HOF aggregates over a ONCE-staged
    occurrence-hash array (the minhash-signature pattern) — ZERO shuffle,
    embarrassingly parallel, dim integers per document out. Per-row work
    is O(dim x tokens); for featurizer-sized dim that beats the
    explode+groupBy alternative, which pays two exchanges and a join back
    for O(tokens) work. Zero-shuffle pinned by
    tests/test_plan_shapes.py::test_new_operator_plan_shapes.

    Returns (id, fvec array<long>, nnz long).
    """
    from .dedup import _barrier  # local import: dedup imports this module

    staged = _barrier(
        df.select(
            F.col(id_col).alias("__id"),
            F.transform(tokens(F.col(text_col)), hash64).alias("__hs"),
        )
    )
    sign = lambda h: (  # noqa: E731
        F.when(h.bitwiseAND(F.lit(2)) != 0, F.lit(1)).otherwise(F.lit(-1))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.aggregate(
            F.col("__hs"),
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(h % dim == j, sign(h)).otherwise(0),
        ),
    )
    nnz = F.size(F.array_distinct(F.transform(F.col("__hs"), lambda h: h % dim)))
    return staged.select(
        F.col("__id").alias(id_col),
        dense.alias("fvec"),
        nnz.cast("long").alias("nnz"),
    )


def strip_html(text: Column) -> Column:
    """Crawl-extraction step: drop <script>/<style> blocks (dotall,
    non-greedy), strip remaining tags, decode the common entities,
    collapse whitespace. Pure Column regexps (Java regex on the Spark
    side; every pattern avoids backreferences so the RE2-based DuckDB
    oracle evaluates them identically — including the whitespace class,
    spelled explicitly as [ \\t\\n\\r\\f] because Java \\s includes
    \\x0B vertical tab while RE2 \\s does not)."""
    t = F.regexp_replace(text, r"(?s)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?s)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"<[^>]*>", " ")
    for ent, rep in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    ):
        t = F.regexp_replace(t, ent, rep)
    return F.trim(F.regexp_replace(t, r"[ \t\n\r\f]+", " "))


# --- HTML main-content extraction (boilerplate removal) ---------------------
# Tag-stripping (strip_html above) keeps navigation chrome, footers and
# cookie banners in the text — the dominant noise source when curating
# crawl HTML. The public-literature fix is shallow block features: split
# the page at block-level tags and keep blocks by text length and LINK
# DENSITY (anchor-text chars / text chars) — the two features that carry
# almost all of the signal in Kohlschuetter et al., "Boilerplate
# Detection Using Shallow Text Features" (WSDM 2010, boilerpipe) and in
# jusText (Pomikalek 2011). Navigation and footer blocks are short and
# nearly-all-anchor; body prose is long and mostly un-linked.
#
# Everything below is pure Column algebra over one split + HOF chain —
# no shuffle, no UDF — and every regexp avoids backreferences and Java-
# only classes so the RE2-based DuckDB oracle reads them identically.
# Anchors that themselves span a block tag are split with the block
# (block tags terminate anchor runs here, as in jusText's paragraph
# segmentation).

_BLOCK_TAG_RX = (
    r"(?i)</?(?:p|div|section|article|main|aside|header|footer|nav|"
    r"h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|blockquote|"
    # the attribute tail must START with space or '/' and the closing
    # '>' is required: with a bare [ />] class, '<li>' would satisfy the
    # class with its own '>' and then [^>]* swallows the NEXT tag
    r"pre|br|hr|form|figure|figcaption|center)(?:[ \t\n\r\f/][^>]*)?>"
)


def _drop_invisible(html: Column) -> Column:
    """Comments and script/style/noscript payloads contribute no
    rendered text; removed before block segmentation so their contents
    can't leak into a block's length."""
    t = F.regexp_replace(html, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script[^>]*>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style[^>]*>", " ")
    t = F.regexp_replace(t, r"(?is)<noscript[^>]*>.*?</noscript[^>]*>", " ")
    return t


def _inline_text(fragment: Column) -> Column:
    """Visible text of an HTML fragment: strip remaining (inline) tags,
    decode the common entities, collapse whitespace."""
    t = F.regexp_replace(fragment, r"<[^>]*>", " ")
    for ent, rep in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    ):
        t = F.regexp_replace(t, ent, rep)
    return F.trim(F.regexp_replace(t, r"[ \t\n\r\f]+", " "))


def html_blocks(html: Column) -> Column:
    """array<struct<text, text_chars, anchor_chars, link_density_e4>> —
    the page split at block-level tags, one shallow-feature row per
    block. link_density_e4 is anchor-text chars / text chars in the
    repo's e4 fixed point (integer, oracle-exact); empty blocks carry
    density 0."""
    blocks = F.split(_drop_invisible(html), _BLOCK_TAG_RX)

    def _feat(b: Column) -> Column:
        text = _inline_text(b)
        anchor = F.aggregate(
            F.transform(
                F.regexp_extract_all(
                    b,
                    # lit: a bare str here is read as a column NAME
                    F.lit(r"(?is)<a(?:[ \t\n\r\f][^>]*)?>(.*?)</a[^>]*>"),
                    F.lit(1),
                ),
                lambda a: F.length(_inline_text(a)),
            ),
            F.lit(0),
            lambda acc, n: acc + n,
        )
        tc = F.length(text)
        return F.struct(
            text.alias("text"),
            tc.alias("text_chars"),
            anchor.alias("anchor_chars"),
            F.when(tc > 0, (anchor * 10000) / tc)
            .otherwise(0)
            .cast("int")
            .alias("link_density_e4"),
        )

    return F.transform(blocks, _feat)


def extract_main_text(
    html: Column,
    min_chars: int = 25,
    max_link_density_e4: int = 3333,
) -> Column:
    """Main-content text of an HTML page: keep blocks at least
    ``min_chars`` long whose link density is at most
    ``max_link_density_e4`` (defaults: jusText's length-low boundary
    and boilerpipe's 1/3 link-density cap), joined by newline. Boilerplate — nav bars,
    footers, cookie banners, tag clouds — is short or nearly-all-anchor
    and drops out; anchor TEXT inside kept prose survives inline.
    Returns the empty string for pages with no qualifying block."""
    kept = F.filter(
        html_blocks(html),
        lambda b: (b.text_chars >= min_chars)
        & (b.link_density_e4 <= max_link_density_e4),
    )
    return F.array_join(F.transform(kept, lambda b: b.text), "\n")
