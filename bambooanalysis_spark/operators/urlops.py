"""URL operators for web-crawl training-data pipelines (C4/RefinedWeb
shape: normalize -> dedup by canonical URL -> cap per registered domain).

Everything is built-in Spark expressions (``parse_url`` is JVM-side and
rides whole-stage codegen; the query-param surgery is split/filter/
array_sort/array_join) — no UDFs, so the hot path stays in Tungsten at
any scale. The DuckDB oracles mirror the same string algebra, so the
canonical forms are exactly hash-checkable.

Scale notes: URL normalization is a pure map (no shuffle); URL dedup is
one hash-aggregate on the canonical key; the per-domain cap composes
with sampling.domain_cap (already rank-limit pushdown-aware). The
public-suffix handling is an explicit, documented SUBSET (the common
two-label suffixes) — a production deployment swaps in the full Mozilla
PSL as a broadcast lookup; the operator shape does not change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Common second-level public suffixes: hosts ending in one of these keep
# THREE labels as the registered domain (bbc.co.uk), everything else
# keeps two (example.com). Deliberately a subset — see module docstring.
MULTI_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "co.kr", "or.kr", "go.kr", "ac.kr",
    "co.za", "org.za", "gov.za", "ac.za",
    "com.mx", "org.mx", "gob.mx",
    "com.tr", "org.tr", "gov.tr",
    "co.nz", "org.nz", "govt.nz",
    "com.sg", "org.sg", "gov.sg",
]

# Tracking parameters stripped during normalization (prefix match for
# the utm_ family, exact match otherwise).
TRACKING_EXACT = [
    "fbclid", "gclid", "dclid", "msclkid", "mc_cid", "mc_eid",
    "igshid", "ref", "ref_src", "spm", "yclid", "_ga", "s_kwcid",
]
TRACKING_PREFIXES = ["utm_"]


def url_host(url: Column) -> Column:
    """Lowercased host (try_parse_url is case-preserving; hosts are
    case-insensitive per RFC 3986 §6.2.2.1). try_* everywhere: crawl
    data ALWAYS contains malformed URLs, and under Spark 4 ANSI the
    non-try parse_url aborts the whole job on the first one — the
    tolerant form returns NULL instead (code-review r8 finding #1;
    pinned by test_urlops_tolerates_malformed_and_hostless)."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def url_path(url: Column) -> Column:
    return F.try_parse_url(url, F.lit("PATH"))


def url_query(url: Column) -> Column:
    return F.try_parse_url(url, F.lit("QUERY"))


def _is_tracking(param: Column) -> Column:
    name = F.split(param, "=", 2)[0]
    cond = F.lit(False)
    for p in TRACKING_PREFIXES:
        cond = cond | name.startswith(p)
    return cond | name.isin(TRACKING_EXACT)


def canonical_query(url: Column) -> Column:
    """Query string with tracking params dropped, remaining params
    sorted bytewise (param order is almost never semantic; sorting makes
    ?a=1&b=2 and ?b=2&a=1 collide). NULL/empty query -> NULL."""
    q = url_query(url)
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "") & ~_is_tracking(p),
        )
    )
    joined = F.array_join(kept, "&")
    return F.when(
        q.isNotNull() & (F.size(kept) > 0), joined
    ).otherwise(F.lit(None).cast("string"))


def canonical_host(url: Column) -> Column:
    """Lowercased host with a leading ``www.`` stripped."""
    return F.regexp_replace(url_host(url), r"^www\.", "")


def normalize_url(url: Column) -> Column:
    """The canonical dedup key: https-vs-http collapsed to the scheme-less
    form, host lowercased and de-www-ed, ports and fragments dropped
    (parse_url's HOST excludes ANY port and its PATH/QUERY exclude the
    fragment — note this conflates non-default ports with the default,
    a deliberate dedup-key coarsening pinned by
    tests/test_urlops.py::test_normalize_url_drops_all_ports), a
    trailing ``/`` on a bare path removed, tracking params stripped and
    the rest sorted. Two fetches of the same logical page normalize to
    identical strings."""
    host = canonical_host(url)
    path = F.coalesce(url_path(url), F.lit(""))
    path = F.when(path == "/", "").otherwise(path)
    q = canonical_query(url)
    return F.concat(
        host,
        path,
        F.when(q.isNotNull(), F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def registered_domain(host: Column) -> Column:
    """eTLD+1 against the embedded suffix subset: three labels when the
    host ends in a listed two-label suffix, else two."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return (
        # NULL/empty host (malformed or hostless URL) -> NULL, explicitly:
        # concat_ws swallows NULL labels into '' and size(NULL) is NULL,
        # so without this guard every bad URL lands in one '' domain
        F.when(host.isNull() | (host == ""), F.lit(None).cast("string"))
        .when(n <= 2, host)
        .when(last2.isin(MULTI_SUFFIXES), last3)
        .otherwise(last2)
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per canonical URL (lowest id wins — deterministic):
    the C4-style exact URL dedup, one hash-aggregate on the canonical
    key. Output: (canonical_url, kept id, n_dups).

    Rows whose URL is malformed or hostless normalize to NULL and are
    EXCLUDED — grouping them would silently collapse every bad-URL
    document into one NULL bucket and discard all but one (code-review
    r8 finding #2). Callers wanting those rows route them separately on
    ``normalize_url(...).isNull()``."""
    return (
        df.select(
            normalize_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col),
        )
        .where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def domain_stats(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Documents per registered domain — the input to crawl-mix curation
    and the per-domain cap. One map + one hash-aggregate. Malformed/
    hostless URLs (NULL host) are excluded, same contract as url_dedup."""
    return (
        df.select(
            registered_domain(canonical_host(F.col(url_col))).alias(
                "registered_domain"
            ),
            F.col(id_col),
        )
        .where(F.col("registered_domain").isNotNull())
        .groupBy("registered_domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("first_id"),
        )
    )
