"""RFC 9309 robots.txt exclusion — parse + URL matching, robots AS DATA.

Crawl curation starts before quality scoring: a pipeline re-processing a
crawl (or validating one) needs to know, per captured URL, whether the
Robots Exclusion Protocol allowed the fetch for a given product token.
CommonCrawl ships the robots.txt responses themselves as WARC records
(`crawl-data/*/robotstxt/`), so the natural shape is robots bodies as a
(host, robots_txt) DataFrame joined against the URL corpus — never a
driver-side parse of one file at a time.

Everything here is public-spec semantics (RFC 9309, June 2022), pure
Column algebra (no Python UDFs):

- ``parse_robots``: the line/group grammar of RFC 9309 §2.2. Groups are
  started by one or more consecutive ``user-agent`` lines and contain
  the ``allow``/``disallow`` rules that follow; a ``user-agent`` line
  after a rule line starts a NEW group (§2.2.1: "Crawlers MUST treat a
  group ... as starting with one or more user-agent lines"). Blank
  lines do NOT terminate a group (RFC 9309 dropped the original REP's
  blank-line separator), and keys the RFC places outside the group
  grammar (``sitemap``, ``crawl-delay``, anything unknown) are ignored
  without closing the group. Comments run ``#`` to end of line (§2.2).
  The scan over lines is a single ``F.aggregate`` fold per robots body
  — one pass, JVM-side, no shuffle (robots bodies are per-host and the
  RFC caps the parse obligation at 500 KiB, §2.4).

- ``robots_allowed``: group selection + longest-match precedence of
  §2.2.1/§2.2.2. The crawler's product token matches a group's
  user-agent value case-insensitively and EXACTLY (§2.2.1 — substring
  "most specific" matching is a pre-RFC Google extension, not the
  standard); when several groups name the same token their rules are
  combined (§2.2.1 "MUST be combined into one group"); with no match
  the ``*`` group applies; with no ``*`` group either, access is
  allowed (§2.2.1 "If no matching group exists, crawlers MUST obey the
  first group with a user-agent line with a '*' value ... if no group
  satisfies either condition ... crawlers MUST access the URI").
  Rule matching (§2.2.2): patterns match as a prefix of the URI path,
  ``*`` matches any octet sequence, a TRAILING ``$`` anchors the end;
  the most specific match — most octets in the pattern — wins, and on
  an allow/disallow tie of equal length "the allow SHOULD be used".
  An empty rule value matches nothing (so ``disallow:`` alone means
  allow-all). Path matching is case-SENSITIVE (§2.2.2 SHOULD). Both
  sides are matched verbatim — the RFC matches percent-encoded octets,
  so feed paths and robots through the same canonicalization
  (``urlops.pct_normalize``) when mixing sources.

Scale shape: rules tables are robots-sized, never corpus-sized — the
per-host rule arrays are built with one small groupBy on the RULES side
and broadcast onto the corpus, which streams map-side and never
shuffles (same contract as urlops.flag_blocked_hosts). The per-rule
fast path is a plain ``startswith`` (most real robots rules have no
wildcard); only rules containing ``*`` or an end anchor compile to a
regex, built from the pattern by Column algebra (escape metacharacters,
``*`` → ``.*``) so Java and RE2 read it identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_robots",
    "robots_allowed",
    "filter_robots_disallowed",
]

_EMPTY_RULES = "array<struct<agent:string,rule:string,path:string>>"


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """One row per (host, agent, rule, path) from raw robots.txt bodies.

    ``agent`` is the lowercased user-agent product token the rule
    applies to — a rule line under N stacked user-agent lines emits N
    rows (RFC 9309 §2.2.1 group grammar). ``rule`` is ``allow`` or
    ``disallow`` (lowercased); ``path`` is the pattern VERBATIM
    (case-sensitive, wildcards intact, possibly empty). Hosts whose
    body yields no rules emit no rows — ``robots_allowed`` treats an
    absent host as allow-all, which is also RFC behavior for an
    unavailable robots.txt (§2.3.1.2).

    Single JVM-side ``F.aggregate`` fold over the split lines: state is
    (agents currently accumulating, whether the last seen line was a
    user-agent line, rules emitted so far). No Python UDFs, no shuffle.
    """
    def _kv(raw: Column) -> Column:
        line = F.trim(F.regexp_replace(raw, "#.*$", ""))
        return F.struct(
            F.lower(F.trim(F.regexp_extract(line, r"^([^:]+):", 1))).alias("k"),
            F.trim(F.regexp_extract(line, r"^[^:]+:(.*)$", 1)).alias("v"),
        )

    def _step(acc: Column, kv: Column) -> Column:
        is_ua = (kv.k == "user-agent") & (kv.v != "")
        is_rule = kv.k.isin("allow", "disallow") & (F.size(acc.agents) > 0)
        agents = (
            F.when(
                is_ua & acc.open,
                F.concat(acc.agents, F.array(F.lower(kv.v))),
            )
            .when(is_ua, F.array(F.lower(kv.v)))
            .otherwise(acc.agents)
        )
        rules = F.when(
            is_rule,
            F.concat(
                acc.rules,
                F.transform(
                    acc.agents,
                    lambda a: F.struct(
                        a.alias("agent"),
                        kv.k.alias("rule"),
                        kv.v.alias("path"),
                    ),
                ),
            ),
        ).otherwise(acc.rules)
        return F.struct(
            agents.alias("agents"),
            # a rule line closes user-agent accumulation; unknown keys
            # and blank lines leave the state untouched (RFC 9309 §2.2)
            F.when(is_ua, F.lit(True))
            .when(is_rule, F.lit(False))
            .otherwise(acc.open)
            .alias("open"),
            rules.alias("rules"),
        )

    init = F.struct(
        F.array().cast("array<string>").alias("agents"),
        F.lit(False).alias("open"),
        F.array().cast(_EMPTY_RULES).alias("rules"),
    )
    folded = F.aggregate(
        F.transform(
            F.split(F.coalesce(F.col(body_col), F.lit("")), r"\r\n|\r|\n"),
            _kv,
        ),
        init,
        _step,
    )
    return (
        robots.select(F.col(host_col).alias("host"), folded.rules.alias("__r"))
        .where(F.size("__r") > 0)
        .select("host", F.explode("__r").alias("__e"))
        .select(
            "host",
            F.col("__e.agent").alias("agent"),
            F.col("__e.rule").alias("rule"),
            F.col("__e.path").alias("path"),
        )
    )


def _compiled_rules(rules: DataFrame, agent: str) -> DataFrame:
    """Per-host rule arrays for the chosen group, patterns pre-compiled.

    Group choice (RFC 9309 §2.2.1): hosts with a group naming ``agent``
    (exact, case-insensitive) use the union of those groups' rules;
    other hosts fall back to their ``*`` groups. The choice is made
    INSIDE one aggregate (two conditional collect_lists, named wins
    when non-empty) — one parse pass over the bodies and zero joins on
    the rules side; a named/star anti-join formulation would re-run the
    parse fold per branch and shuffle the rules three times.
    """
    agent_lc = agent.strip().lower()
    chosen = rules.where(F.col("agent").isin(agent_lc, "*"))

    pat = F.col("path")
    anchored = pat.endswith("$")
    core = F.when(anchored, F.expr("substring(path, 1, length(path) - 1)")).otherwise(
        pat
    )
    has_wild = core.contains("*")
    escaped = F.regexp_replace(core, r"([\\^$.|?+()\[\]{}])", r"\\$1")
    rx = F.when(
        has_wild | anchored,
        F.concat(
            F.lit("^"),
            F.regexp_replace(escaped, r"\*", ".*"),
            F.when(anchored, F.lit("$")).otherwise(F.lit("")),
        ),
    ).otherwise(F.lit(None).cast("string"))

    compiled = F.struct(
        F.length(pat).alias("plen"),
        (F.col("rule") == "allow").alias("is_allow"),
        pat.alias("path"),
        rx.alias("rx"),
    )
    # collect_list drops NULLs, so each rule lands in exactly one list
    grouped = chosen.groupBy("host").agg(
        F.collect_list(
            F.when(F.col("agent") == agent_lc, compiled)
        ).alias("__named"),
        F.collect_list(
            F.when(F.col("agent") == "*", compiled)
        ).alias("__star"),
    )
    return grouped.select(
        "host",
        F.when(F.size("__named") > 0, F.col("__named"))
        .otherwise(F.col("__star"))
        .alias("__rules"),
    )


def robots_allowed(
    df: DataFrame,
    robots: DataFrame,
    agent: str,
    host_col: str = "host",
    path_col: str = "path",
    out_col: str = "allowed",
    join_mode: str = "auto",
    broadcast_max_hosts: int = 1 << 21,
) -> DataFrame:
    """Flag each (host, path) row with RFC 9309 fetch permission.

    ``robots`` is a (host, robots_txt) DataFrame of raw bodies (or the
    output of :func:`parse_robots`, detected by its ``rule`` column).
    A host with no robots rows — or no group matching ``agent`` or
    ``*`` — is allowed (RFC 9309 §2.2.1/§2.3.1.2). NULL paths match as
    ``/``; NULL hosts are allowed (nothing to match against — callers
    routing malformed rows key on the host column itself, the same
    contract as urlops.url_dedup).

    Plan shape — ``join_mode``: in ``broadcast`` mode the per-host
    compiled rule arrays broadcast-join onto the corpus, which streams
    map-side and never shuffles; matching is a ``filter``/``array_max``
    HOF chain per row. Precedence is encoded in the struct order fed to
    ``array_max``: (pattern octets, is_allow) — longest pattern wins,
    allow wins length ties (§2.2.2). Broadcast is only correct while
    the rules map FITS on every executor: a full CommonCrawl robots
    corpus is tens of millions of hosts (multi-GB as rule arrays), past
    any broadcast ceiling — the same silent-OOM hazard the Bloom
    probe's mode switch guards (operators/membership.py). ``shuffle``
    mode joins plainly on host (the corpus shuffles ONCE — the honest
    cost at that scale, same outputs). ``auto`` counts the ROBOTS rows
    (robots-table-sized job, never the corpus) and broadcasts only
    below ``broadcast_max_hosts`` (default 2M hosts ≈ the UT1-list
    ceiling urlops.flag_blocked_hosts already rides).
    """
    if join_mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"join_mode must be auto|broadcast|shuffle, got {join_mode!r}")
    if "rule" in robots.columns and "path" in robots.columns:
        rules = robots
    else:
        rules = parse_robots(robots, host_col="host", body_col="robots_txt")
    rmap = _compiled_rules(rules, agent)
    if join_mode == "auto":
        # robots row count bounds the rules-map host count from above
        # (one body per host; parsed-rules input: rows >= hosts)
        join_mode = (
            "broadcast" if robots.count() <= broadcast_max_hosts else "shuffle"
        )

    orig = df.columns
    rmap = rmap.withColumnRenamed("host", "__rhost")
    joined = df.join(
        F.broadcast(rmap) if join_mode == "broadcast" else rmap,
        F.col(host_col) == F.col("__rhost"),
        "left",
    )
    p = F.coalesce(F.col(path_col), F.lit("/"))
    matches = F.filter(
        F.col("__rules"),
        lambda r: (r.path != "")
        & F.when(r.rx.isNotNull(), F.regexp_like(p, r.rx)).otherwise(
            p.startswith(r.path)
        ),
    )
    best = F.array_max(
        F.transform(matches, lambda r: F.struct(r.plen, r.is_allow))
    )
    allowed = (
        F.when(F.col(host_col).isNull(), F.lit(True))
        .when(F.col("__rules").isNull(), F.lit(True))
        .when(best.isNull(), F.lit(True))
        .otherwise(best.is_allow)
    )
    return joined.withColumn(out_col, allowed).select(*orig, out_col)


def filter_robots_disallowed(
    df: DataFrame,
    robots: DataFrame,
    agent: str,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Rows RFC 9309 permits for ``agent`` — the keep side of
    :func:`robots_allowed`, composable into a curation pipeline."""
    flagged = robots_allowed(df, robots, agent, host_col, path_col, "__ok")
    return flagged.where(F.col("__ok")).drop("__ok")
