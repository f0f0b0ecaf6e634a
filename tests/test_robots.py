"""RFC 9309 robots.txt operator — grammar, precedence, plan shape.

The semantic cases are transcriptions of the RFC's own normative text
and examples (sections cited per test); the plan test pins the
zero-corpus-shuffle contract shared with urlops.flag_blocked_hosts.
"""

import pytest
from pyspark.sql import functions as F

from bambooanalysis_spark.operators.robots import (
    filter_robots_disallowed,
    parse_robots,
    robots_allowed,
)


def _robots(spark, body, host="example.com"):
    return spark.createDataFrame(
        [(host, body)], "host string, robots_txt string"
    )


def _allowed(spark, body, agent, paths, host="example.com"):
    urls = spark.createDataFrame(
        [(host, p) for p in paths], "host string, path string"
    )
    rows = (
        robots_allowed(urls, _robots(spark, body, host), agent)
        .select("path", "allowed")
        .collect()
    )
    return {r["path"]: r["allowed"] for r in rows}


# ---------------------------------------------------------------- grammar


def test_parse_groups_and_stacked_agents(spark):
    """RFC 9309 §2.2.1: consecutive user-agent lines share the rules
    that follow; a user-agent line after a rule starts a new group."""
    body = (
        "User-Agent: a\n"
        "User-Agent: b\n"
        "Disallow: /x\n"
        "User-Agent: c\n"
        "Allow: /y\n"
    )
    rows = {
        (r["agent"], r["rule"], r["path"])
        for r in parse_robots(_robots(spark, body)).collect()
    }
    assert rows == {
        ("a", "disallow", "/x"),
        ("b", "disallow", "/x"),
        ("c", "allow", "/y"),
    }


def test_parse_comments_blank_lines_unknown_keys(spark):
    """§2.2: '#' comments run to end of line; blank lines do NOT end a
    group (RFC 9309 dropped the old blank-line separator); sitemap /
    crawl-delay / unknown keys are outside the group grammar and are
    ignored without closing it."""
    body = (
        "# top comment\n"
        "User-agent: bot  # trailing comment\n"
        "\n"
        "Crawl-delay: 10\n"
        "Sitemap: https://example.com/s.xml\n"
        "Disallow: /a  # comment after value\n"
        "\n"
        "Disallow: /b\n"
    )
    rows = {
        (r["agent"], r["rule"], r["path"])
        for r in parse_robots(_robots(spark, body)).collect()
    }
    assert rows == {("bot", "disallow", "/a"), ("bot", "disallow", "/b")}


def test_parse_rules_before_any_group_ignored(spark):
    body = "Disallow: /orphan\nUser-agent: bot\nDisallow: /x\n"
    rows = parse_robots(_robots(spark, body)).collect()
    assert [(r["rule"], r["path"]) for r in rows] == [("disallow", "/x")]


def test_parse_crlf_and_key_case(spark):
    body = "USER-AGENT: Bot\r\nDISALLOW: /x\r\nALLOW: /x/y\r\n"
    rows = {
        (r["agent"], r["rule"], r["path"])
        for r in parse_robots(_robots(spark, body)).collect()
    }
    assert rows == {("bot", "disallow", "/x"), ("bot", "allow", "/x/y")}


def test_parse_empty_and_null_bodies_emit_nothing(spark):
    robots = spark.createDataFrame(
        [("a.com", ""), ("b.com", None), ("c.com", "# only comments\n")],
        "host string, robots_txt string",
    )
    assert parse_robots(robots).count() == 0


# ------------------------------------------------------------- precedence


def test_longest_match_wins_and_prefix_semantics(spark):
    """§2.2.2 example: allow /example/page.html beats disallow /example/
    because it has more octets; patterns are PREFIX matches."""
    body = (
        "User-agent: *\n"
        "Allow: /example/page.html\n"
        "Disallow: /example/\n"
    )
    got = _allowed(
        spark,
        body,
        "anybot",
        ["/example/page.html", "/example/other.html", "/example/page.html?q=1"],
    )
    assert got["/example/page.html"] is True
    assert got["/example/other.html"] is False
    # prefix match: the allow pattern is a prefix of the longer path
    assert got["/example/page.html?q=1"] is True


def test_equal_length_tie_allow_wins(spark):
    """§2.2.2: equivalent allow and disallow rules -> allow SHOULD win."""
    body = "User-agent: *\nAllow: /page\nDisallow: /page\n"
    assert _allowed(spark, body, "x", ["/page", "/pagex"]) == {
        "/page": True,
        "/pagex": True,
    }


def test_wildcard_and_end_anchor(spark):
    """§2.2.3 special characters: '*' any octet sequence, trailing '$'
    anchors the end of the path."""
    body = "User-agent: *\nDisallow: /*.gif$\nDisallow: /tmp*/log\n"
    got = _allowed(
        spark,
        body,
        "x",
        ["/a.gif", "/deep/path/b.gif", "/a.gifs", "/tmp123/log", "/tmp/x"],
    )
    assert got == {
        "/a.gif": False,
        "/deep/path/b.gif": False,
        "/a.gifs": True,  # $ anchored: .gifs does not end with .gif
        "/tmp123/log": False,
        "/tmp/x": True,
    }


def test_regex_metachars_in_patterns_are_literal(spark):
    """Only '*' and trailing '$' are special (§2.2.3) — '.', '+', '(' in
    a pattern must match literally, not as regex."""
    body = "User-agent: *\nDisallow: /a.b$\nDisallow: /c+(d)*\n"
    got = _allowed(spark, body, "x", ["/a.b", "/aXb", "/c+(d)end", "/cd"])
    assert got == {
        "/a.b": False,
        "/aXb": True,  # '.' is literal, must not match X
        "/c+(d)end": False,
        "/cd": True,
    }


def test_empty_disallow_matches_nothing(spark):
    """'Disallow:' with an empty value matches no path -> allow-all."""
    body = "User-agent: *\nDisallow:\n"
    assert _allowed(spark, body, "x", ["/", "/anything"]) == {
        "/": True,
        "/anything": True,
    }


def test_path_match_case_sensitive(spark):
    """§2.2.2: path matching SHOULD be case sensitive."""
    body = "User-agent: *\nDisallow: /Secret\n"
    assert _allowed(spark, body, "x", ["/Secret/x", "/secret/x"]) == {
        "/Secret/x": False,
        "/secret/x": True,
    }


# --------------------------------------------------------- group selection


def test_agent_exact_case_insensitive_match_and_star_fallback(spark):
    """§2.2.1: product-token match is case-insensitive and EXACT — a
    token must not substring-match a longer group name; unmatched
    crawlers obey the '*' group."""
    body = (
        "User-agent: FooBot-News\n"
        "Disallow: /news\n"
        "User-agent: *\n"
        "Disallow: /star\n"
    )
    # 'foobot' is NOT 'foobot-news': falls to the * group
    got = _allowed(spark, body, "FooBot", ["/news/x", "/star/x"])
    assert got == {"/news/x": True, "/star/x": False}
    got = _allowed(spark, body, "foobot-news", ["/news/x", "/star/x"])
    assert got == {"/news/x": False, "/star/x": True}


def test_multiple_matching_groups_combine(spark):
    """§2.2.1: several groups naming the same token -> rules combined."""
    body = (
        "User-agent: bot\nDisallow: /a\n"
        "User-agent: other\nDisallow: /b\n"
        "User-agent: bot\nDisallow: /c\n"
    )
    got = _allowed(spark, body, "bot", ["/a/x", "/b/x", "/c/x"])
    assert got == {"/a/x": False, "/b/x": True, "/c/x": False}


def test_no_matching_group_and_no_star_allows_all(spark):
    body = "User-agent: otherbot\nDisallow: /\n"
    assert _allowed(spark, body, "mybot", ["/", "/x"]) == {
        "/": True,
        "/x": True,
    }


def test_missing_robots_host_and_nulls_allowed(spark):
    body = "User-agent: *\nDisallow: /\n"
    urls = spark.createDataFrame(
        [("example.com", "/x"), ("other.com", "/x"), (None, "/x"),
         ("example.com", None)],
        "host string, path string",
    )
    rows = robots_allowed(urls, _robots(spark, body), "b").collect()
    got = {(r["host"], r["path"]): r["allowed"] for r in rows}
    assert got[("example.com", "/x")] is False
    assert got[("other.com", "/x")] is True  # no robots -> allowed
    assert got[(None, "/x")] is True
    # NULL path coalesces to '/', which the disallow-/ rule catches
    assert got[("example.com", None)] is False


def test_parsed_rules_accepted_directly(spark):
    """robots_allowed takes either raw bodies or parse_robots output."""
    body = "User-agent: *\nDisallow: /x\n"
    rules = parse_robots(_robots(spark, body))
    urls = spark.createDataFrame(
        [("example.com", "/x/1"), ("example.com", "/y")],
        "host string, path string",
    )
    got = {
        r["path"]: r["allowed"]
        for r in robots_allowed(urls, rules, "b").collect()
    }
    assert got == {"/x/1": False, "/y": True}


def test_filter_keep_side(spark):
    body = "User-agent: *\nDisallow: /private\n"
    urls = spark.createDataFrame(
        [("example.com", "/private/a"), ("example.com", "/pub")],
        "host string, path string",
    )
    kept = filter_robots_disallowed(urls, _robots(spark, body), "b")
    assert [r["path"] for r in kept.collect()] == ["/pub"]
    assert kept.columns == ["host", "path"]


# -------------------------------------------------------------- plan shape


def test_probe_plan_is_broadcast_only(spark):
    """The corpus side must stream map-side: one broadcast hash join
    against the per-host rules map, no SortMergeJoin anywhere."""
    body = "User-agent: *\nDisallow: /x\nAllow: /x/y\n"
    urls = spark.range(1000).select(
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example.com")).alias("host"),
        F.concat(F.lit("/x/"), F.col("id")).alias("path"),
    )
    plan = (
        robots_allowed(urls, _robots(spark, body), "b")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 1
    # the rules side parses each robots body exactly once: the group
    # choice is one aggregate, not a named/star join re-running the fold
    assert plan.count("Scan ExistingRDD") == 1


def test_shuffle_mode_matches_broadcast(spark):
    """join_mode='shuffle' must produce identical rows (the 30M-host
    production path) and its plan must not contain a broadcast of the
    rules map on the probe join."""
    body = (
        "User-agent: bot\nDisallow: /private/\nAllow: /private/open\n"
        "User-agent: *\nDisallow: /\n"
    )
    robots = spark.createDataFrame(
        [("h%d.example" % i, body) for i in range(5)],
        "host string, robots_txt string",
    )
    urls = spark.range(200).select(
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example")).alias("host"),
        F.when(F.col("id") % 3 == 0, "/private/x")
        .when(F.col("id") % 3 == 1, "/private/open/y")
        .otherwise("/pub").alias("path"),
    )
    b = robots_allowed(urls, robots, "bot", join_mode="broadcast")
    s = robots_allowed(urls, robots, "bot", join_mode="shuffle")
    key = ["host", "path", "allowed"]
    assert sorted(map(tuple, b.select(*key).collect())) == sorted(
        map(tuple, s.select(*key).collect())
    )
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan


def test_auto_mode_gates_on_robots_rows(spark):
    body = "User-agent: *\nDisallow: /x\n"
    robots = spark.createDataFrame(
        [("a.example", body), ("b.example", body)],
        "host string, robots_txt string",
    )
    urls = spark.range(50).select(
        F.when(F.col("id") % 2 == 0, "a.example")
        .otherwise("b.example").alias("host"),
        F.concat(F.lit("/x/"), F.col("id")).alias("path"),
    )
    small = robots_allowed(urls, robots, "b", join_mode="auto",
                           broadcast_max_hosts=10)
    big = robots_allowed(urls, robots, "b", join_mode="auto",
                         broadcast_max_hosts=1)
    assert "BroadcastHashJoin" in (
        small._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" not in (
        big._jdf.queryExecution().executedPlan().toString()
    )
    with pytest.raises(ValueError):
        robots_allowed(urls, robots, "b", join_mode="nope")
