"""URL operators (operators/urlops.py): normalization edge cases the
synthetic contract fixture doesn't reach, registered-domain suffix
handling, and plan shape (no Python, no shuffle in the map stage)."""

import pytest
from pyspark.sql import functions as F

from bambooanalysis_spark.operators import urlops as U


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(U.normalize_url(F.col("url"))).collect()]


def test_normalize_url_collapses_variants(spark):
    variants = [
        "https://www.Example.com/a/b?utm_source=x&id=3&z=1",
        "http://EXAMPLE.COM/a/b?z=1&id=3",
        "https://example.com/a/b?id=3&utm_campaign=spring&z=1",
        "https://example.com/a/b?fbclid=abc123&z=1&id=3",
    ]
    out = set(_norm(spark, variants))
    assert out == {"example.com/a/b?id=3&z=1"}


def test_normalize_url_edge_cases(spark):
    got = _norm(
        spark,
        [
            "https://example.com/",                # bare path drops
            "https://example.com/x/",              # trailing slash on a real path KEPT
            "http://example.com/p?utm_source=o",   # tracking-only query drops
            "https://example.com/p?",              # empty query drops
            "https://sub.www-like.example.com/p",  # only a LEADING www. strips
        ],
    )
    assert got == [
        "example.com",
        "example.com/x/",
        "example.com/p",
        "example.com/p",
        "sub.www-like.example.com/p",
    ]


def test_registered_domain_suffixes(spark):
    hosts = [
        ("example.com", "example.com"),
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("a.b.c.example.com.au", "example.com.au"),
        ("deep.cdn.static.site.org", "site.org"),
        ("localhost", "localhost"),
        ("abc.xyz", "abc.xyz"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in hosts], "host string")
    got = [r[0] for r in df.select(U.registered_domain(F.col("host"))).collect()]
    assert got == [want for _, want in hosts]


def test_url_dedup_keeps_min_id_and_counts(spark):
    rows = [
        (1, "https://www.a.com/p?id=1&utm_source=x"),
        (2, "http://A.COM/p?id=1"),
        (3, "https://a.com/p?id=2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {
        r["canonical_url"]: (r["doc_id"], r["n_dups"])
        for r in U.url_dedup(df).collect()
    }
    assert out == {"a.com/p?id=1": (1, 2), "a.com/p?id=2": (3, 1)}


def test_urlops_plan_has_no_python_and_map_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "https://x.com/p?a=1")], "doc_id long, url string")
    mapped = df.select(U.normalize_url(F.col("url")))
    plan = mapped._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan
    agg_plan = (
        U.url_dedup(df)._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in agg_plan


def test_normalize_url_drops_all_ports(spark):
    """parse_url's HOST excludes any port, so canonical keys conflate
    default AND non-default ports — documented dedup-key coarsening."""
    got = _norm(
        spark,
        [
            "https://example.com:443/p",
            "http://example.com:80/p",
            "https://example.com:8443/p",
            "https://example.com/p",
        ],
    )
    assert set(got) == {"example.com/p"}


def test_urlops_tolerates_malformed_and_hostless(spark):
    """Code-review r8 findings #1/#2: crawl data always contains
    malformed URLs — one bad row must not abort the job (try_parse_url),
    and malformed/hostless rows must not collapse into a shared NULL
    dedup group that silently discards documents."""
    rows = [
        (1, "https://a.com/p?id=1"),
        (2, "http://a.com/p?id=1&utm_source=x"),
        (3, ":::garbage:::"),
        (4, "not a url at all"),
        (5, "/relative/only"),
        (6, "https://b.com/q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["canonical_url"]: (r["doc_id"], r["n_dups"])
           for r in U.url_dedup(df).collect()}
    # the three bad rows are excluded, NOT collapsed into one NULL group
    assert out == {"a.com/p?id=1": (1, 2), "b.com/q": (6, 1)}
    doms = {r["registered_domain"]: r["n_docs"]
            for r in U.domain_stats(df).collect()}
    assert doms == {"a.com": 2, "b.com": 1}


def test_ref_param_is_content(spark):
    """ADVICE r8: bare ?ref= often selects content (branch names,
    pagination) — it must SURVIVE normalization; ref_src (pure
    attribution) is still stripped."""
    got = _norm(
        spark,
        [
            "https://example.com/repo?ref=main",
            "https://example.com/repo?ref=dev",
            "https://example.com/p?ref_src=twsrc&id=1",
        ],
    )
    assert got == [
        "example.com/repo?ref=main",
        "example.com/repo?ref=dev",
        "example.com/p?id=1",
    ]


def test_pct_normalization_rfc3986(spark):
    """RFC 3986 §6.2.2 (VERDICT r8 #2): unreserved-character escapes
    decode, reserved-character escapes keep their (uppercased) encoding,
    malformed escapes pass through untouched."""
    got = _norm(
        spark,
        [
            "https://example.com/%7Efoo",     # ~ is unreserved -> decode
            "https://example.com/~foo",       # ...so these two collide
            "https://example.com/a%3ab",      # : reserved -> keep, upper hex
            "https://example.com/a%3Ab",
            "https://example.com/p?q=%41%2Fb",  # A decodes, / stays %2F
            "https://example.com/100%25",       # %25 = '%': reserved-ish, kept
            "https://example.com/bad%g1%",      # malformed escape: URL-level
        ],                                      # parse failure -> NULL (the
    )                                           # malformed-URL contract)
    assert got == [
        "example.com/~foo",
        "example.com/~foo",
        "example.com/a%3Ab",
        "example.com/a%3Ab",
        "example.com/p?q=A%2Fb",
        "example.com/100%25",
        None,
    ]
    # pct_normalize itself (reachable with lenient upstream parsers) must
    # pass malformed escapes through untouched, never corrupt or NULL them
    df = spark.createDataFrame([("bad%g1%",), ("a%3ab%7E",)], "s string")
    got2 = [r[0] for r in df.select(U.pct_normalize(F.col("s"))).collect()]
    assert got2 == ["bad%g1%", "a%3Ab~"]


def test_registered_domain_ip_literal(spark):
    """VERDICT r8 #3: dotted-quad hosts have no label hierarchy — the
    whole address is the 'domain', never a nonsense 2-label tail."""
    hosts = ["192.168.0.1", "10.0.0.7", "example.com", "v4.example.com"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = [r[0] for r in df.select(U.registered_domain(F.col("host"))).collect()]
    assert got == ["192.168.0.1", "10.0.0.7", "example.com", "example.com"]


def _psl_df(spark, extra=()):
    suffixes = (
        ["com", "org", "xyz", "uk", "co.uk", "org.uk", "jp", "co.jp",
         "kawasaki.jp", "city.kawasaki.jp"]
        + [f"ex{i}.zz" for i in range(200)]  # pad to a few hundred entries
        + list(extra)
    )
    return spark.createDataFrame([(s,) for s in suffixes], "suffix string")


def test_registered_domain_from_psl_table(spark):
    """Data-driven PSL variant (VERDICT r8 #6): longest listed suffix +
    one label; host == suffix -> NULL; unlisted TLD -> implicit * rule;
    IP literal kept whole."""
    hosts = [
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("a.b.site.org", "site.org"),
        ("deep.sub.host.city.kawasaki.jp", "host.city.kawasaki.jp"),
        ("co.uk", None),                    # pure suffix: no registrable domain
        ("city.kawasaki.jp", None),
        ("example.zz", "example.zz"),       # unlisted TLD: implicit * rule
        ("a.b.example.zz", "example.zz"),
        ("x.ex7.zz", "x.ex7.zz"),           # listed 2-label suffix ex7.zz
        ("192.168.0.1", "192.168.0.1"),
        ("localhost", "localhost"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in hosts], "host string")
    out = U.registered_domain_from(df, _psl_df(spark))
    got = {r["host"]: r["registered_domain"] for r in out.collect()}
    assert got == dict(hosts)


def test_registered_domain_from_is_broadcast_only(spark):
    """The corpus side must stream map-side only: every psl probe is a
    BroadcastHashJoin, zero Exchanges on the plan."""
    df = spark.createDataFrame([("a.b.co.uk",)], "host string")
    plan = (
        U.registered_domain_from(df, _psl_df(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan.replace("BroadcastExchange", "BX")
    assert "SortMergeJoin" not in plan


def test_fold_idn_hosts(spark):
    """IDN hosts fold to their punycode ACE form so münchen.de and
    xn--mnchen-3ya.de collide; ASCII hosts pass through JVM-side (NULL
    fed to the UDF branch); codec-rejected hosts -> NULL."""
    rows = [
        (1, "münchen.de"),
        (2, "xn--mnchen-3ya.de"),      # already-ACE: unchanged
        (3, "example.com"),            # ASCII passthrough
        (4, "bücher.example"),
        (5, None),
        (6, "ü" + "a" * 63 + ".de"),   # label > 63 octets: codec rejects
        (7, "a" * 64 + ".de"),         # oversize but ASCII: passthrough
    ]                                  # (not an IDN; validity is a
    df = spark.createDataFrame(rows, "doc_id long, host string")  # different concern)
    out = {r["doc_id"]: r["host"] for r in U.fold_idn_hosts(df).collect()}
    assert out[1] == "xn--mnchen-3ya.de"
    assert out[2] == "xn--mnchen-3ya.de"
    assert out[3] == "example.com"
    assert out[4] == "xn--bcher-kva.example"
    assert out[5] is None
    assert out[6] is None
    assert out[7] == "a" * 64 + ".de"
    # composes with the dedup/domain pipeline: folded hosts collide
    dom = U.registered_domain(F.col("host"))
    doms = {r[0] for r in U.fold_idn_hosts(df).where("doc_id in (1,2)")
            .select(dom).collect()}
    assert doms == {"xn--mnchen-3ya.de"}


def test_registered_domain_from_vs_python_reference(spark):
    """VERDICT r9 #4 groundwork: the Spark PSL path vs an independent
    straight-Python transcription of the publicsuffix.org algorithm
    (scripts/psl_synth.ref_registered_domain — zero shared code), on a
    600-rule synthetic list with the real list's grammar mix and 1500
    random hosts covering every rule class. Disagreement = real bug,
    not a mirrored one."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import psl_synth

    rules = psl_synth.make_psl(n_rules=600)
    # keep the classes present after sampling
    assert any(r.startswith("*.") for r in rules)
    rules += ["*.probe.taa", "!keep.probe.taa"]
    hosts = psl_synth.make_hosts(rules, 1500)
    expect = {
        (i, h): psl_synth.ref_registered_domain(h, rules)
        for i, h in enumerate(hosts)
    }
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "doc_id long, host string"
    )
    psl = spark.createDataFrame([(r,) for r in rules], "suffix string")
    got = {
        (r["doc_id"], hosts[r["doc_id"]]): r["registered_domain"]
        for r in U.registered_domain_from(df, psl).collect()
    }
    diff = {k: (got[k], expect[k]) for k in expect if got[k] != expect[k]}
    assert not diff, f"{len(diff)} disagreements, e.g. {list(diff.items())[:5]}"
    # the fixture really exercised all verdict classes
    vals = set(expect.values())
    assert None in vals and len(vals) > 50


def test_registered_domain_full_psl_plan_budget(spark):
    """VERDICT r9 #4: the full-scale PSL plan (synthetic ~9k rules,
    depth 5 — the real Mozilla list's shape) stays exactly 14 probe
    joins (5 exact + 5 exception + 4 wildcard), all broadcast, with
    zero corpus shuffles and zero Python stages. Measured cost
    (scripts/bench_psl_full.py, PERFORMANCE §51): 0.96 s at sf0.1 /
    2.22 s at sf1 — corpus-bound, so depth-grouped probe consolidation
    is documented as not worth it."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import psl_synth

    rules = psl_synth.make_psl()
    assert len(rules) > 8000
    psl = spark.createDataFrame([(r,) for r in rules], "suffix string")
    df = spark.createDataFrame([("a.b.co.sab",)], "host string")
    plan = (
        U.registered_domain_from(df, psl)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == 14
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan
    assert "Exchange" not in plan.replace("BroadcastExchange", "BX")


def test_fold_idn_uts46_vs_idna2003():
    """ADVICE r9: IDNA2003 (stdlib) and IDNA2008/UTS46 (idna package)
    diverge on transitional characters — straße.de is a DISTINCT
    registration from strasse.de on the modern wire, but IDNA2003 folds
    them together. The module-level fold helper exposes both paths."""
    idna = pytest.importorskip("idna")
    assert U._fold_host_to_ace("straße.de", idna) == "xn--strae-oqa.de"
    assert U._fold_host_to_ace("straße.de", None) == "strasse.de"
    # non-transitional chars agree across the two standards
    for mod in (idna, None):
        assert U._fold_host_to_ace("münchen.de", mod) == "xn--mnchen-3ya.de"
        assert U._fold_host_to_ace("bücher.example", mod) == (
            "xn--bcher-kva.example"
        )
        # malformed-host contract holds on both paths
        assert U._fold_host_to_ace("ü" + "a" * 63 + ".de", mod) is None
        assert U._fold_host_to_ace(None, mod) is None
        # empty labels stay empty rather than erroring
        assert U._fold_host_to_ace(".mün.de", mod) == ".xn--mn-xka.de"
        # self-review r10: non-LDH ASCII labels (_dmarc/_domainkey are
        # everywhere in real crawls) pass through VERBATIM on both
        # paths — UTS46 would reject them and null the whole host,
        # making the verdict depend on which codec is importable
        assert U._fold_host_to_ace("_dmarc.münchen.de", mod) == (
            "_dmarc.xn--mnchen-3ya.de"
        )


def test_fold_idn_spark_path_uses_uts46(spark):
    """The deployed UDF prefers UTS46 when the idna package is present
    (it is in this container): straße.de must fold to its own ACE form,
    not merge into strasse.de."""
    pytest.importorskip("idna")
    df = spark.createDataFrame(
        [(1, "straße.de"), (2, "strasse.de")], "doc_id long, host string"
    )
    out = {r["doc_id"]: r["host"] for r in U.fold_idn_hosts(df).collect()}
    assert out[1] == "xn--strae-oqa.de"
    assert out[2] == "strasse.de"
    assert out[1] != out[2]  # distinct registrations stay distinct


def test_registered_domain_from_wildcard_and_exception_rules(spark):
    """The real PSL's grammar (publicsuffix.org algorithm): wildcard
    rules make every single label under the base a suffix; exception
    rules prevail over everything and are themselves the registered
    domain. The canonical .ck example plus precedence edges."""
    psl = _psl_df(spark, extra=["*.ck", "!www.ck", "ck", "*.kobe.jp",
                                "!city.kobe.jp"])
    hosts = [
        ("www.ck", "www.ck"),             # exception: its labels ARE the domain
        ("shop.www.ck", "www.ck"),        # exception prevails at depth 2
        ("a.b.ck", "a.b.ck"),             # *.ck -> suffix b.ck, +1 label
        ("b.ck", None),                   # host IS a wildcard-made suffix
        ("ck", None),                     # host IS the listed 'ck' suffix
        ("x.y.kobe.jp", "x.y.kobe.jp"),   # *.kobe.jp
        ("city.kobe.jp", "city.kobe.jp"), # !city.kobe.jp carve-out
        ("sub.city.kobe.jp", "city.kobe.jp"),
        ("news.bbc.co.uk", "bbc.co.uk"),  # plain rules still fine
    ]
    df = spark.createDataFrame([(h,) for h, _ in hosts], "host string")
    got = {r["host"]: r["registered_domain"]
           for r in U.registered_domain_from(df, psl).collect()}
    assert got == dict(hosts)


def test_registered_domain_from_deduplicates_rule_table(spark):
    """Self-review r9: duplicate rule rows (a caller concatenating PSL
    sources) must not multiply corpus rows through the left probe joins."""
    psl = spark.createDataFrame(
        [("com",), ("com",), ("co.uk",), ("co.uk",)], "suffix string"
    )
    df = spark.createDataFrame(
        [("a.example.com",), ("b.bbc.co.uk",)], "host string"
    )
    out = U.registered_domain_from(df, psl).collect()
    assert len(out) == 2  # one row per input row, not 2x per dup rule
    assert {r["registered_domain"] for r in out} == {"example.com", "bbc.co.uk"}


def test_registered_domain_ipv6_literal(spark):
    """IPv6 literals arrive bracketed from parse_url; IPv4-mapped forms
    contain dots and must not split into nonsense labels — both paths."""
    hosts = ["[2001:db8::1]", "[::ffff:192.0.2.1]", "example.com"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = [r[0] for r in df.select(U.registered_domain(F.col("host"))).collect()]
    assert got == ["[2001:db8::1]", "[::ffff:192.0.2.1]", "example.com"]
    got2 = {r["host"]: r["registered_domain"]
            for r in U.registered_domain_from(df, _psl_df(spark)).collect()}
    assert got2["[::ffff:192.0.2.1]"] == "[::ffff:192.0.2.1]"


def test_domain_stats_with_psl_table(spark):
    """domain_stats(psl=...) routes through the full PSL grammar."""
    rows = [
        (1, "https://a.b.ck/p"),
        (2, "https://c.b.ck/q"),
        (3, "https://www.ck/r"),
        (4, "https://x.example.com/s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    psl = spark.createDataFrame(
        [("com",), ("*.ck",), ("!www.ck",)], "suffix string"
    )
    got = {r["registered_domain"]: r["n_docs"]
           for r in U.domain_stats(df, psl=psl).collect()}
    assert got == {"a.b.ck": 1, "c.b.ck": 1, "www.ck": 1, "example.com": 1}


def test_www_strip_preserves_suffix_level_hosts(spark):
    """www. strips only when a dotted remainder survives: www.example.com
    dedups with example.com, but www.com / www.ck (where www IS the
    registrable label) keep their name."""
    df = spark.createDataFrame(
        [("https://www.example.com/p",), ("https://www.com/p",),
         ("https://WWW.CK/p",)],
        "url string",
    )
    got = [r[0] for r in df.select(U.canonical_host(F.col("url"))).collect()]
    assert got == ["example.com", "www.com", "www.ck"]


def test_streaming_url_first_claim_matches_batch(spark, tmp_path):
    """Streaming exact-URL dedup must reproduce batch url_dedup's
    keep-list when ids arrive in order, with normalization collisions
    split ACROSS micro-batches (the second arrival of a canonical URL
    lands in a later batch and must vote 0)."""
    from bambooanalysis_spark.operators.urlops import url_dedup
    from bambooanalysis_spark.streaming.stateful import (
        streaming_url_first_claim,
    )

    rows = [
        (1, "https://www.a.com/p?id=1&utm_source=x"),
        (2, "http://b.com/q"),
        (3, ":::garbage:::"),
        (4, "http://A.COM/p?id=1"),          # dup of 1, later batch
        (5, "https://b.com/q?utm_ref=z"),    # dup of 2, later batch
        (6, "https://c.com/r"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    batch_keep = {r["doc_id"] for r in url_dedup(df).collect()}
    assert batch_keep == {1, 2, 6}

    src = str(tmp_path / "url_stream")
    df.where("doc_id <= 3").coalesce(1).write.parquet(src)
    df.where("doc_id > 3").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, url string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_url_first_claim(stream)
        .writeStream.format("memory")
        .queryName("url_claims")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["is_first"]
        for r in spark.sql("SELECT doc_id, is_first FROM url_claims").collect()
    }
    assert {d for d, f in got.items() if f == 1} == batch_keep
    assert got[4] == 0 and got[5] == 0
    assert 3 not in got  # malformed URL excluded, not claimed


def test_streaming_url_first_claim_matches_batch_sf01(
    spark, tmp_path, sf_bench
):
    """VERDICT r9 #6: the streaming==batch identity at corpus scale —
    the 5k sf0.1 documents with synthetic URLs planted so ~half are
    normalization-collapsing duplicates of a doc in the EARLIER
    micro-batch (casing + tracking-param variants), plus a malformed
    slice. The streaming keep-list must equal batch url_dedup's
    exactly."""
    from bambooanalysis_spark.operators.urlops import url_dedup
    from bambooanalysis_spark.streaming.stateful import (
        streaming_url_first_claim,
    )

    base = F.col("doc_id") % 2000
    url = (
        F.when(F.col("doc_id") % 97 == 0, F.lit(":::garbage:::"))
        .when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("https://www.d"), base, F.lit(".com/p?id=1")),
        )
        .otherwise(
            F.concat(
                F.lit("http://D"), base,
                F.lit(".COM/p?utm_source=x&id=1"),
            )
        )
    )
    docs = (
        spark.read.parquet(f"{sf_bench}/documents.parquet")
        .select("doc_id", url.alias("url"))
    )
    n = docs.count()
    assert n >= 5000
    batch_keep = {r["doc_id"] for r in url_dedup(docs).collect()}
    assert len(batch_keep) == 2000  # collisions really collapse

    cut = 2500  # id-ordered micro-batch boundary
    src = str(tmp_path / "url_stream_sf01")
    docs.where(F.col("doc_id") < cut).coalesce(1).write.parquet(src)
    docs.where(F.col("doc_id") >= cut).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, url string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_url_first_claim(stream)
        .writeStream.format("memory")
        .queryName("url_claims_sf01")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    stream_keep = {
        r["doc_id"]
        for r in spark.sql(
            "SELECT doc_id FROM url_claims_sf01 WHERE is_first = 1"
        ).collect()
    }
    assert stream_keep == batch_keep
    # the cross-batch claim path was really exercised: late-batch docs
    # whose canonical URL was claimed in the first batch all voted 0
    claimed_late = spark.sql(
        f"SELECT COUNT(*) AS n FROM url_claims_sf01 "
        f"WHERE is_first = 0 AND doc_id >= {cut}"
    ).collect()[0]["n"]
    assert claimed_late > 1000


# --- host blocklist (flag_blocked_hosts / filter_blocked_hosts) ----------

def _blocklist(spark):
    return spark.createDataFrame(
        [("tracker.net",), ("spam.example",), ("bad.co.uk",)],
        "domain string",
    )


def test_blocklist_label_boundary_and_subdomains(spark):
    from bambooanalysis_spark.operators.urlops import flag_blocked_hosts

    df = spark.createDataFrame(
        [
            (0, "tracker.net"),          # exact
            (1, "ads.tracker.net"),      # subdomain
            (2, "a.b.ads.tracker.net"),  # deep subdomain
            (3, "safetracker.net"),      # string-suffix trap: NOT blocked
            (4, "news.example.co.uk"),   # unlisted
            (5, "spam.example"),         # exact
            (6, "x.bad.co.uk"),          # subdomain of 3-label entry
            (7, "bad.co.uk.evil.org"),   # listed domain in the MIDDLE: not
        ],                               # a suffix -> NOT blocked
        "doc_id long, host string",
    )
    got = {
        r["doc_id"]: r["blocked"]
        for r in flag_blocked_hosts(df, _blocklist(spark)).collect()
    }
    assert got == {
        0: True, 1: True, 2: True, 3: False,
        4: False, 5: True, 6: True, 7: False,
    }


def test_blocklist_null_and_empty_hosts_flag_false(spark):
    from bambooanalysis_spark.operators.urlops import flag_blocked_hosts

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "tracker.net")], "doc_id long, host string"
    )
    got = {
        r["doc_id"]: r["blocked"]
        for r in flag_blocked_hosts(df, _blocklist(spark)).collect()
    }
    assert got == {0: False, 1: False, 2: True}


def test_blocklist_empty_list_blocks_nothing(spark):
    from bambooanalysis_spark.operators.urlops import flag_blocked_hosts

    df = spark.createDataFrame([(0, "a.b")], "doc_id long, host string")
    empty = spark.createDataFrame([], "domain string")
    assert flag_blocked_hosts(df, empty).collect()[0]["blocked"] is False


def test_blocklist_duplicate_rules_do_not_multiply_rows(spark):
    # probes are LEFT joins: the same dedup guard as
    # registered_domain_from must hold here (ADVICE r9 class)
    from bambooanalysis_spark.operators.urlops import flag_blocked_hosts

    df = spark.createDataFrame(
        [(0, "ads.tracker.net"), (1, "ok.org")], "doc_id long, host string"
    )
    dup = spark.createDataFrame(
        [("tracker.net",), ("tracker.net",)], "domain string"
    )
    rows = flag_blocked_hosts(df, dup).collect()
    assert len(rows) == 2


def test_filter_blocked_hosts_keeps_clean_side_and_schema(spark):
    from bambooanalysis_spark.operators.urlops import filter_blocked_hosts

    df = spark.createDataFrame(
        [(0, "tracker.net", "x"), (1, "ok.org", "y")],
        "doc_id long, host string, payload string",
    )
    out = filter_blocked_hosts(df, _blocklist(spark))
    assert out.columns == ["doc_id", "host", "payload"]
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_blocklist_probe_plan_is_broadcast_only(spark):
    # the corpus must never shuffle: every join the probe adds is a
    # BroadcastHashJoin (same gate shape as the bloom probe's)
    from bambooanalysis_spark.operators.urlops import flag_blocked_hosts

    df = spark.range(100).withColumn(
        "host", F.concat(F.lit("h"), F.col("id").cast("string"),
                         F.lit(".example.com"))
    )
    plan = flag_blocked_hosts(df, _blocklist(spark))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_blocklist_case_insensitive(spark):
    # DNS hostnames are case-insensitive: a mixed-case host column must
    # not leak listed hosts through (review finding)
    from bambooanalysis_spark.operators.urlops import flag_blocked_hosts

    df = spark.createDataFrame(
        [(0, "ADS.Tracker.NET"), (1, "OK.org")], "doc_id long, host string"
    )
    bl = spark.createDataFrame(
        [("tracker.net",), ("SPAM.example",)], "domain string"
    )
    got = {
        r["doc_id"]: r["blocked"]
        for r in flag_blocked_hosts(df, bl).collect()
    }
    assert got == {0: True, 1: False}


def test_blocklist_null_and_blank_rules_ignored(spark):
    # CSV-loaded lists null blank lines; they must not crash or match
    from bambooanalysis_spark.operators.urlops import flag_blocked_hosts

    df = spark.createDataFrame(
        [(0, "tracker.net"), (1, "ok.org")], "doc_id long, host string"
    )
    bl = spark.createDataFrame(
        [("tracker.net",), (None,), ("",), ("  ",)], "domain string"
    )
    got = {
        r["doc_id"]: r["blocked"]
        for r in flag_blocked_hosts(df, bl).collect()
    }
    assert got == {0: True, 1: False}

    only_null = spark.createDataFrame([(None,)], "domain string")
    got2 = flag_blocked_hosts(df, only_null).collect()
    assert all(r["blocked"] is False for r in got2)


def test_psl_null_rules_ignored(spark):
    from bambooanalysis_spark.operators.urlops import registered_domain_from

    df = spark.createDataFrame(
        [(0, "a.example.com")], "doc_id long, host string"
    )
    psl = spark.createDataFrame([("com",), (None,)], "suffix string")
    out = registered_domain_from(df, psl).collect()
    assert out[0]["registered_domain"] == "example.com"


def test_blocklist_never_collects_corpus_or_list_rows(spark):
    # scale contract: the list stays distributed (only the max-depth
    # scalar is collected) — pin by plan: corpus side map-only, list
    # side aggregated+broadcast, no SortMergeJoin anywhere
    from bambooanalysis_spark.operators.urlops import flag_blocked_hosts

    df = spark.range(50).withColumn(
        "host", F.concat(F.lit("h"), F.col("id"), F.lit(".example.com"))
    )
    bl = spark.range(1000).select(
        F.concat(F.lit("bad"), F.col("id"), F.lit(".net")).alias("domain")
    )
    plan = flag_blocked_hosts(df, bl)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --- SURT keys (CDX index convention) -------------------------------------

def test_surt_key_reverses_labels_and_canonicalizes(spark):
    from bambooanalysis_spark.operators.urlops import surt_key

    df = spark.createDataFrame(
        [
            (0, "https://WWW.Example.COM/a/b?utm_source=x&id=1"),
            (1, "http://news.example.co.uk/"),
            (2, "http://192.168.0.1/x"),
            (3, "not a url"),
            (4, "https://example.com/p%7e/q"),
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["k"]
        for r in df.select("doc_id", surt_key(F.col("url")).alias("k")).collect()
    }
    assert got[0] == "com,example)/a/b?id=1"
    assert got[1] == "uk,co,example,news)"
    assert got[2] == "192.168.0.1)/x"  # IP literal keeps octet order
    assert got[3] is None
    assert got[4] == "com,example)/p~/q"  # same pct-normalization


def test_surt_prefix_scan_clusters_domain(spark):
    # the point of SURT: lexicographic order groups a registered domain's
    # hosts together, so a sorted layout prefix-prunes per domain
    from bambooanalysis_spark.operators.urlops import surt_key

    urls = [
        "http://a.example.com/1", "http://b.example.com/2",
        "http://example.com/3", "http://aardvark.org/x",
        "http://zebra.net/y",
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    keys = [
        r["k"]
        for r in df.select(surt_key(F.col("url")).alias("k"))
        .orderBy("k")
        .collect()
    ]
    com_example = [k for k in keys if k.startswith("com,example")]
    # contiguous block in the sorted order
    first = keys.index(com_example[0])
    assert keys[first : first + len(com_example)] == com_example
    assert len(com_example) == 3
