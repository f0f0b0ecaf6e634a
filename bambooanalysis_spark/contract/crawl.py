"""Crawl-to-shards end-to-end contract query (VERDICT r10 #1).

One callable runs the full raw-crawl curation chain the round-10 modules
document in examples/training_pipeline.md — WET parse (sources/warc.py)
-> RFC 9309 robots exclusion (operators/robots.py) -> UT1-style host
blocklist (operators/urlops.py) -> length quality gate -> MinHash-LSH
near-dup clustering + quality-aware keep-best (operators/dedup.py) ->
token-budget water-fill + materialization (operators/sampling.py) ->
deterministic training-shard export + read-back (sources/layout.py) —
and returns the per-stage (n_docs, n_tokens) funnel manifest, every row
of which the DuckDB oracle reproduces bit-for-bit from the documents
table alone.

Fixture: the WET segments are SYNTHESIZED deterministically FROM the
documents parquet (one conversion record per document; url =
https://crawl-{a..d}.example/{source}/{doc_id}, payload = the document's
text), so the oracle needs no filesystem access — stage 0's counts
equaling the documents table IS the WARC roundtrip check. Synthesis runs
distributed (one applyInPandas group per segment file, bytes fixed by
gzip mtime=0/level 9) and is memoized per sf_dir: bench warm runs time
the PIPELINE, not fixture authoring. This is the one place the driver
touches per-doc data (the 16-row file manifest it collects is bounded
metadata).

Scale shape (the 100 TB story, stage by stage): the WARC scan's parallel
unit is the segment file (member-gzip is not splittable) and its
mapInPandas parser is the ONE documented Python stage on the corpus
path; robots/blocklist rules ride broadcast probes, the corpus never
shuffles for either; the quality gate is a map; LSH dedup shuffles on
band keys and star-capped cluster ids only; keep-best is one window over
bounded clusters; the water-fill touches the corpus with one
map-side-combined aggregate; materialization shuffles once on
(source, hash-bucket); the shard export is one repartition on the shard
id. Stage statistics come from ONE localCheckpoint'd thin per-doc flag
table, so the WET parse runs once per invocation, not once per stage.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import read_table, register
from .mixsql import SRC_WEIGHTS

_AGENT = "curator"
_QMIN, _QMAX = 120, 20_000  # quality gate: chars (the token-proxy unit)
# below the deduped corpus' availability at every fixture scale (the
# sf0.01 funnel leaves ~24k chars), so saturation/water-level arithmetic
# actually decides the kept set instead of allocating everything
_BUDGET = 15_000
_SCALE = 10_000
_SALT = "crawl"
_SHARDS = 8
_SEED = 11
_N_SEGMENTS = 16

# robots bodies AS DATA: host a pins prefix matching (block the src1*
# sources via the /src1 path prefix), host b pins named-group selection
# (curator's own Allow-all group must beat the star Disallow-all), host c
# has NO robots (allow-all per RFC 9309 §2.3.1.2) but sits on the
# blocklist, host d pins longest-match precedence (Allow /src2 outranks
# Disallow /src).
_ROBOTS = [
    ("crawl-a.example", "User-agent: *\nDisallow: /src1\n"),
    (
        "crawl-b.example",
        "User-agent: curator\nAllow: /\nUser-agent: *\nDisallow: /\n",
    ),
    ("crawl-d.example", "User-agent: *\nDisallow: /src\nAllow: /src2\n"),
]
_BLOCKLIST = ["crawl-c.example"]


def _wet_record(url: str, text: str) -> bytes:
    """One ISO 28500 conversion record (the WET convention: extracted
    page text as the block, Content-Length exact byte framing)."""
    body = text.encode("utf-8")
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: " + url.encode("ascii") + b"\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"WARC-Record-ID: <urn:doc:" + url.rsplit("/", 1)[1].encode() + b">\r\n"
        b"Content-Type: text/plain\r\n"
        b"Content-Length: " + str(len(body)).encode("ascii") + b"\r\n"
        b"\r\n" + body + b"\r\n\r\n"
    )


def crawl_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic WET segment directory derived from ``sf_dir``'s
    documents table; built once (distributed, one segment per
    applyInPandas group) and reused by later invocations in any
    process — the _SUCCESS marker records the expected row total, so a
    half-written directory from a killed run rebuilds instead of
    serving short."""
    docs = read_table(spark, sf_dir, "documents")
    n = docs.count()
    # cache identity = row count + the source parquet's (size, mtime)
    # metadata (review r11): a regenerated fixture with the SAME row
    # count must rebuild, not serve stale segments — and parquet
    # metadata is free to read, unlike a content digest
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    src_id = f"{st.st_size}:{int(st.st_mtime_ns)}"
    base = os.path.join(
        tempfile.gettempdir(),
        "bamboo-wet-%s-%d"
        % (hashlib.md5(sf_dir.encode()).hexdigest()[:10], n),
    )
    marker = os.path.join(base, "_SUCCESS")
    if os.path.exists(marker):
        try:
            with open(marker) as fh:
                meta = json.load(fh)
        except (ValueError, OSError):
            # half-written marker from a killed run: rebuild (review
            # r11 — json.load would otherwise crash forever)
            meta = {}
        if meta.get("records") == n and meta.get("source") == src_id:
            return base
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)

    def write_segment(pdf):
        import pandas as pd

        g = int(pdf["g"].iloc[0])
        pdf = pdf.sort_values("doc_id")
        chunks = []
        for r in pdf.itertuples(index=False):
            host = "crawl-%s.example" % "abcd"[int(r.doc_id) % 4]
            url = f"https://{host}/{r.source}/{int(r.doc_id)}"
            # gzip member per record, bytes pinned: mtime=0, fixed level
            chunks.append(
                gzip.compress(_wet_record(url, r.text), 9, mtime=0)
            )
        path = os.path.join(base, "seg-%04d.wet.gz" % g)
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(b"".join(chunks))
        os.replace(tmp, path)
        return pd.DataFrame({"file": [path], "n": [len(pdf)]})

    manifest = (
        docs.select(
            "doc_id", "source", "text",
            (F.col("doc_id") % _N_SEGMENTS).alias("g"),
        )
        .groupBy("g")
        .applyInPandas(write_segment, "file string, n long")
        .collect()  # bounded: one row per segment file
    )
    total = sum(r["n"] for r in manifest)
    assert total == n, f"fixture wrote {total} records, expected {n}"
    with open(marker, "w") as fh:
        json.dump({"records": n, "segments": len(manifest), "source": src_id}, fh)
    return base


def crawl_stage_frames(spark: SparkSession, seg_glob: str) -> DataFrame:
    """The lazy curation-flag plan over a WET segment glob: one row per
    parsed document with (doc_id, source, host, n_tok, text) plus the
    three gate flags (allowed, blocked, quality_ok). Exposed separately
    so the plan-shape test can pin the corpus path (exactly one Arrow
    stage — the WARC parser; rule tables broadcast; no corpus
    shuffle)."""
    from ..operators.robots import robots_allowed
    from ..operators.urlops import flag_blocked_hosts
    from ..sources.warc import read_warc, wet_records

    wet = wet_records(read_warc(spark, seg_glob))
    parsed = wet.select(
        F.regexp_extract("url", r"/(\d+)$", 1).cast("long").alias("doc_id"),
        F.regexp_extract("url", r"^https://([^/]+)/", 1).alias("host"),
        F.regexp_extract("url", r"^https://[^/]+/([^/]+)/", 1).alias("source"),
        F.regexp_extract("url", r"^https://[^/]+(/.+)$", 1).alias("path"),
        F.length("text").cast("long").alias("n_tok"),
        "text",
    )
    robots = spark.createDataFrame(_ROBOTS, "host string, robots_txt string")
    bl = spark.createDataFrame([(d,) for d in _BLOCKLIST], "domain string")
    flagged = robots_allowed(parsed, robots, _AGENT)
    flagged = flag_blocked_hosts(flagged, bl, "host", "blocked")
    return flagged.withColumn(
        "quality_ok", F.col("n_tok").between(_QMIN, _QMAX)
    )


def pipeline_crawl_to_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returns the 7-row stage funnel (seq, stage, n_docs, n_tokens):
    wet_parsed -> robots_allowed -> host_allowed -> quality_kept ->
    dedup_best -> token_mix -> shards, where the shards row is counted
    BACK from the exported parquet (write integrity, not a copy of the
    mix row)."""
    from ..operators.dedup import keep_best_per_cluster, near_dup_clusters
    from ..operators.sampling import materialize_token_mix, token_budget_mix
    from ..sources.layout import export_training_shards

    seg_dir = crawl_fixture_dir(spark, sf_dir)
    # thin per-doc flag table, materialized ONCE and RELEASED on exit
    # (review r11): persist, not localCheckpoint — same single
    # materialization (the frow collect forces it), but unpersist()
    # actually frees the blocks, so repeated bench/gate invocations in
    # one session don't pin N dead corpus copies in the block manager
    flags = crawl_stage_frames(spark, seg_dir + "/*.wet.gz").persist()
    kept = flags.where(
        F.col("allowed") & ~F.col("blocked") & F.col("quality_ok")
    ).select("doc_id", "source", "n_tok", "text")

    clusters = near_dup_clusters(
        kept.select("doc_id", "text"), "doc_id", "text",
        k=16, bands=8, shingle_k=3,
    )
    best = keep_best_per_cluster(
        clusters.select("doc_id", "cluster_id").join(
            kept.select("doc_id", "source", "n_tok"), "doc_id"
        ),
        "cluster_id", "n_tok", "doc_id",
    )
    # bk is consumed by FOUR downstream jobs (its own stage aggregate,
    # the water-fill, the materializer, the shard export) — without a
    # persist each re-runs the LSH + connected-components chain above
    # (review r11: the dedup pass dominated the timed entry twice over)
    bk = best.where(F.col("kept_best_i") == 1).select(
        "doc_id", "source", "n_tok"
    ).persist()
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)
    try:
        alloc = token_budget_mix(
            bk, "source", "n_tok", budget=_BUDGET, weights=SRC_WEIGHTS,
            ratio_scale=_SCALE,
        )
        mixed = materialize_token_mix(
            bk, alloc, "source", "n_tok", "doc_id", salt=_SALT
        )
        # The dedup_best totals ride the EXPORT job as observe() metrics
        # (r12, guide §1.2 — one fewer serialized action): mixed's rows
        # are exactly bk's rows, and CollectMetrics is a predicate-
        # pushdown barrier, so the metrics see every pre-filter row while
        # the export writes the kept subset. Previously a separate
        # bk-aggregate collect job ran before the export.
        from pyspark.sql import Observation

        bobs = Observation()
        mixed = mixed.observe(
            bobs,
            F.count(F.lit(1)).alias("nb"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).alias("tb"),
        )
        final = (
            mixed.where(F.col("kept_i") == 1)
            .join(kept.select("doc_id", "text"), "doc_id")
            .select("doc_id", "source", "n_tok", "text")
        )

        def _nd(cond):
            return [
                F.count(F.when(cond, True)),
                F.coalesce(F.sum(F.when(cond, F.col("n_tok"))), F.lit(0)),
            ]

        ok_host = F.col("allowed") & ~F.col("blocked")
        # r11 (guide §2.6 overlap independent jobs): the stage-funnel
        # aggregate reads only the flags persist (filled by the CC loop's
        # jobs above) — run it on a second driver thread so its job
        # back-fills executors while the main thread runs the keep-best
        # aggregate and the shard export. Byte-identical results; FIFO
        # scheduling does the back-fill.
        def _frow():
            return flags.agg(
                *_nd(F.lit(True)),
                *_nd(F.col("allowed")),
                *_nd(ok_host),
                *_nd(ok_host & F.col("quality_ok")),
            ).collect()[0]

        frow_fut = pool.submit(_frow)
        shard_dir = tempfile.mkdtemp(prefix="bamboo-shards-")
        try:
            manifest = export_training_shards(
                final, shard_dir, key_col="doc_id", shards=_SHARDS,
                seed=_SEED,
            )
            assert os.path.exists(os.path.join(shard_dir, "_manifest.json"))
            back = (
                spark.read.parquet(shard_dir)
                .agg(
                    F.count(F.lit(1)),
                    F.coalesce(F.sum("n_tok"), F.lit(0)),
                )
                .collect()[0]
            )
            assert manifest["total_records"] == back[0], (
                "shard manifest/read-back mismatch: "
                f"{manifest['total_records']} vs {back[0]}"
            )
        except BaseException:
            # surface a finished background-funnel failure first (it
            # usually shares the root cause and is strictly earlier in
            # the chain), instead of dropping it on the floor while
            # pool.shutdown(wait=True) blocks on it (ADVICE r11)
            if frow_fut.done() and frow_fut.exception() is not None:
                raise frow_fut.exception()
            frow_fut.cancel()
            raise
        finally:
            shutil.rmtree(shard_dir, ignore_errors=True)
        brow = bobs.get["nb"], bobs.get["tb"]
        frow = frow_fut.result()
    finally:
        pool.shutdown(wait=True)
        bk.unpersist()
        flags.unpersist()

    rows = [
        (0, "wet_parsed", int(frow[0]), int(frow[1])),
        (1, "robots_allowed", int(frow[2]), int(frow[3])),
        (2, "host_allowed", int(frow[4]), int(frow[5])),
        (3, "quality_kept", int(frow[6]), int(frow[7])),
        (4, "dedup_best", int(brow[0]), int(brow[1])),
        (5, "token_mix", int(back[0]), int(back[1])),
        (6, "shards", int(back[0]), int(back[1])),
    ]
    # token_mix is reported from the EXPORTED data on purpose: the mixed
    # aggregate and the read-back must agree (asserted above via the
    # manifest), so one number serves both rows while the oracle checks
    # them independently (its stage 5 comes from the mix CTE, stage 6 is
    # defined equal — a write that dropped or duplicated rows would break
    # the manifest assert first).
    return spark.createDataFrame(
        rows, "seq int, stage string, n_docs bigint, n_tokens bigint"
    ).orderBy("seq")


def _oracle() -> str:
    from .mixsql import (
        _SRC_WEIGHT_SQL,
        cluster_keepbest_ctes_sql,
        materialize_ctes_sql,
        tbm_ctes_sql,
    )

    return f"""
WITH RECURSIVE u AS (
    SELECT doc_id, source, text, LENGTH(text) AS n_tok,
        'crawl-' || CASE CAST(doc_id % 4 AS INT)
            WHEN 0 THEN 'a' WHEN 1 THEN 'b' WHEN 2 THEN 'c'
            ELSE 'd' END || '.example' AS host
    FROM documents
),
f AS (
    SELECT *,
        CASE WHEN host = 'crawl-a.example' THEN NOT (source LIKE 'src1%')
             WHEN host = 'crawl-d.example' THEN source LIKE 'src2%'
             ELSE TRUE END AS allowed,
        host = 'crawl-c.example' AS blocked,
        n_tok BETWEEN {_QMIN} AND {_QMAX} AS quality_ok
    FROM u
),
crawl_kept AS (
    SELECT doc_id, source, text, n_tok FROM f
    WHERE allowed AND NOT blocked AND quality_ok
),
{cluster_keepbest_ctes_sql('crawl_kept', shingle_k=3, tok_expr='n_tok')},
{tbm_ctes_sql('bk', _BUDGET, _SRC_WEIGHT_SQL, _SCALE, 'n_tok')},
{materialize_ctes_sql('bk', _SALT, 'n_tok')},
mixkept AS (SELECT doc_id, source, t AS n_tok FROM mixed WHERE kept_i = 1)
SELECT CAST(seq AS INT) AS seq, stage,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM (
              SELECT 0 AS seq, 'wet_parsed' AS stage, COUNT(*) AS n_docs,
                     COALESCE(SUM(n_tok), 0) AS n_tokens FROM f
    UNION ALL SELECT 1, 'robots_allowed', COUNT(*), COALESCE(SUM(n_tok), 0)
              FROM f WHERE allowed
    UNION ALL SELECT 2, 'host_allowed', COUNT(*), COALESCE(SUM(n_tok), 0)
              FROM f WHERE allowed AND NOT blocked
    UNION ALL SELECT 3, 'quality_kept', COUNT(*), COALESCE(SUM(n_tok), 0)
              FROM crawl_kept
    UNION ALL SELECT 4, 'dedup_best', COUNT(*), COALESCE(SUM(n_tok), 0)
              FROM bk
    UNION ALL SELECT 5, 'token_mix', COUNT(*), COALESCE(SUM(n_tok), 0)
              FROM mixkept
    UNION ALL SELECT 6, 'shards', COUNT(*), COALESCE(SUM(n_tok), 0)
              FROM mixkept
) ORDER BY seq
"""


register("pipeline_crawl_to_shards", pipeline_crawl_to_shards, _oracle())
