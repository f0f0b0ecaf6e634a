"""WARC/WET source vs spec-authored fixtures (ISO 28500 / WARC 1.0).

Discipline of test_root_layout_spec.py applied to the web-archive
source: the fixture bytes below are hand-assembled FROM THE PUBLIC SPEC
(ISO 28500 record grammar; CommonCrawl's member-per-record gzip layout
per annex D) — no code in bambooanalysis_spark.sources.warc ever
produced them, so a parser bug cannot be mirrored by a writer bug.

Record grammar under test (ISO 28500 §4):

    warc-file   = 1*warc-record
    warc-record = header CRLF block CRLF CRLF
    header      = version CRLF *named-field CRLF
    version     = "WARC/1.0"
    named-field = field-name ":" [SP field-value]

Content-Length counts the block octets only (§5.11); the two CRLFs
after the block are record framing, not content.  Gzip members are
authored with the stdlib gzip module (an independent reference
implementation — the reader walks members with raw zlib+unused_data).
"""

from __future__ import annotations

import gzip

import pytest

from bambooanalysis_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    wet_records,
)

# --- fixture records, bytes authored from the spec ----------------------

# Block payloads (content the Content-Length headers below count):
WARCINFO_BLOCK = b"software: spec-fixture/1.0\r\nformat: WARC File Format 1.0\r\n"
HTTP_BLOCK = (
    b"HTTP/1.1 200 OK\r\n"
    b"Content-Type: text/html\r\n"
    b"\r\n"
    b"<html><body>hello crawl</body></html>"
)
WET_TEXT = "hello crawl — extracted text\n".encode("utf-8")

# Record 1: warcinfo (ISO 28500 §6.2) — Content-Length = 59 = len above.
REC_WARCINFO = (
    b"WARC/1.0\r\n"
    b"WARC-Type: warcinfo\r\n"
    b"WARC-Date: 2026-08-16T00:00:00Z\r\n"
    b"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000001>\r\n"
    b"Content-Type: application/warc-fields\r\n"
    b"Content-Length: " + str(len(WARCINFO_BLOCK)).encode() + b"\r\n"
    b"\r\n" + WARCINFO_BLOCK + b"\r\n\r\n"
)

# Record 2: response with an HTTP payload (§6.4); exercises a header
# CONTINUATION line (folded field-value, RFC 5322 folding referenced by
# §4) on WARC-Target-URI.
REC_RESPONSE = (
    b"WARC/1.0\r\n"
    b"WARC-Type: response\r\n"
    b"WARC-Target-URI: http://example.com/a\r\n"
    b"WARC-Date: 2026-08-16T00:00:01Z\r\n"
    b"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000002>\r\n"
    b"Content-Type: application/http;\r\n"
    b" msgtype=response\r\n"
    b"Content-Length: " + str(len(HTTP_BLOCK)).encode() + b"\r\n"
    b"\r\n" + HTTP_BLOCK + b"\r\n\r\n"
)

# Record 3: conversion (§6.8) — the WET extracted-text record CommonCrawl
# ships in .wet.gz; UTF-8 content.
REC_CONVERSION = (
    b"WARC/1.0\r\n"
    b"WARC-Type: conversion\r\n"
    b"WARC-Target-URI: http://example.com/a\r\n"
    b"WARC-Date: 2026-08-16T00:00:02Z\r\n"
    b"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000003>\r\n"
    b"Content-Type: text/plain\r\n"
    b"Content-Length: " + str(len(WET_TEXT)).encode() + b"\r\n"
    b"\r\n" + WET_TEXT + b"\r\n\r\n"
)

PLAIN_FILE = REC_WARCINFO + REC_RESPONSE + REC_CONVERSION


def member_gz(rec: bytes) -> bytes:
    # mtime pinned so fixture bytes are deterministic run-to-run
    return gzip.compress(rec, mtime=0)


GZ_FILE = member_gz(REC_WARCINFO) + member_gz(REC_RESPONSE) + member_gz(
    REC_CONVERSION
)


# --- plain-file parse ----------------------------------------------------

def test_plain_parse_fields_and_offsets():
    recs = list(parse_warc_bytes(PLAIN_FILE, "fix.warc"))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "response", "conversion",
    ]
    # offsets are the byte positions of each version line
    assert recs[0]["record_offset"] == 0
    assert recs[1]["record_offset"] == len(REC_WARCINFO)
    assert recs[2]["record_offset"] == len(REC_WARCINFO) + len(REC_RESPONSE)
    r = recs[1]
    assert r["target_uri"] == "http://example.com/a"
    assert r["warc_date"] == "2026-08-16T00:00:01Z"
    assert r["record_id"].endswith("0002>")
    # continuation line folded into the field value
    assert r["content_type"] == "application/http; msgtype=response"
    assert r["content_length"] == len(HTTP_BLOCK)
    assert r["content"] == HTTP_BLOCK
    assert recs[2]["content"] == WET_TEXT


def test_gzip_member_parse_offsets_are_member_offsets():
    recs = list(parse_warc_bytes(GZ_FILE, "fix.warc.gz"))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "response", "conversion",
    ]
    m1 = len(member_gz(REC_WARCINFO))
    m2 = m1 + len(member_gz(REC_RESPONSE))
    # the offsets a CDX index would address
    assert [r["record_offset"] for r in recs] == [0, m1, m2]
    assert recs[2]["content"] == WET_TEXT


def test_multi_record_single_member_allowed():
    # spec allows one member holding many records; all report the
    # member's file offset (the only byte address that exists for them)
    one_member = member_gz(REC_WARCINFO + REC_CONVERSION)
    recs = list(parse_warc_bytes(one_member, "multi.warc.gz"))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "conversion"]
    assert [r["record_offset"] for r in recs] == [0, 0]


# --- corrupt-input contract: loud ValueError, never short data -----------

@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b[: len(REC_WARCINFO) + 40], "truncated"),
        (lambda b: b"HTTP/1.0\r\n" + b[10:], "version line"),
        (lambda b: b[:-4], "CRLFCRLF"),
    ],
)
def test_plain_corruption_raises(mutate, msg):
    with pytest.raises(ValueError, match=msg):
        list(parse_warc_bytes(mutate(PLAIN_FILE), "bad.warc"))


def test_missing_content_length_raises():
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"\r\n"
        b"x\r\n\r\n"
    )
    with pytest.raises(ValueError, match="Content-Length"):
        list(parse_warc_bytes(rec, "nolen.warc"))


def test_block_longer_than_file_raises():
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Length: 9999\r\n"
        b"\r\n"
        b"short"
    )
    with pytest.raises(ValueError, match="declares 9999"):
        list(parse_warc_bytes(rec, "short.warc"))


def test_truncated_gzip_member_raises():
    with pytest.raises(ValueError, match="gzip member"):
        list(parse_warc_bytes(GZ_FILE[:-10], "trunc.warc.gz"))


def test_garbage_after_member_raises():
    with pytest.raises(ValueError, match="magic"):
        list(parse_warc_bytes(member_gz(REC_WARCINFO) + b"JUNK", "junk.warc.gz"))


# --- distributed scan ----------------------------------------------------

def test_read_warc_distributed_and_wet_view(spark, tmp_path):
    # two .warc.gz files -> two binaryFile tasks; plus one plain .warc
    (tmp_path / "seg-00000.warc.gz").write_bytes(GZ_FILE)
    (tmp_path / "seg-00001.warc.gz").write_bytes(GZ_FILE)
    (tmp_path / "seg-00002.warc").write_bytes(PLAIN_FILE)

    df = read_warc(spark, str(tmp_path) + "/*.warc*")
    rows = df.orderBy("source_file", "record_offset").collect()
    assert len(rows) == 9
    assert {r["warc_type"] for r in rows} == {
        "warcinfo", "response", "conversion",
    }

    wet = wet_records(df)
    texts = wet.select("url", "text").distinct().collect()
    assert len(texts) == 1
    assert texts[0]["url"] == "http://example.com/a"
    assert texts[0]["text"] == WET_TEXT.decode("utf-8")


def test_read_warc_batching_bounds_rows(spark, tmp_path):
    # 10 conversion records, batch_rows=3 -> parser yields 4 Arrow
    # batches; result identical regardless of batching
    many = b"".join(member_gz(REC_CONVERSION) for _ in range(10))
    (tmp_path / "many.wet.gz").write_bytes(many)
    df = read_warc(spark, str(tmp_path / "many.wet.gz"), batch_rows=3)
    assert df.count() == 10
    assert wet_records(df).count() == 10


def test_wet_to_curation_pipeline_composes(spark, tmp_path):
    """End-to-end crawl-curation shape: WET conversion records ->
    canonical-URL dedup (urlops) -> host blocklist -> quality score
    (text ops). The WARC source's output schema must feed the existing
    operators without adapters."""
    from pyspark.sql import functions as F

    from bambooanalysis_spark.operators.text import quality_score_e4
    from bambooanalysis_spark.operators.urlops import (
        filter_blocked_hosts,
        url_dedup,
        url_host,
    )

    def wet_rec(url: str, text: str) -> bytes:
        body = text.encode("utf-8")
        return (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            b"WARC-Target-URI: " + url.encode() + b"\r\n"
            b"WARC-Date: 2026-08-16T00:00:02Z\r\n"
            b"WARC-Record-ID: <urn:uuid:1>\r\n"
            b"Content-Type: text/plain\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n"
            b"\r\n" + body + b"\r\n\r\n"
        )

    recs = [
        # same page twice under tracking-param variants -> dedup to one
        wet_rec("https://example.com/a?utm_source=x", "good text " * 40),
        wet_rec("http://EXAMPLE.com/a", "good text " * 40),
        # blocked host -> filtered
        wet_rec("https://ads.tracker.net/p", "spam " * 40),
        # clean second page
        wet_rec("https://ok.org/b", "fine words here " * 30),
    ]
    (tmp_path / "crawl.wet.gz").write_bytes(
        b"".join(member_gz(r) for r in recs)
    )

    wet = wet_records(read_warc(spark, str(tmp_path / "crawl.wet.gz")))
    docs = wet.select(
        F.monotonically_increasing_id().alias("doc_id"), "url", "text"
    )
    bl = spark.createDataFrame([("tracker.net",)], "domain string")
    kept = url_dedup(docs.select("doc_id", "url"))
    # dedup collapsed the two example.com variants
    assert kept.count() == 3
    clean = filter_blocked_hosts(
        docs.withColumn("host", url_host(F.col("url"))), bl, "host"
    )
    assert clean.count() == 3  # ads.tracker.net row dropped
    scored = clean.withColumn("q", quality_score_e4(F.col("text")))
    assert scored.where(F.col("q") > 0).count() == 3


def test_read_warc_stream_matches_batch(spark, tmp_path):
    """Streaming ingest == batch scan on the same segment directory
    (house streaming==batch discipline): two availableNow micro-batched
    files produce exactly the batch read_warc rows."""
    from bambooanalysis_spark.sources.warc import read_warc_stream

    src = tmp_path / "segs"
    src.mkdir()
    (src / "seg-00000.warc.gz").write_bytes(GZ_FILE)
    (src / "seg-00001.warc.gz").write_bytes(member_gz(REC_CONVERSION))

    stream = read_warc_stream(
        spark, str(src), max_files_per_trigger=1
    )
    assert stream.isStreaming
    q = (
        wet_records(stream)
        .writeStream.format("memory")
        .queryName("warc_stream_wet")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["url"], r["text"], r["source_file"].split("/")[-1])
        for r in spark.sql("SELECT * FROM warc_stream_wet").collect()
    }
    want = {
        (r["url"], r["text"], r["source_file"].split("/")[-1])
        for r in wet_records(read_warc(spark, str(src))).collect()
    }
    assert got == want
    assert len(got) == 2


def test_large_member_spans_feed_chunks():
    # a member bigger than the 1 MiB feed chunk exercises the chunked
    # decompressor walk (multi-feed single member + exact boundary)
    big = ("chunk-spanning text " * 300_000).encode()  # ~6 MB raw
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://big.example/\r\n"
        b"Content-Length: " + str(len(big)).encode() + b"\r\n"
        b"\r\n" + big + b"\r\n\r\n"
    )
    blob = member_gz(rec) + member_gz(REC_CONVERSION)
    recs = list(parse_warc_bytes(blob, "big.warc.gz"))
    assert len(recs) == 2
    assert recs[0]["content"] == big
    assert recs[1]["record_offset"] == len(member_gz(rec))
    assert recs[1]["content"] == WET_TEXT


def test_negative_content_length_raises_not_spins():
    # a negative length would move the parse cursor BACKWARD and loop
    # forever (review finding): must be a loud ValueError instead
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Length: -37\r\n"
        b"\r\n"
        b"x\r\n\r\n"
    )
    with pytest.raises(ValueError, match="invalid Content-Length"):
        list(parse_warc_bytes(REC_WARCINFO + rec, "neg.warc"))


def test_parse_warc_bytes_is_lazy():
    # generator contract: a corrupt SECOND record must not prevent
    # consuming the first (bounded memory depends on laziness)
    blob = REC_WARCINFO + b"GARBAGE"
    it = parse_warc_bytes(blob, "lazy.warc")
    first = next(it)
    assert first["warc_type"] == "warcinfo"
    with pytest.raises(ValueError):
        next(it)


# --- http_responses: raw-HTML path over response records -----------------

def test_http_responses_splits_status_mime_body(spark, tmp_path):
    from bambooanalysis_spark.sources.warc import http_responses

    (tmp_path / "f.warc").write_bytes(PLAIN_FILE)
    out = http_responses(read_warc(spark, str(tmp_path / "f.warc"))).collect()
    assert len(out) == 1  # warcinfo + conversion filtered out
    r = out[0]
    assert r["url"] == "http://example.com/a"
    assert r["status"] == 200
    assert r["mime"] == "text/html"
    assert r["charset"] is None  # none declared
    assert r["body"] == b"<html><body>hello crawl</body></html>"
    assert r["body_text"] == "<html><body>hello crawl</body></html>"


def _resp_record(headers: bytes, body: bytes) -> bytes:
    http = headers + b"\r\n\r\n" + body
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://x.example/\r\n"
        b"WARC-Date: 2026-08-16T00:00:03Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n"
        b"\r\n" + http + b"\r\n\r\n"
    )


def test_http_responses_non_utf8_body_kept_byte_exact(spark, tmp_path):
    # latin-1 payload with bytes invalid in UTF-8: body must round-trip
    # EXACTLY; body_text must be NULL (declared charset is not utf-8)
    from bambooanalysis_spark.sources.warc import http_responses

    body = "caf\xe9 \xff\xfe binary-ish".encode("latin-1")
    rec = _resp_record(
        b"HTTP/1.1 404 Not Found\r\n"
        b"Content-Type: text/html; charset=ISO-8859-1",
        body,
    )
    (tmp_path / "f.warc").write_bytes(rec)
    r = http_responses(read_warc(spark, str(tmp_path / "f.warc"))).collect()[0]
    assert r["status"] == 404
    assert r["mime"] == "text/html"
    assert r["charset"] == "iso-8859-1"
    assert r["body"] == body
    assert r["body_text"] is None


def test_http_responses_utf8_body_decodes(spark, tmp_path):
    from bambooanalysis_spark.sources.warc import http_responses

    text = "déjà vu — utf8 body"
    rec = _resp_record(
        b"HTTP/1.1 200 OK\r\n"
        b'Content-Type: text/html; charset="UTF-8"',
        text.encode("utf-8"),
    )
    (tmp_path / "f.warc").write_bytes(rec)
    r = http_responses(read_warc(spark, str(tmp_path / "f.warc"))).collect()[0]
    assert r["charset"] == "utf-8"
    assert r["body_text"] == text


def test_http_responses_headerless_payload_yields_nulls(spark, tmp_path):
    # no CRLFCRLF split point: status/mime/body all NULL, row kept
    from bambooanalysis_spark.sources.warc import http_responses

    http = b"HTTP/1.1 200 OK"  # truncated message, no header terminator
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://x.example/\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n"
        b"\r\n" + http + b"\r\n\r\n"
    )
    (tmp_path / "f.warc").write_bytes(rec)
    r = http_responses(read_warc(spark, str(tmp_path / "f.warc"))).collect()[0]
    assert r["body"] is None and r["body_text"] is None
    # no header terminator -> no trustworthy head either: all NULL
    assert r["status"] is None and r["mime"] is None


def test_http_responses_compose_with_strip_html(spark, tmp_path):
    from pyspark.sql import functions as F

    from bambooanalysis_spark.operators.text import strip_html
    from bambooanalysis_spark.sources.warc import http_responses

    rec = _resp_record(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html",
        b"<html><p>real   text</p><script>x()</script></html>",
    )
    (tmp_path / "f.warc").write_bytes(rec)
    out = (
        http_responses(read_warc(spark, str(tmp_path / "f.warc")))
        .where(F.col("mime") == "text/html")
        .select(strip_html(F.col("body_text")).alias("t"))
        .collect()
    )
    assert "real text" in out[0]["t"]
    assert "script" not in out[0]["t"]


def test_cdx_index_rows(spark, tmp_path):
    from bambooanalysis_spark.sources.warc import cdx_index

    (tmp_path / "seg.warc.gz").write_bytes(GZ_FILE)
    rows = cdx_index(read_warc(spark, str(tmp_path / "seg.warc.gz"))).collect()
    assert len(rows) == 1  # only the response capture
    r = rows[0]
    assert r["urlkey"] == "com,example)/a"
    assert r["timestamp"] == "20260816000001"
    assert r["status"] == 200
    assert r["mime"] == "text/html"  # the PAYLOAD's type (CDX convention)
    assert r["offset"] == len(member_gz(REC_WARCINFO))  # member offset
    assert r["filename"].endswith("seg.warc.gz")


def test_http_responses_invalid_utf8_unlabeled_body_yields_null_text(
    spark, tmp_path
):
    # charset-less response whose bytes are NOT valid UTF-8 (mislabeled
    # latin-1, binary payloads): Spark 4 decode THROWS on malformed
    # input, so without the is_valid_utf8 gate one such capture aborts
    # the whole scan (review finding — verified crash)
    from bambooanalysis_spark.sources.warc import http_responses

    body = b"h\xff\xfei"  # invalid UTF-8, no charset declared
    rec = _resp_record(b"HTTP/1.1 200 OK\r\nContent-Type: text/html", body)
    (tmp_path / "f.warc").write_bytes(rec)
    r = http_responses(read_warc(spark, str(tmp_path / "f.warc"))).collect()[0]
    assert r["body"] == body  # bytes kept exact
    assert r["body_text"] is None  # not mangled, not crashed


def test_cdx_timestamp_truncates_fractional_seconds(spark, tmp_path):
    # WARC 1.1 allows fractional-second dates; CDX keys are exactly 14
    # digits (yyyyMMddHHmmss) — longer keys missort against standard
    # indexes (review finding)
    from bambooanalysis_spark.sources.warc import cdx_index

    http = b"HTTP/1.1 200 OK\r\n\r\nx"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://x.example/\r\n"
        b"WARC-Date: 2026-08-16T00:00:01.123456Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n"
        b"\r\n" + http + b"\r\n\r\n"
    )
    (tmp_path / "f.warc").write_bytes(rec)
    r = cdx_index(read_warc(spark, str(tmp_path / "f.warc"))).collect()[0]
    assert r["timestamp"] == "20260816000001"


def test_unicode_digit_content_length_rejected():
    # str.isdigit alone accepts Arabic-Indic digits etc. — spec headers
    # are ASCII (review finding)
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Length: \xd9\xa5\xd9\xa0\r\n"  # U+0665 U+0660 = "50"
        b"\r\n" + b"x" * 50 + b"\r\n\r\n"
    )
    with pytest.raises(ValueError, match="invalid Content-Length"):
        list(parse_warc_bytes(rec, "uni.warc"))
