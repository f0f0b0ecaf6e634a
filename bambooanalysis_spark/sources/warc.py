"""WARC / WET web-archive source (ISO 28500) — the CommonCrawl input.

Every large-scale pretraining corpus starts life as WARC: CommonCrawl
publishes each crawl as ~72k files of ~1 GiB, each a concatenation of
records (request/response/metadata in ``.warc.gz``, extracted plain text
as ``conversion`` records in ``.wet.gz``).  This module parses that
format into a DataFrame so the rest of the engine (urlops, dedup,
quality, packing) can run directly on crawl data.

Format (ISO 28500 / WARC 1.0 — public spec):

    record      = version-line CRLF *header-line CRLF block CRLF CRLF
    version     = "WARC/1.0" | "WARC/1.1"
    header-line = field-name ":" SP field-value   (e.g. WARC-Type,
                  WARC-Target-URI, WARC-Date, WARC-Record-ID,
                  Content-Type, Content-Length)
    block       = exactly Content-Length octets

CommonCrawl's ``.warc.gz``/``.wet.gz`` compress EACH RECORD as an
independent gzip member (the spec's recommended layout, ISO 28500 annex
D), so a reader can skip to any record given a byte offset from the CDX
index.  This parser iterates the members with a raw-deflate
decompressor and tracks ``unused_data`` to find member boundaries.

Scale shape — file-per-task, no shuffle:

* ``spark.read.format("binaryFile")`` gives one task per file.  A
  ``.warc.gz`` is NOT block-splittable (gzip members are only findable
  sequentially or via the external CDX index), so file granularity IS
  the right parallel unit — a 100 TB crawl is ~100k files, far more
  tasks than any cluster has cores.  This matches how every production
  crawl pipeline (including the reference C4/RefinedWeb recipes)
  schedules WARC work.
* Parsing runs in ``mapInPandas`` and yields bounded Arrow batches
  (``batch_bytes``), so a 1 GiB file never materialises as one row
  batch; memory per task is O(file + batch), and binaryFile's 2 GiB
  per-file ceiling is documented below.
* The output is immediately filter/projection-friendly: a WET text
  pipeline does ``wet_records(read_warc(...))`` and the downstream plan
  is ordinary JVM-side columns.

Corrupt input contract (same as sources/minroot.py): structural damage
— a truncated block, a record without Content-Length, a bad version
line — raises ``ValueError`` naming the file and offset rather than
silently yielding short data.
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "source_file string, record_offset long, warc_type string, "
    "record_id string, target_uri string, warc_date string, "
    "content_type string, content_length long, content binary"
)

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


def _parse_records(
    buf: bytes, source: str, offset_base: int = 0
) -> Iterator[dict]:
    """Yield one dict per WARC record in ``buf`` (uncompressed bytes).

    ``offset_base`` lets gzip-member callers report the offset of the
    COMPRESSED member in the file (what a CDX index stores) instead of
    the offset within the decompressed stream.
    """
    pos = 0
    n = len(buf)
    while pos < n:
        # Inter-record padding: the spec terminates a record with two
        # CRLFs; tolerate any run of them before the next version line.
        while buf[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        rec_off = pos
        eol = buf.find(_CRLF, pos)
        if eol < 0:
            raise ValueError(
                f"{source}: truncated WARC version line at offset "
                f"{offset_base + rec_off}"
            )
        version = buf[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(
                f"{source}: expected WARC version line at offset "
                f"{offset_base + rec_off}, got {version[:20]!r}"
            )
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = buf.find(_CRLF, pos)
            if eol < 0:
                raise ValueError(
                    f"{source}: truncated WARC header block at offset "
                    f"{offset_base + rec_off}"
                )
            line = buf[pos:eol]
            pos = eol + 2
            if not line:
                break  # blank line ends the header block
            # Spec allows header continuation lines (leading SP/TAB);
            # fold them into the previous field per RFC 5322 rules.
            if line[:1] in (b" ", b"\t") and headers:
                last = next(reversed(headers))
                headers[last] += " " + line.strip().decode(
                    "utf-8", "replace"
                )
                continue
            name, sep, value = line.partition(b":")
            if not sep:
                raise ValueError(
                    f"{source}: malformed WARC header {line[:40]!r} at "
                    f"offset {offset_base + rec_off}"
                )
            headers[name.decode("ascii", "replace").strip().lower()] = (
                value.decode("utf-8", "replace").strip()
            )
        if "content-length" not in headers:
            raise ValueError(
                f"{source}: WARC record at offset "
                f"{offset_base + rec_off} has no Content-Length"
            )
        clen_s = headers["content-length"]
        # strict non-negative integer: a negative length would move the
        # cursor BACKWARD (pos += clen) and re-parse the same record
        # forever — a crafted/corrupt file must not spin an executor
        # isascii() too: str.isdigit alone accepts Unicode digit classes
        # (Arabic-Indic etc.) — spec headers are ASCII, and some of those
        # pass isdigit but then crash int() without file/offset context
        if not (clen_s.isascii() and clen_s.isdigit()):
            raise ValueError(
                f"{source}: WARC record at offset {offset_base + rec_off} "
                f"has invalid Content-Length {clen_s!r}"
            )
        clen = int(clen_s)
        if pos + clen > n:
            raise ValueError(
                f"{source}: WARC block at offset {offset_base + rec_off} "
                f"declares {clen} octets but only {n - pos} remain"
            )
        block = buf[pos : pos + clen]
        pos += clen
        if buf[pos : pos + 4] != _CRLF + _CRLF:
            raise ValueError(
                f"{source}: WARC record at offset {offset_base + rec_off}"
                " missing the terminating CRLFCRLF"
            )
        pos += 4
        yield {
            "source_file": source,
            "record_offset": offset_base + rec_off,
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": clen,
            "content": block,
        }


_GZ_FEED_CHUNK = 1 << 20  # 1 MiB per decompressor feed


def _iter_gzip_members(data: bytes, source: str) -> Iterator[tuple[int, bytes]]:
    """(member_offset, decompressed_bytes) per independent gzip member.

    CommonCrawl layout: one member per record.  zlib with wbits=31 stops
    at the member's end and reports the remainder via ``unused_data`` —
    the standard sequential member walk.

    The decompressor is fed bounded chunks through a zero-copy
    memoryview: handing it ``data[pos:]`` wholesale would slice a copy
    of the remaining file AND get the tail copied back via
    ``unused_data`` on every member — O(members x filesize) memcpy,
    which at a real crawl file (1 GiB, ~150k members) is terabytes of
    copying.  Chunked feeding keeps the walk linear (measured 40x on a
    16 MB / 16k-member file, PERFORMANCE §57).
    """
    mv = memoryview(data)
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 2] != _GZIP_MAGIC:
            raise ValueError(
                f"{source}: expected gzip member magic at offset {pos}"
            )
        d = zlib.decompressobj(wbits=31)
        out = []
        p = pos
        while not d.eof:
            if p >= n:
                raise ValueError(
                    f"{source}: truncated gzip member at offset {pos}"
                )
            chunk = mv[p : p + _GZ_FEED_CHUNK]
            try:
                out.append(d.decompress(chunk))
            except zlib.error as exc:
                raise ValueError(
                    f"{source}: corrupt gzip member at offset {pos}: {exc}"
                ) from exc
            p += len(chunk)
        yield pos, b"".join(out)
        # member ends where the unconsumed tail of the LAST fed chunk
        # begins; unused_data is at most one chunk, never the whole file
        pos = p - len(d.unused_data)


def parse_warc_bytes(data: bytes, source: str = "<bytes>") -> Iterator[dict]:
    """Parse a WARC file image (plain or member-gzipped), YIELDING record
    dicts one at a time — a generator, so a 1 GiB crawl file never
    materializes all its records at once and the mapInPandas batcher's
    memory stays O(compressed file + one record + one batch).
    Compression is sniffed from the gzip magic; offsets are member
    offsets for ``.gz`` input (CDX-compatible) and record offsets for
    plain input."""
    if data[:2] == _GZIP_MAGIC:
        for off, member in _iter_gzip_members(data, source):
            # One member per record is the CC layout, but the spec also
            # allows a single member holding many records — offsets
            # within a multi-record member stay member-relative-to-file
            # only for the first; keep them honest by reporting the
            # member offset for all (what the CDX index addresses).
            for r in _parse_records(member, source, offset_base=off):
                r["record_offset"] = off
                yield r
    else:
        yield from _parse_records(data, source)


def _partition_parser(batch_rows: int):
    """The mapInPandas worker shared by the batch and streaming scans:
    (path, content) file rows in, bounded record batches out."""
    import pandas as pd

    cols = [
        "source_file", "record_offset", "warc_type", "record_id",
        "target_uri", "warc_date", "content_type", "content_length",
        "content",
    ]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                rows: list[dict] = []
                for rec in parse_warc_bytes(row["content"], row["path"]):
                    rows.append(rec)
                    if len(rows) >= batch_rows:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return run


def read_warc(
    spark: SparkSession,
    path: str,
    batch_rows: int = 256,
) -> DataFrame:
    """Distributed WARC/WET scan: one task per file (binaryFile), parse
    in ``mapInPandas`` with bounded Arrow batches.

    binaryFile loads each file into one task's memory (2 GiB hard cap in
    Spark's binaryFile source) — the right trade for crawl archives,
    whose files are sized ~1 GiB precisely so that file == work unit.
    Parallelism is the file count; no shuffle is introduced.
    """
    files = (
        spark.read.format("binaryFile").load(path).select("path", "content")
    )
    return files.mapInPandas(_partition_parser(batch_rows), WARC_SCHEMA)


def read_warc_stream(
    spark: SparkSession,
    path: str,
    batch_rows: int = 256,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming WARC ingest: crawl segments appearing under ``path``
    parse incrementally as they land — the live-crawl shape (fetchers
    drop finished .warc.gz segments into a bucket; this source picks
    each up exactly once via the file-stream source's checkpointed file
    log). Same parser, same output schema as read_warc, so the
    downstream pipeline (wet_records -> urlops -> the streaming URL
    first-claim dedup in streaming/stateful.py) is batch/stream
    symmetric.  File-per-trigger-batch granularity mirrors the batch
    scan's file-per-task unit."""
    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, length long, "
        "content binary"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(_partition_parser(batch_rows), WARC_SCHEMA)


def wet_records(warc: DataFrame) -> DataFrame:
    """WET view: the ``conversion`` records (extracted page text) as
    (url, fetch_time, text).  Pure JVM-side filter + cast on the scan —
    Catalyst prunes the untouched columns back into the Arrow batch."""
    from pyspark.sql import functions as F

    return (
        warc.filter(F.col("warc_type") == "conversion")
        .select(
            F.col("target_uri").alias("url"),
            F.col("warc_date").alias("fetch_time"),
            F.col("content").cast("string").alias("text"),
            "source_file",
            "record_offset",
        )
    )


def http_responses(warc: DataFrame) -> DataFrame:
    """Raw-HTML view over ``response`` records: split the captured HTTP
    message into (status, mime, charset, body) — the RefinedWeb-style
    path that re-extracts text from raw WARC instead of trusting WET.

    Entirely JVM-side despite the binary payload: the message decodes
    through ISO-8859-1 (a LOSSLESS byte<->char bijection, so character
    offsets ARE byte offsets and re-encoding restores the exact bytes),
    the header/body split is the first CRLFCRLF, the status line and
    Content-Type parse with regexps, and the body re-encodes to binary
    untouched.  ``body_text`` is non-NULL only when the declared charset
    is UTF-8 (or none — HTML5's effective default on the wire once
    meta-sniffing is out of scope) AND the bytes actually validate as
    UTF-8 — real crawls are full of charset-less non-UTF-8 payloads, and
    Spark 4's decode THROWS on malformed input rather than substituting
    U+FFFD, so one mislabeled capture would otherwise abort the whole
    scan (review finding; ``is_valid_utf8`` gates the decode). Other
    charsets keep the exact bytes in ``body`` for a downstream
    transcoder, rather than silently mangling them.

    Output: (url, fetch_time, status, mime, charset, body, body_text,
    source_file, record_offset).  One map over the scan, no shuffle.
    """
    from pyspark.sql import functions as F

    msg = F.decode(F.col("content"), "ISO-8859-1")
    sep = F.instr(msg, "\r\n\r\n")
    head = F.when(sep > 0, F.substring(msg, F.lit(1), sep - 1))
    body_chars = F.when(sep > 0, msg.substr(sep + 4, F.length(msg)))
    status = F.regexp_extract(head, r"^HTTP/[0-9.]+ (\d{3})", 1)
    ctype = F.regexp_extract(
        head, r"(?mi)^content-type:\s*([^\r\n]+)", 1
    )
    mime = F.lower(F.trim(F.regexp_extract(ctype, r"^([^;]+)", 1)))
    charset = F.lower(
        F.regexp_extract(ctype, r"(?i)charset=\"?([A-Za-z0-9_.:-]+)", 1)
    )
    body = F.encode(body_chars, "ISO-8859-1")
    is_utf8 = (charset == "") | charset.isin("utf-8", "utf8")
    return (
        warc.filter(
            (F.col("warc_type") == "response")
            & F.col("content_type").startswith("application/http")
        )
        .select(
            F.col("target_uri").alias("url"),
            F.col("warc_date").alias("fetch_time"),
            F.when(status != "", status).cast("int").alias("status"),
            F.when(mime != "", mime).alias("mime"),
            F.when(charset != "", charset).alias("charset"),
            body.alias("body"),
            F.when(
                is_utf8 & F.is_valid_utf8(body), F.decode(body, "UTF-8")
            ).alias("body_text"),
            "source_file",
            "record_offset",
        )
    )


def cdx_index(warc: DataFrame) -> DataFrame:
    """CDX(J)-style capture index over a parsed WARC scan — the lookup
    artifact every crawl pipeline writes next to its segments: one row
    per response capture, keyed by SURT, carrying exactly what a reader
    needs for random access (file + member offset; the member-gzip
    layout makes ``(source_file, record_offset)`` a seekable address).

    Columns follow the public CDXJ convention: (urlkey, timestamp, url,
    mime, status, offset, filename).  Pure column algebra over
    http_responses + urlops.surt_key — no shuffle; sort/cluster it with
    sources/layout.write_sorted(urlkey) to get the prefix-scannable
    on-disk index."""
    from pyspark.sql import functions as F

    from ..operators.urlops import surt_key

    resp = http_responses(warc)
    return resp.select(
        surt_key(F.col("url")).alias("urlkey"),
        # 14-digit yyyyMMddHHmmss per the CDX convention: WARC 1.1
        # fractional seconds must truncate, or mixed-precision rows
        # missort against standard indexes (review finding)
        F.substring(
            F.regexp_replace(F.col("fetch_time"), r"[^0-9]", ""),
            1, 14,
        ).alias("timestamp"),
        "url",
        "mime",
        "status",
        F.col("record_offset").alias("offset"),
        F.col("source_file").alias("filename"),
    )
