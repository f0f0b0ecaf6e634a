#!/usr/bin/env python
"""WARC/WET source throughput (round 10): measure the mapInPandas parse
path on realistic member-gzipped crawl files, because the scale claim
("file-per-task, parse is not the bottleneck") should carry a number.

Fixture: N .wet.gz files are generated driver-side from deterministic
text (seeded, CommonCrawl-shaped ~3 KB documents, one gzip member per
record — the test-suite fixture grammar at volume). The timed section
is read_warc + wet_records + a count-style aggregate over the text
column, i.e. decompress + record split + header parse + Arrow transfer.

    python scripts/bench_warc.py [n_files] [docs_per_file]
"""

from __future__ import annotations

import gzip
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def make_record(url: str, text: str) -> bytes:
    body = text.encode("utf-8")
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Date: 2026-08-16T00:00:00Z\r\n"
        b"WARC-Record-ID: <urn:uuid:bench>\r\n"
        b"Content-Type: text/plain\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n"
        b"\r\n" + body + b"\r\n\r\n"
    )


def main() -> None:
    from bambooanalysis_spark.session import get_spark
    from bambooanalysis_spark.sources.warc import read_warc, wet_records

    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    docs_per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    spark = get_spark("warc-bench")
    tmp = tempfile.mkdtemp(prefix="warcbench-")
    # ~3 KB of wordy text per doc, varied so gzip does not degenerate
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    total_bytes = 0
    for f in range(n_files):
        parts = []
        for d in range(docs_per_file):
            seed = f * docs_per_file + d
            text = " ".join(
                words[(seed + i) % len(words)] + str((seed * 31 + i) % 97)
                for i in range(400)
            )
            parts.append(
                gzip.compress(
                    make_record(f"http://b.example/{seed}", text), mtime=0
                )
            )
        blob = b"".join(parts)
        total_bytes += len(blob)
        with open(os.path.join(tmp, f"seg-{f:05d}.wet.gz"), "wb") as fh:
            fh.write(blob)

    # warm-up (JVM/Arrow init) on one file, then the timed full scan
    read_warc(spark, os.path.join(tmp, "seg-00000.wet.gz")).count()
    t0 = time.time()
    wet = wet_records(read_warc(spark, tmp + "/*.wet.gz"))
    agg = wet.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("chars"),
    ).collect()[0]
    dt = time.time() - t0
    n_docs = n_files * docs_per_file
    assert agg["n"] == n_docs, (agg["n"], n_docs)
    print(
        {
            "files": n_files,
            "docs": n_docs,
            "gz_mb": round(total_bytes / 1e6, 1),
            "text_mb": round(agg["chars"] / 1e6, 1),
            "sec": round(dt, 2),
            "gz_mb_per_s": round(total_bytes / 1e6 / dt, 1),
            "docs_per_s": round(n_docs / dt),
        }
    )


if __name__ == "__main__":
    main()
