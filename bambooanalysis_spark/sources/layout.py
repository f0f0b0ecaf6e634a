"""Scan-layout control: range-partitioned, sorted parquet writes.

At 100 TB the cheapest query is the one that never reads the data: parquet
keeps min/max statistics per row group, and a reader (Spark's vectorized
reader, DuckDB, presto/trino alike) skips any row group whose [min, max]
cannot satisfy a pushed-down predicate. That skipping is only effective if
the writer CLUSTERED the data — a random layout gives every row group
nearly the full value range, so nothing ever prunes.

``write_sorted`` produces the layout: repartitionByRange assigns disjoint
key ranges to output files (one exchange with range boundaries sampled by
Spark), sortWithinPartitions orders rows inside each file without any
further shuffle, and the parquet writer then emits row groups whose min/max
windows are tight and pairwise disjoint. A selective filter afterwards
touches O(matching) row groups instead of O(all).

Reference parity note: the reference inherits its layout from ROOT TTree
baskets chosen upstream; layout control is part of this engine's
training-data-pipeline surface (a 100 TB corpus is re-clustered by doc id /
source / time exactly this way before serving).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on ``sort_cols``: range-partitioned
    across files, sorted within each file. One shuffle (the range exchange);
    the sort is partition-local."""
    if not sort_cols:
        raise ValueError("sort_cols must be non-empty")
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def rowgroup_ranges(path: str, column: str) -> list[tuple]:
    """[(min, max)] per row group across every parquet file under ``path``
    — the exact statistics a reader's predicate pushdown consults. Test /
    audit surface for layout quality."""
    import glob
    import os

    import pyarrow.parquet as pq

    out: list[tuple] = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(column)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            out.append((st.min, st.max))
    return out


def pruned_fraction(ranges: list[tuple], lo, hi) -> float:
    """Fraction of row groups a reader skips for ``col BETWEEN lo AND hi``
    given their [min, max] stats — 0.0 means the layout defeats pruning."""
    if not ranges:
        return 0.0
    skipped = sum(1 for mn, mx in ranges if mx < lo or mn > hi)
    return skipped / len(ranges)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet write (``path/col=value/...``): the OTHER
    layout lever — a filter on a partition column prunes whole directories
    at planning time (PartitionFilters in the scan node), before any footer
    is read. Combine with ``sort_cols`` for row-group pruning within each
    partition. Low-cardinality columns only: each distinct value is a
    directory, and a high-cardinality partition key shatters 100 TB into
    millions of small files (the small-file problem, PERFORMANCE.md §5)."""
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    out = df
    if sort_cols:
        out = df.repartition(*partition_cols).sortWithinPartitions(
            *partition_cols, *sort_cols
        )
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def zorder_key(
    cols: list[str],
    ranges: dict[str, tuple[float, float]],
    bits: int = 10,
):
    """Morton (Z-order) interleaved key Column over the given columns.

    Each column is linearly bucketed into [0, 2^bits) using the
    [min, max] from ``ranges`` (collected once by ``write_zorder`` — two
    scalars per column, driver-side metadata like a codebook), then the
    bucket bits are interleaved column-major: bit i of column j lands at
    position i * n_cols + j. Linear bucketing assumes roughly uniform
    value spread; for heavily skewed columns substitute quantile
    boundaries for (min, max) upstream — the interleave is unchanged.
    Total bits must fit a long: bits * len(cols) <= 62.
    """
    from pyspark.sql import functions as F

    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must be <= 62")
    maxb = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        mn, mx = ranges[c]
        span = (mx - mn) or 1.0
        bucket = F.least(
            F.greatest(
                F.floor((F.col(c).cast("double") - F.lit(float(mn))) / F.lit(span) * maxb),
                F.lit(0),
            ),
            F.lit(maxb),
        ).cast("long")
        for i in range(bits):
            bit = F.shiftright(bucket.bitwiseAND(F.lit(1 << i)), i)
            key = key + F.shiftleft(bit, i * len(cols) + j)
    return key


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 10,
    partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered parquet write: multi-column data skipping.

    A single-column sort gives tight row-group [min,max] windows on ONE
    column — filters on any other column prune nothing. Interleaving the
    bucket bits of several columns (the Morton curve, public: Morton 1966;
    the technique behind Delta/Iceberg OPTIMIZE ZORDER) makes row groups
    into small hyper-rectangles of the combined key space, so a selective
    range filter on ANY participating column skips most row groups.
    Cost shape: one 2-scalar-per-column stats job + the same
    repartitionByRange/sortWithinPartitions write as ``write_sorted``
    (ONE shuffle) — the curve key is a pure per-row bit expression.
    Pinned by tests/test_extensions.py::test_zorder_layout_prunes_on_both_columns.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).alias(f"__mn_{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"__mx_{i}") for i, c in enumerate(cols)],
    ).first()
    ranges = {
        c: (float(stats[f"__mn_{i}"]), float(stats[f"__mx_{i}"]))
        for i, c in enumerate(cols)
    }
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    (
        df.withColumn("__z", zorder_key(cols, ranges, bits))
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def export_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    shards: int,
    fmt: str = "parquet",
    seed: int = 0,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> dict:
    """Size-balanced, deterministically shuffled training shards — the
    serving end of the pipeline: a trainer streams shard files round-robin
    across data-loader workers, so shard-size SKEW is straggler time and
    a nondeterministic order breaks run-to-run reproducibility.

    Mechanics (one shuffle total), deterministic BY CONSTRUCTION — no
    range sampling anywhere (repartitionByRange's boundary sampling is
    documented as run-to-run inconsistent, measured so in the tests):

    * Shard membership: ``pmod(xxhash64(key, seed), shards)`` — a pure
      function of the row, so reruns, resumes and retried tasks assign
      identically; uniform because the hash is uniform over 2^64.
    * Shard placement: ``write.partitionBy('shard')`` gives every shard
      id its own DIRECTORY regardless of which task held it, so the
      hash-repartition collisions that would skew shard-per-FILE
      layouts (two ids landing in one task) only co-locate work, never
      merge shards. One repartition on the id = all rows of a shard in
      one task = one file per shard directory.
    * In-shard order: rows sort by (row hash, key) inside each task —
      the seeded global permutation a trainer replays (same contract as
      sampling.training_order). The key tiebreak makes the order total
      when distinct keys collide on the 64-bit hash; rows DUPLICATED on
      ``key_col`` itself are interchangeable under any seed, so exact
      byte-reproducibility of mixed payloads needs a (near-)unique key
      — which a doc id, the usual key, is.
    * ``max_records_per_file`` (native writer option) is the
      belt-and-braces cap: a shard that still exceeds it splits into
      sequence-numbered files rather than OOMing a loader.

    Returns a manifest dict {files: [{file, records}...], total_records,
    shards, seed, fmt, empty_shards} and writes it as ``_manifest.json``
    next to the shards. Counts and the manifest write go through Spark /
    the Hadoop FileSystem API, so the export works against any scheme
    the cluster can write (s3a://, hdfs://, file://) — not just the
    driver's local disk. The count-back pass is one zero-column scan of
    the shards (footer-served for parquet).

    ``files`` is AUTHORITATIVE for what exists on disk: a shard id with
    zero rows writes no directory at all (partitionBy semantics), so a
    loader must round-robin over ``files``, not ``range(shards)`` —
    missing ids are listed in ``empty_shards``. An entirely empty input
    is a legitimate outcome (a fully-filtered split) and produces an
    empty ``files`` list, not a crash.
    """
    import json
    import os

    from pyspark.sql import functions as F

    if fmt not in ("parquet", "json"):
        raise ValueError(f"fmt must be parquet|json, got {fmt!r}")
    if shards < 1:
        raise ValueError("shards must be >= 1")
    for reserved in ("shard", "__shard_key"):
        if reserved in df.columns:
            raise ValueError(
                f"input already has a {reserved!r} column — rename it; "
                "'shard' is the export's partition column"
            )
    h = F.xxhash64(F.col(key_col), F.lit(seed))
    out = (
        df.withColumn("__shard_key", h)
        .withColumn("shard", F.pmod(F.col("__shard_key"), F.lit(shards)))
        .repartition(shards, F.col("shard"))
        .sortWithinPartitions("shard", "__shard_key", key_col)
        .drop("__shard_key")
    )
    writer = out.write.mode(mode).partitionBy("shard")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if fmt == "parquet":
        writer.parquet(path)
    else:
        writer.json(path)

    spark = df.sparkSession
    counts = _count_shard_files(spark, path, fmt)
    files = sorted(
        ({"file": k, "records": v} for k, v in counts.items()),
        key=lambda x: x["file"],
    )
    total = sum(f["records"] for f in files)
    present = {
        int(f["file"].split("=")[1].split("/")[0]) for f in files
    }
    manifest = {
        "files": files,
        "total_records": total,
        "shards": shards,
        "empty_shards": sorted(set(range(shards)) - present),
        "seed": seed,
        "fmt": fmt,
        "key_col": key_col,
    }
    # write via the Hadoop FS API so remote schemes work too
    hpath, fs = _manifest_path(spark, path)
    stream = fs.create(hpath, True)
    try:
        stream.write(
            json.dumps(manifest, indent=1, sort_keys=True).encode("utf-8")
        )
    finally:
        stream.close()
    return manifest


def _manifest_path(spark, path: str):
    """(_manifest.json Hadoop Path, its FileSystem) — shared by the
    export write and the validator read so the two can never address
    different files."""
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path, "_manifest.json")
    return hpath, hpath.getFileSystem(sc._jsc.hadoopConfiguration())


def _count_shard_files(spark, path: str, fmt: str) -> dict:
    """{shard=K/file: row count} over a shard-export directory — the ONE
    counting implementation the exporter's manifest and validate_shards
    both use (divergent copies would let the validator miss or invent
    corruption). Emptiness is decided by a Hadoop FS glob, NOT by
    catching the read's AnalysisException: a blanket catch would also
    swallow real read failures (e.g. glob metacharacters in the path
    matching nothing on read-back) and commit an empty manifest for a
    populated corpus. A genuinely empty export returns {}; any listing
    surprise after the glob saw files still raises."""
    import os

    from pyspark.sql import functions as F

    ext = "*.parquet" if fmt == "parquet" else "*.json"
    sc = spark.sparkContext
    gpath = sc._jvm.org.apache.hadoop.fs.Path(
        os.path.join(path, "shard=*", ext)
    )
    fs = gpath.getFileSystem(sc._jsc.hadoopConfiguration())
    statuses = fs.globStatus(gpath)
    if statuses is None or len(statuses) == 0:
        return {}
    back = (
        spark.read.parquet(path)
        if fmt == "parquet"
        else spark.read.text(os.path.join(path, "shard=*", ext))
    )
    per_file = back.groupBy(F.input_file_name().alias("f")).count().collect()
    return {"/".join(r["f"].split("/")[-2:]): r["count"] for r in per_file}


def validate_shards(spark, path: str) -> dict:
    """Loader-side integrity check of an export_training_shards output:
    recount the shards (same any-filesystem Spark count-back the
    exporter used) and compare against the committed ``_manifest.json``.
    Returns the manifest on success; raises ValueError naming every
    divergence (missing/extra/miscounted file) — the pre-flight a
    training job runs before burning accelerator hours on a corpus that
    lost files to a partial copy or retention policy.
    """
    import json

    jvm = spark.sparkContext._jvm
    hpath, fs = _manifest_path(spark, path)
    if not fs.exists(hpath):
        raise ValueError(f"{path}: no _manifest.json — not a shard export")
    # read through the Hadoop FS stream (same any-filesystem reach as
    # the write path). NOT spark.read.text: underscore-prefixed files
    # are hidden to Spark's file index (by design — that is why the
    # manifest name starts with '_', so data reads skip it). commons-io
    # ships in Spark's jars/ (Hadoop dependency); toByteArray RETURNS
    # the bytes — py4j passes primitive arrays by value, so a
    # readFully-into-buffer never surfaces the JVM-side mutation.
    stream = fs.open(hpath)
    try:
        raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    manifest = json.loads(raw.decode("utf-8"))

    got = _count_shard_files(spark, path, manifest["fmt"])
    want = {f["file"]: f["records"] for f in manifest["files"]}
    problems = []
    for f in sorted(set(want) - set(got)):
        problems.append(f"missing {f} ({want[f]} records expected)")
    for f in sorted(set(got) - set(want)):
        problems.append(f"unmanifested file {f} ({got[f]} records)")
    for f in sorted(set(got) & set(want)):
        if got[f] != want[f]:
            problems.append(
                f"{f}: {got[f]} records on disk, manifest says {want[f]}"
            )
    if problems:
        raise ValueError(
            f"{path}: shard export fails validation: " + "; ".join(problems)
        )
    return manifest
