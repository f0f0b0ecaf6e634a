"""Crawl-to-shards end-to-end pipeline (contract/crawl.py, VERDICT r10
#1): fixture determinism, plan shape of the corpus path, funnel
invariants and rerun identity. Value correctness vs the DuckDB oracle is
covered by the standard gate
(test_contract_oracle.py::test_query_matches_oracle[pipeline_crawl_to_shards]).
"""

import glob
import hashlib
import json
import os
import shutil

import pytest

SF = "/root/testdata/sf0.001"


def _fixture(spark):
    from bambooanalysis_spark.contract.crawl import crawl_fixture_dir

    return crawl_fixture_dir(spark, SF)


def _dir_digest(base: str) -> str:
    h = hashlib.md5()
    for p in sorted(glob.glob(os.path.join(base, "*.wet.gz"))):
        h.update(os.path.basename(p).encode())
        with open(p, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


def test_crawl_fixture_bytes_deterministic(spark):
    """Rebuilding the WET fixture from scratch must reproduce identical
    segment BYTES (gzip mtime=0 + fixed level + sorted records): a
    byte-unstable fixture would make the bench time different inputs
    across runs."""
    base = _fixture(spark)
    first = _dir_digest(base)
    n_files = len(glob.glob(os.path.join(base, "*.wet.gz")))
    assert n_files == 16
    shutil.rmtree(base)
    assert _dir_digest(_fixture(spark)) == first


def test_crawl_fixture_short_directory_rebuilds(spark):
    """A marker whose recorded total disagrees with the table (killed
    half-write, stale cache) must trigger a rebuild, not serve short."""
    base = _fixture(spark)
    marker = os.path.join(base, "_SUCCESS")
    with open(marker, "w") as fh:
        json.dump({"records": 1, "segments": 16}, fh)
    base2 = _fixture(spark)
    assert base2 == base
    with open(marker) as fh:
        assert json.load(fh)["records"] == 500


def test_crawl_corpus_path_plan_shape(spark):
    """The curation-flag plan's corpus path: exactly ONE Python stage
    (the documented WARC mapInPandas ingest), no row-at-a-time Python,
    no quadratic joins — and every shuffle exchange sits under a rule
    table (robots group fold / blocklist distinct), never above the
    WARC scan."""
    from bambooanalysis_spark.contract.crawl import crawl_stage_frames

    base = _fixture(spark)
    plan = (
        crawl_stage_frames(spark, base + "/*.wet.gz")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 1
    assert plan.count("BatchEvalPython") == 0
    assert plan.count("ArrowEvalPython") == 0
    assert plan.count("CartesianProduct") == 0
    assert plan.count("BroadcastNestedLoopJoin") == 0
    # corpus never shuffles: walk up from the binaryFile scan — the only
    # exchanges on its ancestor chain must be the BROADCAST sides of the
    # probe joins, never a hashpartitioning of the parsed corpus itself.
    lines = plan.splitlines()
    (scan_i,) = [i for i, ln in enumerate(lines) if "Format: BINARYFILE" in ln]
    depth = lines[scan_i].index("+-")
    for i in range(scan_i - 1, -1, -1):
        marker = max(lines[i].find("+-"), lines[i].find(":-"))
        if marker == -1 or marker >= depth:
            continue  # sibling subtree (a broadcast build side)
        depth = marker
        assert "Exchange hashpartitioning" not in lines[i], lines[i]


def test_crawl_manifest_funnel_and_rerun_identity(spark):
    """Stage docs/tokens are non-increasing down the funnel, every stage
    is non-vacuous at fixture scale (each gate actually cuts), the mix
    honors its budget, and a second invocation reproduces the manifest
    exactly (fixture memoization + deterministic operators)."""
    from bambooanalysis_spark.contract.crawl import (
        _BUDGET,
        pipeline_crawl_to_shards,
    )

    a = pipeline_crawl_to_shards(spark, SF).toPandas()
    assert list(a["seq"]) == list(range(7))
    docs, toks = list(a["n_docs"]), list(a["n_tokens"])
    assert all(x >= y for x, y in zip(docs, docs[1:]))
    assert all(x >= y for x, y in zip(toks, toks[1:]))
    # each curation gate removes something on this fixture; an
    # accidentally-always-true flag would silently hollow the query out
    assert docs[0] > docs[1] > docs[2] > docs[3] > docs[4] > docs[5] > 0
    assert toks[5] <= _BUDGET
    assert docs[6] == docs[5] and toks[6] == toks[5]
    b = pipeline_crawl_to_shards(spark, SF).toPandas()
    assert a.equals(b)


@pytest.mark.usefixtures("spark")
def test_crawl_query_registered_with_oracle():
    from bambooanalysis_spark.contract import ORACLES, QUERIES

    assert "pipeline_crawl_to_shards" in QUERIES
    assert "pipeline_crawl_to_shards" in ORACLES
