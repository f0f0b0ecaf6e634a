"""Scale-hazard lint: a hard `F.broadcast(...)` hint OVERRIDES Spark's
size threshold, so a hint on an SF-scaled table (customer, supplier,
part, lineitem-derived aggregates keyed by an SF-scaled key) is an
executor OOM at 100x by construction — not a slow plan (VERDICT round 7,
"What's wrong" #1). Bounded sides (nation = 25 rows, region = 5,
one-row scalar aggregates, fixed-cardinality group-bys) may be hinted.

This test walks every contract/operator module's AST and asserts each
`F.broadcast(x)` call's argument is on the explicit allowlist below.
Adding a new hint means proving the side is bounded and listing it here
with the reason — the review step the ratchet exists to force.
"""

import ast
from pathlib import Path

SRC = Path(__file__).resolve().parent.parent / "bambooanalysis_spark"

# (file, variable-name) -> why its cardinality is bounded (does not
# grow with SF). Entries are FILE-SCOPED: natural variable names like
# 'q' or 'b' would otherwise whitelist any future unrelated broadcast
# in any module — exactly the unreviewed-hint class the ratchet exists
# to force review of (code-review r8 finding #6). file=None means the
# name is distinctive enough to allow anywhere.
ALLOWED = {
    (None, "nation"): "25 rows by TPC-H construction",
    (None, "region"): "5 rows by TPC-H construction",
    ("tpch.py", "n1"): "nation projection",
    ("tpch.py", "n2"): "nation projection",
    ("tpch.py", "top"): "1-row MAX aggregate",
    ("tpch.py", "pos"): "1-row scalar aggregate",
    ("tpch.py", "total"): "1-row scalar aggregate",
    ("relational.py", "avg_by_type"):
        "group-by on p_type (fixed 150-value domain)",
    ("similarity.py", "q"):
        "query side, size-gated by _maybe_broadcast's count probe",
    (None, "centroids"): "k rows, k is a user parameter independent of SF",
    (None, "codebook"): "k x m codebook, parameter-sized",
    ("decomp.py", "model"): "d+1 rows (PCA/JL projection), dimension-sized",
    ("classifier.py", "model"): "NB 1-row meta aggregate",
    ("classifier.py", "labels"):
        "NB label_stats: one row per class label, domain-bounded",
    ("dedup.py", "vocab_idx"):
        "bitset64 vocabulary, raise_error-guarded at 64 tokens",
    ("dedup.py", "b"): "bitset64 all-pairs side; strategy is a documented "
                       "dense/small-corpus opt-in (jaccard_pairs docstring)",
    ("graph.py", "dang"): "1-row dangling-rank aggregate",
    ("pretrain.py", "bench_keys"):
        "benchmark band keys; eval sets are fixed-size",
    ("retrieval.py", "dvals"): "count-min depth values, d rows",
    ("retrieval.py", "qdf"):
        "hdr_quantiles q list, len(qs) rows (caller parameter)",
    ("joins.py", "totals"):
        "key_skew_profile 1-row total/distinct aggregate",
    ("retrieval.py", "sketch"): "count-min sketch, d x width parameter-sized",
    ("retrieval.py", "stats"): "1-row corpus aggregate (BM25 avgdl)",
    ("retrieval.py", "qterms"):
        "distinct query terms; query workload, not corpus-scaled",
    ("sampling.py", "thresholds"): "one row per stratum, domain-count bounded",
    ("similarity.py", "cand"):
        "gated by nq <= broadcast_limit and refine*k product check",
    ("similarity.py", "qv"): "gated by nq <= broadcast_limit",
    ("merge.py", "ch_keys"): "merge change batch; broadcast_changes is an "
                             "explicit caller opt-in for bounded batches",
    ("merge.py", "ch"): "same broadcast_changes opt-in (scd2_apply)",
    ("dedup.py", "total"): "1-row corpus-count aggregate (df-frac cutoff)",
    ("graph.py", "total"): "1-row node-count aggregate (PageRank base)",
    ("lm.py", "model"): "model.vocab: 1-row distinct-token count",
    ("urlops.py", "m"): "public-suffix list projection: ~9k rows at full "
                        "Mozilla PSL, fixed metadata independent of SF",
    ("urlops.py", "psl"): "same public-suffix rule table (probe joins in "
                          "registered_domain_from), bounded metadata",
    ("similarity.py", "_pq_codebook_df"):
        "ONE-ROW PQ codebook DataFrame (m x ksub x dsub ints), "
        "parameter-sized — the §48 join-mode mechanism itself",
    ("similarity.py", "_int_codebook_df"):
        "ONE-ROW coarse codebook DataFrame (C x dim ints), "
        "parameter-sized — the §43 join-mode mechanism itself",
    ("membership.py", "w"):
        "Bloom filter word-table projection: at most m_bits/63 rows, "
        "m is a filter-size parameter independent of SF",
    ("classifier.py", "lut"):
        "fixed-point log table: 1023 rows by construction (LOG_LUT_SIZE)",
    ("robots.py", "rmap"): "per-host robots rule arrays; the hint is "
        "applied only under join_mode='broadcast', and 'auto' gates on "
        "a robots-table row count <= broadcast_max_hosts (2M default) "
        "with a documented shuffle mode past it",
    ("urlops.py", "bl"):
        "host blocklist rule table (flag_blocked_hosts probe joins): "
        "bounded metadata by contract, ~100 MB at the full UT1 adult list",
    ("sampling.py", "wdf"):
        "token_budget_mix mixture-weight table: one row per caller-"
        "supplied dict entry, parameter-sized by construction",
    ("corpus.py", "totals"):
        "corpus_kl_drift vocabulary/total counts: ONE-ROW aggregate "
        "(the lm.py/retrieval.py stats pattern)",
    ("corpus.py", "refc"):
        "windowed_kl_vs_reference reference distribution: a curated "
        "(token, n) table — reference-vocabulary-sized metadata, not a "
        "corpus, documented as the operator's contract",
    ("sampling.py", "al"):
        "materialize_token_mix allocation table joined onto BUCKET rows: "
        "one row per stratum (token_budget_mix output), domain-count "
        "bounded like the temperature_mix thresholds",
}


def _allowed(fname: str, name: str) -> bool:
    return (None, name) in ALLOWED or (fname, name) in ALLOWED


def _broadcast_args(path: Path):
    tree = ast.parse(path.read_text())
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        fn = node.func
        is_bc = (
            isinstance(fn, ast.Attribute) and fn.attr == "broadcast"
            and isinstance(fn.value, ast.Name) and fn.value.id == "F"
        )
        if not is_bc or not node.args:
            continue
        arg = node.args[0]
        # normalize: broadcast(x), broadcast(x.select(...)), broadcast(f(x))
        while isinstance(arg, ast.Call):
            arg = arg.func
        while isinstance(arg, ast.Attribute):
            arg = arg.value
        name = arg.id if isinstance(arg, ast.Name) else ast.dump(arg)
        yield path.name, node.lineno, name


def test_broadcast_hints_only_on_bounded_sides():
    offenders = []
    for path in sorted(SRC.rglob("*.py")):
        for fname, lineno, name in _broadcast_args(path):
            if not _allowed(fname, name):
                offenders.append(f"{fname}:{lineno} F.broadcast({name})")
    assert not offenders, (
        "F.broadcast hint on a side not proven bounded (SF-scaled tables "
        "OOM executors at scale when hint-forced; use AQE or "
        "_maybe_broadcast instead, or allowlist with a boundedness "
        "reason):\n" + "\n".join(offenders)
    )
