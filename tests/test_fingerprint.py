"""Winnowing fingerprints (operators/fingerprint.py): hand-computed
tiny cases, an independent pure-Python reference sweep, the shared
guarantee (common substring >= k+w-1 -> shared fingerprint), edge
cases, and plan shape."""

import random

import pytest
from pyspark.sql import functions as F

from bambooanalysis_spark.operators import fingerprint as W


# --- independent reference (no shared code with the SQL template) -----------


def _ref_hashes(s: str, k: int) -> list[int]:
    out = []
    for i in range(len(s) - k + 1):
        h = 0
        for c in s[i:i + k]:
            h = h * W.B + ord(c)
        out.append(h % W.M)
    return out


def _ref_winnow(s: str, k: int, w: int) -> set[tuple[int, int]]:
    """(1-based position, hash) pairs selected by rightmost-min
    winnowing — straight from the paper's definition: every window of w
    consecutive gram hashes selects its rightmost minimum."""
    hs = _ref_hashes(s, k)
    m = len(hs)
    if m == 0:
        return set()
    sel = set()
    for t in range(0, max(m - w, 0) + 1):
        win = hs[t:t + w]
        mn = min(win)
        # rightmost occurrence of the min
        p = t + max(i for i, v in enumerate(win) if v == mn)
        sel.add((p + 1, hs[p]))
    return sel


def _squash(text: str) -> str:
    return "".join(c for c in text.lower() if c.isalnum())


def _spark_winnow(spark, texts, k=7, w=4):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = W.winnow_fingerprints(df, k=k, w=w)
    got: dict[int, set] = {i: set() for i in range(len(texts))}
    for r in out.collect():
        got[r["doc_id"]].add((r["pos"], r["fp_hash"]))
    return got


def test_winnow_matches_hand_computed_tiny():
    """k=2, w=2 over 'abcab' squashed: grams ab bc ca ab; windows pick
    rightmost minima — verified by the reference and by hand: hashes
    h(ab)=(97*257+98)%M, repeats at positions 1 and 4."""
    s = "abcab"
    hs = _ref_hashes(s, 2)
    assert hs[0] == hs[3] == (97 * 257 + 98) % W.M
    sel = _ref_winnow(s, 2, 2)
    # window[ab,bc]->ab@1; [bc,ca]->min(h(bc),h(ca)); [ca,ab]->ab@4
    assert (1, hs[0]) in sel and (4, hs[0]) in sel


def test_winnow_spark_equals_reference_random(spark):
    rnd = random.Random(20260815)
    alpha = "abcdef 01!"
    texts = [
        "".join(rnd.choice(alpha) for _ in range(rnd.randrange(0, 120)))
        for _ in range(60)
    ]
    got = _spark_winnow(spark, texts, k=7, w=4)
    for i, t in enumerate(texts):
        assert got[i] == _ref_winnow(_squash(t), 7, 4), (i, t)


def test_winnow_shared_substring_guarantee(spark):
    """The paper's guarantee: a common substring of length >= k+w-1
    (here 10) always yields at least one shared fingerprint hash."""
    rnd = random.Random(7)
    common = "thequickbrownfox"  # 16 >= 10
    texts = []
    for i in range(20):
        pre = "".join(rnd.choice("xyz") for _ in range(rnd.randrange(0, 30)))
        post = "".join(rnd.choice("uvw") for _ in range(rnd.randrange(0, 30)))
        texts.append(pre + common + post)
    got = _spark_winnow(spark, texts, k=7, w=4)
    sets = [set(h for _, h in got[i]) for i in range(20)]
    base = sets[0]
    for s in sets[1:]:
        assert base & s, "guaranteed shared fingerprint missing"


def test_winnow_edge_cases(spark):
    texts = ["", "ab", "exactly", "ALL CAPS &&& 123", None]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = W.winnow_fingerprints(df, k=7, w=4).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 0 not in by_doc and 1 not in by_doc  # shorter than k
    assert len(by_doc[2]) == 1  # exactly one gram -> one fingerprint
    assert 3 in by_doc  # squashes to 'allcaps123' (10 chars, 4 grams)
    assert 4 not in by_doc  # NULL text -> no rows


def test_winnow_overlap_pairs_planted(spark):
    rnd = random.Random(99)
    shared = "winnowingfindsthissharedrun"
    texts = []
    for i in range(30):
        noise = "".join(rnd.choice("pqrs") for _ in range(40))
        texts.append(noise + (shared if i in (3, 11, 27) else "") +
                     "".join(rnd.choice("lmno") for _ in range(40)))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    pairs = {
        (r["i"], r["j"])
        for r in W.winnow_overlap_pairs(df, min_shared=2).collect()
    }
    assert {(3, 11), (3, 27), (11, 27)} <= pairs
    # noise-only docs don't pair up at min_shared=2
    assert all(i in (3, 11, 27) and j in (3, 11, 27) for i, j in pairs)


def test_winnow_plan_no_python_no_shuffle_before_agg(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], "doc_id long, text string")
    plan = (
        W.winnow_fingerprints(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_winnow_exploded_identity(spark):
    """The window-function formulation must select EXACTLY the same
    (doc, pos, hash) set as the HOF path — including rightmost
    tie-breaks, short docs (m < w), and repeated selections collapsing
    to one row."""
    rnd = random.Random(31337)
    alpha = "abcd x9"
    texts = ["", "ab", "exactly"] + [
        "".join(rnd.choice(alpha) for _ in range(rnd.randrange(0, 150)))
        for _ in range(80)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = {(r["doc_id"], r["pos"], r["fp_hash"])
         for r in W.winnow_fingerprints(df, k=5, w=3).collect()}
    b = {(r["doc_id"], r["pos"], r["fp_hash"])
         for r in W.winnow_fingerprints_exploded(df, k=5, w=3).collect()}
    assert a == b
    assert len(a) > 500  # the sweep actually exercised real content


def test_winnow_numpy_identity(spark):
    """The Arrow/numpy formulation must select EXACTLY the same
    (doc, pos, hash) set as the HOF path — same sweep as the exploded
    identity gate (ties, m < w, NULLs, empty docs) plus a NULL-text row
    and mixed-case/punctuation squash checks."""
    rnd = random.Random(4242)
    alpha = "abcd x9"
    texts = ["", "ab", "exactly", "A-B! c9  d#E", None] + [
        "".join(rnd.choice(alpha) for _ in range(rnd.randrange(0, 150)))
        for _ in range(80)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = {(r["doc_id"], r["pos"], r["fp_hash"])
         for r in W.winnow_fingerprints(df, k=5, w=3).collect()}
    b = {(r["doc_id"], r["pos"], r["fp_hash"])
         for r in W.winnow_fingerprints_numpy(df, k=5, w=3).collect()}
    assert a == b
    assert len(a) > 500
    # default (k=7, w=4) geometry too, on the fixture-like mixed texts
    a7 = {(r["doc_id"], r["pos"], r["fp_hash"])
          for r in W.winnow_fingerprints(df).collect()}
    b7 = {(r["doc_id"], r["pos"], r["fp_hash"])
          for r in W.winnow_fingerprints_numpy(df).collect()}
    assert a7 == b7


def test_df_histogram_hand_computed_and_consistent(spark):
    """Planted corpus: doc 0 == doc 1 == doc 2 (a 3-family), doc 3
    unique. Every shared fingerprint of the family has df=3 (identical
    squashed text -> identical selection); doc 3's prints have df=1
    unless they collide with the family's. The histogram must also be
    globally consistent: sum(n_postings) == total distinct (doc, hash)
    postings."""
    from pyspark.sql import functions as F

    from bambooanalysis_spark.operators.fingerprint import (
        fingerprint_df_histogram,
        winnow_fingerprints,
    )

    fam = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(0, fam), (1, fam), (2, fam),
         (3, "completely different words with zero overlap here xyzzy")],
        "doc_id long, text string",
    )
    hist = {r["df"]: (r["n_hashes"], r["n_postings"])
            for r in fingerprint_df_histogram(docs).collect()}
    assert 3 in hist and hist[3][0] > 0  # the family's shared prints
    assert 1 in hist                      # doc 3's unique prints
    assert all(df in (1, 3) for df in hist)
    total_postings = (
        winnow_fingerprints(docs).select("doc_id", "fp_hash").distinct()
        .count()
    )
    assert sum(p for _, p in hist.values()) == total_postings
    for df, (n, p) in hist.items():
        assert p == df * n


def test_winnow_numpy_string_ids(spark):
    """The three impls behind _fingerprint_impl are interchangeable —
    the numpy path must accept non-long doc ids like the HOF path does."""
    df = spark.createDataFrame(
        [("doc-a", "the quick brown fox jumps over the lazy dog today"),
         ("doc-b", "too short")],
        "doc_id string, text string",
    )
    a = {(r["doc_id"], r["pos"], r["fp_hash"])
         for r in W.winnow_fingerprints(df).collect()}
    b = {(r["doc_id"], r["pos"], r["fp_hash"])
         for r in W.winnow_fingerprints_numpy(df).collect()}
    assert a == b and len(a) > 0
