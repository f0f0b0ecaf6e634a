"""The driver's bench gate reads only the last ~2000 stdout chars;
round 9's single 7k-char line made BENCH_r09.json unparseable (VERDICT
r9 #1), and round 11's slowest-K-only final line blinded the driver's
per-query differ (24 false "dropped" entries, VERDICT r11 #1). The
round-12 final line carries EVERY entry again — short metric, 2 dp, no
detail/dir keys — pinned here at worst-case rendering for the CURRENT
entry set, with an overflow fallback (slowest-K) that keeps the line
parseable if the entry set ever outgrows the window."""

import json

import bench


def _out_for(labels) -> dict:
    # every timing at its widest plausible rendering: an entry slower
    # than 999 s or a section slower than 9999 s would be a dead bench
    timings = {k: 999.994 for k in labels}
    return {
        "metric": "headline engine queries (phaseII/jet_test single-pass "
        "analyses, relational joins/windows, dedup, similarity, text, "
        "event windows)",
        "value": 9999.994,
        "unit": "sec",
        "queries": timings,
        "load": {k: {"ts": 1e9, "load1": 99.99, "ext_cores": 99.99,
                     "retried": True, "load_flagged": True} for k in labels},
        "host": {"ncpu": 32, "start_load": [99.99] * 3,
                 "ext_cores_threshold": 2.0},
        "sf": 0.1,
        "sf1": {
            "value": 9999.994,
            "queries": dict(timings),
            "load": {},
            "dir": "/root/repo/.scale/sf1",
        },
    }


def test_final_line_fits_driver_tail_window():
    line = json.dumps(bench.compact_summary(_out_for(bench._headline())))
    assert len(line) < bench.FINAL_LINE_MAX, (
        f"{len(line)} chars: the driver tail window truncates this — "
        "shorten labels or move fields to BENCH_DETAIL.json"
    )


def test_final_line_carries_every_entry():
    # VERDICT r11 #1: the driver's PERF differ reads ONLY the final
    # line; every standing entry's timing must be present in both
    # sections or the differ reports false "dropped" entries.
    labels = list(bench._headline())
    d = json.loads(json.dumps(bench.compact_summary(_out_for(labels))))
    assert sorted(d["queries"]) == sorted(labels)
    assert sorted(d["sf1"]["queries"]) == sorted(labels)
    assert d["n_queries"] == len(labels)
    assert d["sf1"]["n_queries"] == len(labels)


def test_overflow_falls_back_to_slowest_k_not_truncation():
    # If the entry set ever outgrows the window, the final line must
    # degrade to the slowest-K form (parseable) instead of overflowing.
    labels = [f"some_longish_entry_label_{i:03d}" for i in range(200)]
    line = json.dumps(bench.compact_summary(_out_for(labels)))
    assert len(line) < bench.FINAL_LINE_MAX
    d = json.loads(line)
    assert d["n_queries"] == 200
    assert len(d["queries"]) == bench.COMPACT_TOP_K
    assert len(d["sf1"]["queries"]) == bench.COMPACT_TOP_K


def test_compact_summary_shape():
    d = json.loads(json.dumps(bench.compact_summary(_out_for(["a", "b"]))))
    assert set(d) == {
        "metric", "value", "unit", "queries", "sf", "sf1", "n_queries",
    }
    assert set(d["sf1"]) == {"value", "queries", "n_queries"}
    # 2-dp rounding is part of the length budget
    assert d["queries"]["a"] == 999.99
