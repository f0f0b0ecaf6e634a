"""The driver's bench gate reads only the last ~2000 stdout chars;
round 9's single 7k-char line made BENCH_r09.json unparseable (VERDICT
r9 #1). Pin that the compact final line can NEVER outgrow the window,
even at worst-case timing widths, for the CURRENT set of headline
entries — adding entries that push past the cap must fail here, not in
the driver's artifact."""

import json

import bench


def _worst_case_final_line() -> str:
    # every timing at its widest plausible rendering (5-digit seconds,
    # 3 decimals — an entry slower than 99999s would be a dead bench)
    labels = list(bench._headline().keys())
    timings = {k: 99999.999 for k in labels}
    out = {
        "metric": "headline engine queries (phaseII/jet_test single-pass "
        "analyses, relational joins/windows, dedup, similarity, text, "
        "event windows)",
        "value": 999999.999,
        "unit": "sec",
        "queries": timings,
        "load": {k: {"ts": 1e9, "load1": 99.99, "ext_cores": 99.99,
                     "retried": True, "load_flagged": True} for k in labels},
        "host": {"ncpu": 32, "start_load": [99.99] * 3,
                 "ext_cores_threshold": 2.0},
        "sf": 0.1,
        "sf1": {
            "value": 999999.999,
            "queries": dict(timings),
            "load": {},
            "dir": "/root/repo/.scale/sf1",
        },
    }
    return json.dumps(bench.compact_summary(out))


def test_final_line_fits_driver_tail_window():
    line = _worst_case_final_line()
    assert len(line) < bench.FINAL_LINE_MAX, (
        f"{len(line)} chars: the driver tail window truncates this — "
        "shorten labels or move fields to BENCH_DETAIL.json"
    )


def test_compact_summary_drops_load_and_host():
    d = json.loads(_worst_case_final_line())
    assert set(d) == {"metric", "value", "unit", "queries", "sf", "sf1"}
    assert set(d["sf1"]) == {"value", "queries", "dir"}
    # every headline entry still visible in the compact line
    assert set(d["queries"]) == set(bench._headline().keys())
