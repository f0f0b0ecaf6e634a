"""Pins the driver-window registration policy (contract/__init__.py).

The driver's CORRECTNESS harness records exactly the FIRST 50 registered
queries. Round 2 shipped 75 registrations and the 25 newest fell outside the
window (VERDICT r2 "Next round" #1). The round-3 contract guarantees:

- every oracle-checked query sits inside positions 1-50;
- position 50 is pipeline_full_run (rows-only end-to-end wiring check);
- only approximate rows-only queries (each bounded by a named recall/error
  unit test) register after the window.

If a future round adds an oracle-checked query, this test forces the
author to either merge an existing demonstration or consciously revisit
the policy — never to silently push a hash-checked query out of the
driver's visibility.
"""

DRIVER_WINDOW = 50


def test_all_oracle_checked_queries_inside_driver_window():
    from bambooanalysis_spark.contract import ORACLES, QUERIES

    names = list(QUERIES)
    window = names[:DRIVER_WINDOW]
    outside = names[DRIVER_WINDOW:]
    missing = [n for n in ORACLES if n not in window]
    assert not missing, (
        f"oracle-checked queries outside the driver's first-{DRIVER_WINDOW} "
        f"window: {missing} — merge demonstrations or revisit the policy"
    )
    # everything past the window is approximate-by-design (no oracle)
    assert all(n not in ORACLES for n in outside), outside


def test_window_composition():
    from bambooanalysis_spark.contract import ORACLES, QUERIES

    names = list(QUERIES)
    window = names[:DRIVER_WINDOW]
    # exactly one rows-only slot inside the window: the flagship end-to-end
    # pipeline wiring check
    rows_only_in_window = [n for n in window if n not in ORACLES]
    assert rows_only_in_window == ["pipeline_full_run"]
    # the approximate family is registered, just after the window
    for n in ("sketch_approx_distinct", "ann_lsh_topk", "ann_ivf_topk",
              "ann_ivf_quantized_topk"):
        assert n in names and names.index(n) >= DRIVER_WINDOW, n
