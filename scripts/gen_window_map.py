"""Generate the driver-window registration map for COVERAGE.md.

The driver's CORRECTNESS harness records the first 50 registered contract
queries; everything after relies on the identical in-repo oracle gate
(tests/test_contract_oracle.py) or, for approximate/non-SQL operators, a
named recall/error/property test. This script renders that mapping as a
markdown table from the LIVE registry, so COVERAGE.md can never drift
from the code: `tests/test_registration_window.py::
test_coverage_window_map_current` regenerates the block and asserts the
committed file matches. Regenerate with:

    python scripts/gen_window_map.py --write
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BEGIN = "<!-- BEGIN GENERATED: driver-window map (scripts/gen_window_map.py) -->"
END = "<!-- END GENERATED: driver-window map -->"
COVERAGE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")

DRIVER_WINDOW = 50

# Bounding gate for each rows-only (approximate / non-SQL-expressible)
# query. test_registration_window.py asserts this dict covers EXACTLY the
# registered rows-only set, so a new rows-only query cannot ship without
# naming its gate here.
ROWS_ONLY_GATES: dict[str, str] = {
    "sketch_approx_distinct": "test_extensions.py::test_sketch_approx_distinct_error_bound",
    "sketch_approx_quantiles": "test_extensions.py::test_approx_quantiles_error_bound",
    "ann_lsh_topk": "test_extensions.py::test_ann_lsh_multiprobe_recall",
    "ann_ivf_topk": "test_extensions.py::test_ivf_topk_recall_vs_bruteforce",
    "ann_ivf_quantized_topk": "test_extensions.py::test_ann_ivf_quantized_recall",
    "ann_ivf_pq_topk": "test_extensions.py::test_ann_ivf_pq_recall",
    "ann_ivf_pq_served": "test_extensions.py::test_ivf_pq_persisted_index_matches_inmemory (+ append==full-build)",
    "text_bpe_encode": "test_extensions.py::test_bpe_train_hand_computed (+ encode reconstruction/determinism)",
    "retrieval_bm25_topk": "test_retrieval.py::test_bm25_matches_python_reference (1e-12)",
    "retrieval_hybrid_rrf": "test_retrieval.py::test_rrf_fuse_hand_computed (+ real-ranker fusion)",
    "text_compression_ratio": "test_retrieval.py::test_compression_ratio_signal",
    "sampling_weighted": "test_retrieval.py::test_weighted_sample_aes_properties",
    "embedding_pca_project": "test_scale_ops.py::test_pca_fit_matches_numpy_reference (+ projection parity, orthonormality/variance/sign properties)",
    "embedding_pca_ivf_topk": "test_scale_ops.py::test_ivf_topk_pca_full_probe_equals_brute_force (+ schema/routing test; recall curve PERFORMANCE.md §36)",
    "sketch_kmv_set_ops": "test_scale_ops.py::test_kmv_error_bounds (+ exact-when-not-full, union mergeability)",
}


def render() -> str:
    from bambooanalysis_spark.contract import ORACLES, QUERIES

    names = list(QUERIES)
    lines = [BEGIN, ""]
    lines.append(
        f"Registry at generation time: **{len(names)} queries, "
        f"{len(ORACLES)} DuckDB oracles**. Slots 1-{DRIVER_WINDOW} are the "
        "driver's CORRECTNESS window (hash-checked per round); positions "
        f"{DRIVER_WINDOW + 1}+ get the identical in-repo gate "
        "(`tests/test_contract_oracle.py`) or the named bounding test."
    )
    lines += ["", "| slot | query | correctness gate |", "|---|---|---|"]
    for i, n in enumerate(names, 1):
        if n in ORACLES:
            gate = (
                "driver DuckDB oracle (hash)"
                if i <= DRIVER_WINDOW
                else "in-repo DuckDB oracle (hash) — test_contract_oracle.py"
            )
        else:
            gate = f"rows-only; bounded by `{ROWS_ONLY_GATES[n]}`"
        lines.append(f"| {i} | `{n}` | {gate} |")
    lines += ["", END]
    return "\n".join(lines)


def write() -> None:
    text = open(COVERAGE).read()
    block = render()
    if BEGIN in text:
        pre = text.split(BEGIN)[0]
        post = text.split(END, 1)[1]
        text = pre + block + post
    else:
        text = text.rstrip() + "\n\n## Driver-window registration map (generated)\n\n" + block + "\n"
    with open(COVERAGE, "w") as f:
        f.write(text)


if __name__ == "__main__":
    if "--write" in sys.argv:
        write()
        print(f"updated {COVERAGE}")
    else:
        print(render())
