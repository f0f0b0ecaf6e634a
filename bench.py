#!/usr/bin/env python
"""Benchmark harness: headline engine queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Stdout protocol (VERDICT r9 #1 — the driver keeps only the last ~2000
chars, so the LAST line must stay compact): the full record (per-entry
load evidence + host block) is printed as an earlier stdout line and
written to BENCH_DETAIL.json; the FINAL line is the compact summary

  {"metric": "...", "value": <total sec>, "unit": "sec", "sf": <sf>,
   "n_queries": N, "queries": {ALL entries, 2 dp},
   "sf1": {"value": ..., "n_queries": N, "queries": {ALL entries}}}

Round-12 succession (VERDICT r11 #1): round 11's top-5-only final line
blinded the driver's per-query differ (24 false "dropped", a 4-entry
geomean), so the final line again carries EVERY entry's timing — made
to fit the tail window by shortening the metric string, rounding the
compact form to 2 dp, and dropping the detail/dir keys (all still in
BENCH_DETAIL*.json and the earlier full-record stdout line). Worst-case
length for the current 31-entry set is ~1770 < FINAL_LINE_MAX (1900),
asserted at runtime and pinned in tests/test_bench_output.py; if the
entry set ever outgrows the window, compact_summary degrades to the
slowest-K form rather than overflowing.

Each query is executed to completion (count() over the result — full
materialization, nothing cached between queries beyond the shared session
and OS page cache). A small warm-up query first so JVM/codegen startup is
not billed to the first headline entry.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Benchmarked units are the SAME callables as rounds 1-2 (stable
# cross-round comparability). Round 3 merged several contract queries for
# the driver's 50-row CORRECTNESS window, so bench binds the underlying
# per-operator functions directly instead of going through QUERIES[...]
# (e.g. rel_pricing_summary gained count-distinct columns in the contract;
# bench still times the original Q1 shape via q_pricing_summary_plain).
# cleaning chain first: it materializes the shared (memoized) hep fixture,
# so the two full-analysis numbers measure the single-pass jobs themselves.
def _headline():
    from bambooanalysis_spark.contract import approx as ca
    from bambooanalysis_spark.contract import crawl as cc
    from bambooanalysis_spark.contract import extensions as ce
    from bambooanalysis_spark.contract import hep as ch
    from bambooanalysis_spark.contract import pipeline as cp
    from bambooanalysis_spark.contract import relational as cr
    from bambooanalysis_spark.contract import scale as cs

    return {
        "hep_cleaning_chain": ch.q_cleaned_jets,
        "phase2_full_pass": ch.q_cutflow_phase2,      # 61 plots + cutflow, one job
        "jet_test_full_pass": ch.q_cutflow_jet_test,  # 66 plots + 52 selections
        "pricing_summary": cr.q_pricing_summary_plain,
        "join_revenue_by_nation": cr.q_revenue_by_nation,
        "window_topk": cr.q_window_topk_per_customer,
        "dedup_minhash_lsh": ce.q_dedup_minhash_lsh_pairs,
        "dedup_jaccard": ce.q_dedup_jaccard_pairs,
        "similarity_topk": ce.q_similarity_cosine_topk,
        "ann_ivf": ce.q_ann_ivf_topk,
        "dedup_simhash": ce.q_dedup_simhash,
        "text_stats": ce.q_text_stats,
        "events_window": ce.q_events_tumbling_window,
        # end-to-end bambooRun-analog pipeline: 2 samples x single-pass
        # phase2 job + sinks + postprocess artifacts (driver.run_pipeline)
        "pipeline_full_run": cp.pipeline_full_run,
        # round-2 additions: exact integer k-means (fit + assign, 3 jobs)
        # and the bigram-coherence corpus quality signal
        "embedding_kmeans": ce.q_embedding_kmeans,
        "bigram_coherence": ce.q_text_bigram_coherence,
        # round-3 addition: IVF-PQ with ADC shortlist + exact int8 rerank
        "ann_ivf_pq": ca.q_ann_ivf_pq_topk,
        # round-4 addition: same search served from the PERSISTED index
        # (build amortized on the warm-up run; timed runs measure the
        # query-only serving path — the 100 TB lifecycle)
        "ann_ivf_pq_served": ca.q_ann_ivf_pq_served,
        # round-3 batch 5/6: BM25 lexical retrieval (postings join) and
        # gap-filled time-series resampling (1.05M-row hourly grid at sf0.1)
        "bm25_topk": ca.q_retrieval_bm25_topk,
        "resample_ffill": ce.q_events_resample_ffill,
        # round-6 additions: the Q7-shape 6-relation join-reordering
        # stress and the CCNet-style train/apply bigram-LM quality scorer
        "volume_shipping": ca.q_rel_volume_shipping,
        "lm_quality": ca.q_text_lm_quality,
        # round-7 addition (VERDICT r6 #8): the 100TB-default dedup path
        # (star-expanded near-dup clustering) tracked round-over-round in
        # the standing bench, not only in the sf10 rehearsals
        "dedup_clusters_capped": ce.q_dedup_near_dup_clusters,
        # round-9 addition (VERDICT r8 #7): the NB quality classifier —
        # the newest non-trivial multi-join pipeline (explode + 2
        # broadcasts + shuffled-hash + window argmax), entry 24
        "nb_predict": ca.q_text_nb_predict,
        # round-10 addition (VERDICT r9 #6): the distributed Bloom filter
        # lifecycle (build explode+bit_or aggregate, then the k-broadcast
        # probe over the full corpus), entry 25
        "bloom_probe": ca.q_dedup_bloom_membership,
        # round-10 addition: UT1-style host blocklist filtering — the
        # newest zero-corpus-shuffle probe op (3 bounded broadcast joins
        # + one hash-aggregate over the corpus), entry 26
        "url_blocklist": ca.q_text_url_blocklist,
        # round-10 addition: benchmark decontamination (5-gram hash
        # explode + broadcast bench keys + anti-join keep decision) —
        # a core pretrain family previously untracked round-over-round,
        # entry 27
        "decontaminate": ce.q_pretrain_decontamination,
        # round-10 addition: the token-budget mixture solver — one
        # map-side-combined corpus aggregate, then BIGINT water-filling
        # over the strata table (the mixture-design step every
        # multi-source pretraining corpus runs before sampling), entry 28
        "token_mix": ca.q_sampling_token_budget_mix,
        # round-11 addition (VERDICT r10 #1): the crawl-to-shards
        # end-to-end chain — WET parse -> robots -> blocklist -> quality
        # -> LSH dedup + keep-best -> token mix -> shard export +
        # read-back, entry 29 (the WET fixture is memoized per sf dir,
        # so warm runs time the pipeline, not fixture synthesis)
        "crawl_to_shards": cc.pipeline_crawl_to_shards,
        # round-11 continuation: the Arrow-vectorized winnow twin
        # (PERFORMANCE §70 — 15-18x over the interpreted HOF at
        # 10x/100x; standing entry so the ratio and the Arrow-path cost
        # stay tracked round-over-round), entry 30
        "winnow_arrow": ca.q_text_winnow_fingerprints_arrow,
        # round-11 continuation: the mergeable HDR quantile sketch
        # (parity-shard build + merge + read-off — the quantile member
        # of the sketch family), entry 31
        "hdr_quantiles": cs.q_sketch_hdr_quantiles,
    }


# --- load accounting (VERDICT r8 #1) -----------------------------------------
# Three consecutive rounds the driver-harness sf1 section printed 1.2-1.6x
# "regressions" that solo re-pins attributed to mid-run load on the shared
# host. The artifact now carries the evidence per entry:
#   * ts + load1 (os.getloadavg) at entry start — the judge-prescribed
#     fields. NOTE load1 alone cannot separate neighbor load from the
#     bench's OWN 32-thread Spark work (a 1-minute EWMA stays elevated the
#     whole run), so the FLAG is driven by...
#   * ext_cores: external busy CPU over the entry's timed window, from
#     /proc/stat total-busy minus this python + its child JVM's jiffies —
#     cores consumed by OTHER processes while this entry ran.
# An entry whose first pass sees ext_cores > LOAD_EXT_CORES re-runs its
# timed loop once (best-of across all draws) and is marked retried; if
# the retry window is ALSO contended it is marked load_flagged so the
# judge can see which numbers were taken under contention.

LOAD_EXT_CORES = float(os.environ.get("SPARK_GRAFT_LOAD_CORES", "2.0"))
_HZ = os.sysconf("SC_CLK_TCK")


def _proc_busy_jiffies() -> int:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()[1:]
    vals = [int(x) for x in parts]
    # user..steal only (self-review r9): the trailing guest/guest_nice
    # fields are ALREADY folded into user/nice by the kernel — summing
    # them double-counts VM time and spuriously flags entries
    return sum(vals[:8]) - vals[3] - vals[4]  # minus idle + iowait


def _tree_pids() -> list[str]:
    """This python plus ALL its descendants (the py4j-launched JVM and —
    self-review r9 — any pyspark python workers it forks: grandchildren's
    jiffies reach the JVM's cutime only at reap, usually after the
    window, so counting only direct children would misattribute our own
    ArrowEval work to 'external' load)."""
    children: dict[str, list[str]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                rest = fh.read().rsplit(")", 1)[1].split()
            children.setdefault(rest[1], []).append(pid)
        except OSError:
            continue
    pids, queue = ["self"], [str(os.getpid())]
    while queue:
        for kid in children.get(queue.pop(), []):
            pids.append(kid)
            queue.append(kid)
    return pids


def _tree_jiffies(pids: list[str]) -> int:
    total = 0
    for pid in pids:
        try:
            with open(f"/proc/{pid}/stat") as fh:
                rest = fh.read().rsplit(")", 1)[1].split()
            # utime + stime + cutime + cstime (fields 14-17)
            total += int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
        except OSError:
            continue
    return total


class _ExtLoad:
    """External busy cores averaged over a measurement window."""

    def __enter__(self):
        self.pids = _tree_pids()
        self.t0 = time.monotonic()
        self.busy0 = _proc_busy_jiffies()
        self.self0 = _tree_jiffies(self.pids)
        return self

    def __exit__(self, *exc):
        dt = max(time.monotonic() - self.t0, 1e-3)
        # re-scan the tree at window END and union with the enter-time
        # list (ADVICE r9): a pyspark python worker forked MID-window is
        # absent from the enter list, so its jiffies would count as
        # external load — the exact misattribution this class exists to
        # avoid. New pids start at 0 jiffies, so a missing t0 baseline
        # only under-counts our own work by the pre-fork slice (safe
        # direction: never inflates ext).
        pids = sorted(set(self.pids) | set(_tree_pids()))
        ext = (_proc_busy_jiffies() - self.busy0) - (
            _tree_jiffies(pids) - self.self0
        )
        self.cores = max(ext, 0) / _HZ / dt


def _time_queries(
    spark, sf_dir: str, n_timed: int, tag: str
) -> tuple[dict[str, float], dict[str, dict]]:
    """BASELINE.md protocol: warm timings (cold runs on this shared host
    swing 5-7x with page-cache/JIT/neighbor noise). One warm-up execution
    per query, then the best of ``n_timed`` timed runs — plus one extra
    retry round when the first window was externally contended."""
    timings: dict[str, float] = {}
    load: dict[str, dict] = {}
    for label, fn in _headline().items():
        ts = time.time()
        load1 = os.getloadavg()[0]
        n = fn(spark, sf_dir).count()  # warm-up: JIT + page cache

        def _draws(k: int) -> float:
            best = None
            for _ in range(k):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return best

        with _ExtLoad() as w1:
            best = _draws(n_timed)
        retried = w1.cores > LOAD_EXT_CORES
        flagged = False
        ext = w1.cores
        if retried:
            with _ExtLoad() as w2:
                best = min(best, _draws(n_timed))
            flagged = w2.cores > LOAD_EXT_CORES
            ext = min(ext, w2.cores)
        timings[label] = round(best, 3)
        load[label] = {
            "ts": round(ts, 1),
            "load1": round(load1, 2),
            "ext_cores": round(ext, 2),
            "retried": retried,
            "load_flagged": flagged,
        }
        note = " LOAD-FLAGGED" if flagged else (" retried" if retried else "")
        print(
            f"# {tag}{label}: {timings[label]:.3f}s warm ({n} rows, "
            f"load1={load1:.1f}, ext={ext:.2f} cores){note}",
            file=sys.stderr,
        )
    return timings, load


def _sf1_dir() -> str | None:
    """Standing 10x scale pass (round-5 task #6): the sf1 rehearsal fixture
    (scripts/make_scale_data.py, FK-preserving 10x replication of sf0.1)
    is benched EVERY round so scaling ratios are tracked round-over-round,
    not re-derived. Built on first use; disable with SPARK_GRAFT_SF1=0."""
    if os.environ.get("SPARK_GRAFT_SF1", "1") == "0":
        return None
    d = os.environ.get(
        "SPARK_GRAFT_SF1_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scale", "sf1"),
    )
    if not os.path.exists(os.path.join(d, "lineitem.parquet")):
        import subprocess

        r = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                          "scripts", "make_scale_data.py"), "10", d],
            capture_output=True,
        )
        if r.returncode != 0:
            print(f"# sf1 build failed, skipping 10x pass: {r.stderr[-300:]}",
                  file=sys.stderr)
            return None
    return d


# The driver records only the last ~2000 chars of stdout; round 9's
# single output line grew to ~7k chars once the per-entry load fields
# landed, so BENCH_r09.json came back "parsed": null (VERDICT r9 #1).
# The FINAL line is now a compact summary hard-capped below this bound
# (assert + tests/test_bench_output.py); the load/host evidence goes to
# an EARLIER stdout line and the BENCH_DETAIL.json sidecar.
FINAL_LINE_MAX = 1900


COMPACT_TOP_K = 5  # slowest entries kept in the OVERFLOW fallback only

# The compact form's metric string: the full descriptive metric (~110
# chars) lives in BENCH_DETAIL*.json and the earlier full-record line.
COMPACT_METRIC = "headline engine queries"


def compact_summary(out: dict) -> dict:
    """The final-stdout-line subset — EVERY entry's timing (VERDICT r11
    #1: the driver's PERF differ reads only this line; round 11's
    slowest-K form produced 24 false "dropped" entries). Fits the tail
    window via a short metric string, 2-dp rounding, and no detail/dir
    keys. If the entry set ever outgrows FINAL_LINE_MAX, degrade to the
    slowest-K form (still parseable) instead of overflowing the window.
    """

    def _slim(qs_fn) -> dict:
        slim = {
            "metric": COMPACT_METRIC,
            "value": out["value"],
            "unit": out["unit"],
            "sf": out["sf"],
            "n_queries": len(out["queries"]),
            "queries": qs_fn(out["queries"]),
        }
        if "sf1" in out:
            slim["sf1"] = {
                "value": out["sf1"]["value"],
                "n_queries": len(out["sf1"]["queries"]),
                "queries": qs_fn(out["sf1"]["queries"]),
            }
        return slim

    def full(qs: dict) -> dict:
        return {k: round(v, 2) for k, v in qs.items()}

    def slowest(qs: dict) -> dict:
        return dict(sorted(full(qs).items(), key=lambda kv: -kv[1])[:COMPACT_TOP_K])

    slim = _slim(full)
    if len(json.dumps(slim)) >= FINAL_LINE_MAX:
        slim = _slim(slowest)
    return slim


def main() -> None:
    from bambooanalysis_spark.session import get_spark

    spark = get_spark("bamboo-bench")
    # warm-up: JVM, parquet footer reads, codegen
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()

    timings, load = _time_queries(spark, SF_DIR, n_timed=2, tag="")

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline engine queries (phaseII/jet_test single-pass analyses, "
        "relational joins/windows, dedup, similarity, text, event windows)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "load": load,
        "host": {
            "ncpu": os.cpu_count(),
            "start_load": [round(x, 2) for x in os.getloadavg()],
            "ext_cores_threshold": LOAD_EXT_CORES,
        },
        "sf": float(sf),
    }

    # 10x scale table in the same JSON line. Best-of-2 timed runs after
    # warm-up (§42): the sf1 section ran n_timed=1 through round 7, and
    # two consecutive rounds the judge flagged 1.3-1.4x "regressions"
    # that n>=5 solo re-pins then attributed to single-draw noise
    # (§34: jet_test/minhash; §42: pipeline_full_run/embedding_kmeans).
    # The ~75s of extra wall per round is cheaper than a judge-flagged
    # false drift every round. Run bench SOLO — concurrent Spark
    # sessions on the same 32 cores inflate every entry ~1.5-2x (§28).
    #
    # The sf1 section runs in a FRESH SparkSession (§34): by the time it
    # starts, the shared session has executed 20+ sf0.1 entries whose
    # cached state (LM vocab, CC checkpoints, IVF cells) squeezes the
    # execution-memory region and inflated r6's sf1 tail entries 1.4-1.6x
    # — the §33 mechanism recurring inside the standing bench itself.
    sf1 = _sf1_dir()
    if sf1:
        spark.stop()
        spark = get_spark("bamboo-bench-sf1")
        spark.read.parquet(f"{sf1}/nation.parquet").count()
        t1, load1 = _time_queries(spark, sf1, n_timed=2, tag="sf1/")
        out["sf1"] = {
            "value": round(sum(t1.values()), 3),
            "queries": t1,
            "load": load1,
            "dir": sf1,
        }

    # full record (incl. per-entry load + host) -> sidecar files AND an
    # earlier stdout line; the LAST line stays inside the driver's tail
    # window so BENCH_r{N}.json parses (VERDICT r9 #1). The sidecar is
    # ALSO written keyed by core count (VERDICT r11 #7): the driver's
    # 8-core scaling pass used to clobber the 32-core per-entry record,
    # so BENCH_DETAIL_c8.json and BENCH_DETAIL_c32.json now coexist.
    here = os.path.dirname(os.path.abspath(__file__))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    for name in ("BENCH_DETAIL.json", f"BENCH_DETAIL_c{cpus}.json"):
        with open(os.path.join(here, name), "w") as fh:
            json.dump(out, fh)
    print(json.dumps(out))
    final = json.dumps(compact_summary(out))
    assert len(final) < FINAL_LINE_MAX, (
        f"final bench line {len(final)} chars >= {FINAL_LINE_MAX}: "
        "trim entry labels or move fields to BENCH_DETAIL.json"
    )
    print(final)


if __name__ == "__main__":
    main()
