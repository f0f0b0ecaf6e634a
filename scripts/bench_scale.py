#!/usr/bin/env python
"""100x scale rehearsal (round-6): run the headline bench entries at an
N-fold fixture (default .scale/sf10 = 100x the sf0.1 driver fixture,
built by make_scale_data.py) and emit one JSON line shaped like bench.py's
sf1 section, for PERFORMANCE.md's sf0.1 -> sf1 -> sf10 scaling table.

Protocol: each query runs twice in its OWN fresh SparkSession — the
FIRST execution is reported as ``cold`` (it carries the one-time costs a
production deployment amortizes: fixture cache builds, persisted-index
builds, JIT), the SECOND as ``queries`` (warm — steady-state serving).
Per-entry sessions, not one shared session: earlier entries' pinned
caches/checkpoints otherwise starve later entries' execution memory
(4-10x tail inflation, PERFORMANCE.md §33). Single draws either way:
+/-15% (PERFORMANCE.md §27); re-pin surprises at n>=3.

Exclusions, by design rather than omission (logged in the JSON):
- dedup_jaccard / dedup_minhash_lsh: EXACT all-pairs enumeration — the
  OUTPUT is what grows superlinearly (§23/§26: output-bound, not
  plan-bound). At 100x the correct production path is the capped/cluster
  one, benched here as dedup_clusters_capped (near_dup_clusters +
  lsh_first_claim_keeps, star-capped buckets, §30).

Run SOLO (concurrent Spark sessions fake 1.4-2x regressions, §28).
Usage: python scripts/bench_scale.py [dir] [label]
         [--only name1,name2] [--out FILE]

--only runs a subset of entries; --out MERGES the run's sections into
FILE (creating it if absent), so a long rehearsal can be executed as
several sequential solo chunks and still produce one artifact (r11: the
full 37-entry sf10 pass exceeds a single supervised invocation window).
--single runs each entry ONCE and records it under the cold section only
(for entries whose cold+warm pair exceeds a supervision window); the
warm/queries section omits the entry rather than faking a steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The 8g default heap is an sf0.1 tuning (PERFORMANCE.md: big heaps lose
# to GC on the wide-codegen passes at small inputs). At 100x the cached
# hep fixture + 32 concurrent task unrolls OOM an 8g JVM — a real
# cluster's executors would carry tens of GB each, so the rehearsal gets
# a heap sized like one (the box has 128 GiB).
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

EXCLUDED = {
    "dedup_jaccard": "exact all-pairs output is quadratic-prone; scale path benched as dedup_clusters_capped",
    "dedup_minhash_lsh": "exact in-bucket pair enumeration; scale path benched as dedup_clusters_capped",
}


def main() -> None:
    args = list(sys.argv[1:])
    only: set[str] | None = None
    out_file: str | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out_file = args[i + 1]
        del args[i : i + 2]
    single = "--single" in args  # one execution, recorded as cold only
    if single:
        args.remove("--single")
    sf_dir = args[0] if len(args) > 0 else ".scale/sf10"
    label = args[1] if len(args) > 1 else "sf10"
    if not os.path.exists(os.path.join(sf_dir, "lineitem.parquet")):
        raise SystemExit(f"fixture missing: {sf_dir} (run make_scale_data.py first)")

    import bench
    from bambooanalysis_spark.contract import approx as ca
    from bambooanalysis_spark.contract import extensions as ce
    from bambooanalysis_spark.session import get_spark

    queries = dict(bench._headline())
    for k in EXCLUDED:
        queries.pop(k, None)
    queries["dedup_clusters_capped"] = ce.q_dedup_near_dup_clusters
    # round-9 (VERDICT r8 #8): the URL pipeline ops claimed 100TB-ready in
    # r8 get measured 100x evidence like every other family (nb_predict
    # arrives via bench._headline, which gained it as entry 24)
    queries["url_dedup"] = ca.q_text_url_dedup
    queries["url_domain_stats"] = ca.q_text_url_domain_stats
    queries["url_registered_domain_psl"] = ca.q_text_url_registered_domain_psl
    # round-11 (VERDICT r10 #3): the round-10 families previously without
    # a 100x datapoint — winnow fingerprints + capped pair join, the
    # snapshot-KL and exact-KS drift monitors, robots exclusion, HTML
    # main-content extraction, and the mixture EXECUTOR (the solver is
    # headline entry 28; crawl_to_shards arrives via _headline as entry
    # 29 and carries the WET parse at 100x)
    queries["winnow_fingerprints"] = ca.q_text_winnow_fingerprints
    queries["winnow_pairs"] = ca.q_dedup_winnow_pairs
    # round-11 continuation: the Arrow-vectorized winnow twin — same
    # output, ~15-18x measured over the interpreted HOF at 10x/100x
    # (PERFORMANCE §70); tracked beside the HOF entry so the ratio
    # stays a standing rehearsal fact, not a one-off. bench._headline
    # now ALSO carries it (standing entry 30, key "winnow_arrow") —
    # drop that key here so the rehearsal times it once, under the
    # name the r11 artifact already records
    queries.pop("winnow_arrow", None)
    queries["winnow_fingerprints_arrow"] = ca.q_text_winnow_fingerprints_arrow
    queries["corpus_kl_drift"] = ca.q_corpus_kl_drift
    queries["ks_drift"] = ca.q_events_value_ks_drift
    queries["robots_filter"] = ca.q_text_url_robots
    queries["html_extract"] = ca.q_text_html_extract
    queries["materialize_mix"] = ca.q_sampling_materialize_mix
    if only is not None:
        unknown = only - set(queries)
        if unknown:
            raise SystemExit(f"--only names not in the entry set: {unknown}")
        queries = {k: v for k, v in queries.items() if k in only}

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    rows: dict[str, int] = {}
    load: dict[str, dict] = {}
    for name, fn in queries.items():
        # One FRESH session per entry (PERFORMANCE.md §33): in a shared
        # session, caches and checkpoints built by EARLIER entries (the
        # 15M-row cleaning fixture, kmeans features, the LM model) stay
        # pinned in storage memory and starve later entries' execution
        # memory — measured 4-10x inflation on the tail entries
        # (ann_ivf_pq 76.8s shared vs 7.3s solo). Per-entry sessions make
        # every number the true production shape: cold = job submit incl.
        # this entry's own fixture/index builds, warm = steady state.
        spark = get_spark("bamboo-bench-scale")
        spark.read.parquet(f"{sf_dir}/nation.parquet").count()  # warm-up
        # round-9: the same per-entry load evidence bench.py carries
        # (ext_cores = external busy CPU, the signal that separates
        # neighbor load from our own Spark work) so rehearsal outliers
        # are attributable from the artifact itself
        from bench import _ExtLoad

        ts, load1 = time.time(), os.getloadavg()[0]
        with _ExtLoad() as wc:
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            cold[name] = round(time.perf_counter() - t0, 3)
        if single:
            # --single: one execution, cold section only (entries whose
            # cold+warm pair exceeds a supervision window, r11); the
            # warm/queries section deliberately omits the entry rather
            # than faking a steady-state number — and so does the warm
            # load telemetry (review r11: recording the cold window's
            # ext-cores under warm_ext_cores fabricated a datapoint)
            ww_cores = None
            warm_str = "SINGLE"
        else:
            with _ExtLoad() as ww:
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                warm[name] = round(time.perf_counter() - t0, 3)
            ww_cores = ww.cores
            warm_str = f"{warm[name]:.3f}s"
        rows[name] = n
        load[name] = {"ts": round(ts, 1), "load1": round(load1, 2),
                      "cold_ext_cores": round(wc.cores, 2)}
        if ww_cores is not None:
            load[name]["warm_ext_cores"] = round(ww_cores, 2)
        print(f"# {label}/{name}: cold {cold[name]:.3f}s warm {warm_str} "
              f"({n} rows, load1={load1:.1f}, ext={wc.cores:.2f})",
              file=sys.stderr)
        spark.stop()
        if out_file:
            # merge after EVERY entry: a chunked rehearsal invocation that
            # hits its supervision timeout must not lose the entries that
            # already completed (r11)
            _merge_out(out_file, label, sf_dir,
                       {"queries": warm, "cold": cold, "rows": rows,
                        "load": load})

    record = {
        "metric": f"headline queries at {label} ({sf_dir}), cold + warm run",
        "value": round(sum(warm.values()), 3),
        "unit": "sec",
        "queries": warm,
        "cold": cold,
        "rows": rows,
        "load": load,
        "excluded": EXCLUDED,
        "dir": sf_dir,
    }
    if out_file:
        total = _merge_out(out_file, label, sf_dir, record)
        print(f"# merged {len(record['queries'])} entries into {out_file} "
              f"(total {total})", file=sys.stderr)
    print(json.dumps(record))


def _merge_out(out_file: str, label: str, sf_dir: str, record: dict) -> int:
    merged = {
        "metric": f"headline queries at {label} ({sf_dir}), cold + warm run",
        "unit": "sec",
    }
    if os.path.exists(out_file):
        with open(out_file) as fh:
            merged = json.load(fh)
        if merged.get("dir") not in (None, sf_dir):
            # refuse a mixed-provenance artifact (review r11): chunks
            # from different fixtures must not sum into one total
            raise SystemExit(
                f"--out {out_file} holds a {merged.get('dir')} run; "
                f"this chunk is {sf_dir} — use a different file"
            )
    for section in ("queries", "cold", "rows", "load"):
        merged.setdefault(section, {}).update(record.get(section, {}))
    merged["value"] = round(sum(merged["queries"].values()), 3)
    merged["excluded"] = EXCLUDED
    merged["dir"] = sf_dir
    tmp = out_file + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    os.replace(tmp, out_file)
    return len(merged["queries"])


if __name__ == "__main__":
    main()
