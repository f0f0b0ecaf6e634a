#!/usr/bin/env python
"""Recall@k sketch-vs-full for the PCA-space IVF coarse stage
(PERFORMANCE.md §36; VERDICT r6 #7).

Compares, on the sf1 embeddings fixture:

- ivf_topk with a TRAINED full-dimension (64-d) coarse codebook, vs
- ivf_topk_pca: same geometry but centroid training / cell assignment /
  probe selection in 8-d PCA space, exact 64-d rerank,

at n_probe 1/2/4/8, against numpy exact-cosine ground truth, with
best-of-3 warm wall times. Run SOLO: `python scripts/pca_ivf_recall.py
[sf_dir]`.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 10
N_CENTROIDS = 32
N_QUERIES = 200


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    from bambooanalysis_spark.operators.decomp import ivf_topk_pca, pca_fit
    from bambooanalysis_spark.operators.similarity import ivf_topk
    from bambooanalysis_spark.session import get_spark

    spark = get_spark("pca-ivf-recall")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.orderBy("vec_id").limit(N_QUERIES)

    # numpy exact ground truth (cosine top-K, self excluded)
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    q_ids = ids[np.argsort(ids)[:N_QUERIES]]
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    truth: dict[int, set] = {}
    for qid in q_ids:
        qi = id_to_row[int(qid)]
        sims = Mn @ Mn[qi]
        sims[qi] = -2.0
        top = np.argpartition(sims, -K)[-K:]
        truth[int(qid)] = {int(ids[t]) for t in top}

    # shared PCA model so the fit cost is amortized out of the timing,
    # matching the build-once / serve-many lifecycle
    model = pca_fit(emb, k=8)

    out = {}
    for n_probe in (1, 2, 4, 8):
        for label, fn in (
            ("full64", lambda: ivf_topk(
                emb, queries, k=K, n_centroids=N_CENTROIDS,
                n_probe=n_probe, train_iters=2)),
            ("pca8", lambda: ivf_topk_pca(
                emb, queries, k=K, n_centroids=N_CENTROIDS,
                n_probe=n_probe, pca_dim=8, n_iter=2, model=model)),
        ):
            got = fn().collect()
            by_q: dict[int, set] = {}
            for r in got:
                by_q.setdefault(int(r["query_id"]), set()).add(
                    int(r["neighbor_id"])
                )
            rec = np.mean(
                [len(by_q.get(q, set()) & truth[q]) / K for q in truth]
            )
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn().count()
                runs.append(round(time.perf_counter() - t0, 3))
            out[f"np{n_probe}/{label}"] = {
                "recall": round(float(rec), 4),
                "best_s": min(runs),
            }
            print(f"n_probe={n_probe} {label}: recall@{K} "
                  f"{rec:.3f}  best {min(runs):.2f}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
