"""Distributed PCA over embedding columns (covariance tree-reduce +
driver-side eigendecomposition + broadcast projection).

The training-data uses: whitening embeddings before clustering /
near-dup thresholds, dimensionality reduction ahead of ANN index build
(a 64->8 projection cuts IVF probe cost 8x), and drift dashboards over
per-shard explained-variance.

Scale shape — the only one that survives 100 TB of vectors:

1. **Partial moments per partition** (``mapInPandas``, Arrow-batched):
   each task emits ONE row holding (count, sum-vector d, flattened Gram
   d*d) computed by a local numpy matmul. Data volume leaving the scan:
   O(#partitions * d^2) — independent of row count.
2. **Element-wise reduce in Spark**: partials are exploded to (cell,
   value) and summed with a ``groupBy(cell)`` — a distributed tree
   reduce of d^2 + d + 1 cells, never a driver-side concat of partials
   (at 10k partitions the partial set is already ~300 MB; the reduced
   moments are ~33 KB at d=64).
3. **Driver eigh on the d x d covariance** — O(d^3) on 64x64 is
   microseconds; no distributed eigensolver needed below d ~ 10^4.
4. **Broadcast projection**: components ship to executors as a numpy
   constant inside an Arrow-batched ``pandas_udf``; the projection is a
   per-batch (batch x d) @ (d x k) matmul — vectorized, no per-row
   Python.

Sign convention: each component is flipped so its largest-|loading|
coordinate is positive (ties broken by lowest index), making the model
deterministic across eigensolver builds. Floating-point caveat: partial
sums reduce in partition order, so the last-ulp of the covariance — and
hence projections — can differ from a single-threaded numpy pass;
parity is asserted at tolerance in tests, and the contract query
registers rows-only (eigendecomposition is not SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

_PARTIAL_SCHEMA = StructType(
    [
        StructField("n", DoubleType()),
        StructField("s", ArrayType(DoubleType())),
        StructField("g", ArrayType(DoubleType())),
    ]
)


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray        # (d,)
    components: np.ndarray  # (k, d) rows = principal axes, orthonormal
    explained_var: np.ndarray  # (k,) descending
    total_var: float
    n: int

    @property
    def explained_ratio(self) -> np.ndarray:
        return self.explained_var / self.total_var if self.total_var else self.explained_var


def _moments(df: DataFrame, vec_col: str) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, sum, gram) of the vector column via partial-per-partition
    numpy + an element-wise Spark reduce (steps 1-2 above)."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        g = None
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64, copy=False)
            n += m.shape[0]
            s = m.sum(axis=0) if s is None else s + m.sum(axis=0)
            gg = m.T @ m
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame({"n": [float(n)], "s": [s], "g": [g.ravel()]})

    part = df.select(F.col(vec_col).cast("array<double>").alias("v")).mapInPandas(
        partials, _PARTIAL_SCHEMA
    )
    # Element-wise distributed reduce: cell 0 is the count, cells
    # [1, 1 + d) the sum vector, [1 + d, 1 + d + d*d) the flattened Gram.
    cells = part.select(
        F.posexplode(F.concat(F.array(F.col("n")), F.col("s"), F.col("g"))).alias(
            "cell", "val"
        )
    )
    summed = cells.groupBy("cell").agg(F.sum("val").alias("val")).collect()
    vals = {r["cell"]: r["val"] for r in summed}
    if not vals:
        raise ValueError("pca_fit: empty input")
    total = len(vals) - 1
    d = int(round((-1 + (1 + 4 * total) ** 0.5) / 2))  # total = d + d*d
    n = int(round(vals[0]))
    s = np.array([vals[1 + i] for i in range(d)])
    g = np.array([vals[1 + d + i] for i in range(d * d)]).reshape(d, d)
    return n, s, g


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 8) -> PCAModel:
    """Fit a k-component PCA on ``vec_col`` (array<float|double>, fixed
    dimension). One Spark job; see module docstring for the plan."""
    n, s, g = _moments(df, vec_col)
    if n < 2:
        raise ValueError(f"pca_fit: need >= 2 rows, got {n}")
    mean = s / n
    # Unbiased covariance from raw moments: (G - n * mean mean^T) / (n-1).
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # Deterministic sign: largest-|loading| coordinate positive.
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=mean,
        components=comps,
        explained_var=np.maximum(evals[order], 0.0),
        total_var=float(np.maximum(evals, 0.0).sum()),
        n=n,
    )


def pca_project(
    df: DataFrame, model: PCAModel, vec_col: str = "embedding", out_col: str = "pc"
) -> DataFrame:
    """Append ``out_col`` = (v - mean) @ components^T as array<double>.
    The model travels to executors by closure capture (a few KB at
    d=64) inside one Arrow-batched pandas_udf — per-batch matmul, no
    per-row Python."""
    mean = model.mean
    comp_t = model.components.T  # (d, k)

    @F.pandas_udf(ArrayType(DoubleType()))
    def project(col: pd.Series) -> pd.Series:
        if not len(col):
            return pd.Series([], dtype=object)
        m = np.stack(col.to_numpy()).astype(np.float64, copy=False)
        out = (m - mean) @ comp_t
        return pd.Series(list(out))

    return df.withColumn(out_col, project(F.col(vec_col).cast("array<double>")))


# --- model persistence -------------------------------------------------------


def pca_save(spark, model: PCAModel, path: str) -> None:
    """Persist the model as one tiny parquet (k+1 rows: row -1 is the
    mean with n in `aux`, rows 0..k-1 the components with their
    explained variance) — the build-once / serve-many lifecycle, same as
    the persisted IVF-PQ index. Parquet doubles round-trip bit-exactly,
    so load == fit to the last ulp."""
    rows = [(-1, [float(x) for x in model.mean], float(model.n), model.total_var)]
    for i in range(model.components.shape[0]):
        rows.append(
            (
                i,
                [float(x) for x in model.components[i]],
                float(model.explained_var[i]),
                model.total_var,
            )
        )
    spark.createDataFrame(
        rows, "row INT, vec ARRAY<DOUBLE>, aux DOUBLE, total_var DOUBLE"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def pca_load(spark, path: str) -> PCAModel:
    rows = {r["row"]: r for r in spark.read.parquet(path).collect()}
    mean_row = rows.pop(-1)
    ks = sorted(rows)
    return PCAModel(
        mean=np.array(mean_row["vec"]),
        components=np.array([rows[i]["vec"] for i in ks]),
        explained_var=np.array([rows[i]["aux"] for i in ks]),
        total_var=mean_row["total_var"],
        n=int(mean_row["aux"]),
    )


# --- signed random projection (Johnson-Lindenstrauss sketch) -----------------


def jl_sign_matrix(out_dim: int, in_dim: int) -> list[list[int]]:
    """Deterministic ±1 matrix from sha256 — reproducible across engines
    and sessions with no RNG state, so the SQL oracle can inline the same
    literals. (Achlioptas 2003: ±1 entries satisfy the JL lemma with the
    same distortion bounds as Gaussian entries.)"""
    import hashlib

    return [
        [
            1 if hashlib.sha256(f"jl:{i}:{j}".encode()).digest()[0] % 2 == 0 else -1
            for j in range(in_dim)
        ]
        for i in range(out_dim)
    ]


def signed_projection(
    df: DataFrame,
    out_dim: int = 8,
    in_dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """JL random projection over int8-quantized vectors — 64 floats ->
    `out_dim` exact BIGINT coordinates (`rp0..rpN`), the cheap sketch an
    ANN prefilter or dedup pass runs BEFORE touching full vectors (8
    longs vs 256 bytes per row; distances preserved within JL
    distortion, gated in tests).

    Exactness is the point of quantizing first: sign * int8 products sum
    in integer space, so the output hash-matches the DuckDB oracle —
    unlike a float projection (summation-order ulps) or the PCA path
    (eigensolver). All math inlines into whole-stage codegen: the sign
    matrix rides the plan as `out_dim` array literals, zip_with +
    aggregate per output coordinate, no UDF, no shuffle."""
    from .dedup import _barrier
    from .similarity import quantize_int8

    signs = jl_sign_matrix(out_dim, in_dim)
    # barrier: qvec is a transform-expression; without it each of the
    # out_dim aggregates would re-quantize the whole vector (no CSE
    # inside HOF lambdas)
    q = _barrier(quantize_int8(df, id_col=id_col, vec_col=vec_col))
    cols = [
        F.aggregate(
            F.zip_with(
                F.col("qvec"),
                F.array(*[F.lit(s) for s in signs[i]]),
                lambda a, b: a.cast("long") * b.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias(f"rp{i}")
        for i in range(out_dim)
    ]
    return q.select(F.col(id_col), F.col("scale_e9"), *cols)


# --- PCA-space IVF coarse quantization (round-7, VERDICT r6 #7) --------------


def ivf_topk_pca(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    pca_dim: int = 8,
    n_iter: int = 2,
    model: "PCAModel | None" = None,
    broadcast_limit: int = 10_000,
) -> DataFrame:
    """IVF ANN with the coarse stage in PCA space and an exact
    full-vector rerank — "use the PCA path for what it was built for":

    - fit (or reuse) a ``pca_dim``-component model on the corpus, project
      corpus AND queries once (Arrow-batched matmul);
    - train the centroid codebook and assign cells IN PCA SPACE, so
      per-row assignment and per-query probe scoring cost ``pca_dim``
      multiply-adds per centroid instead of the full dim (8x at 64->8 —
      at 100 TB this is the stage that touches every corpus row on every
      index build/refresh);
    - probe ``n_probe`` cells per query (equi-join on cell id, same plan
      as ivf_topk) and rank candidates EXACTLY with the full-dimension
      cosine, so the sketch can only cost recall via cell routing, never
      via scores.

    Recall vs the full-space coarse stage is measured in PERFORMANCE.md
    §36 (scripts/pca_ivf_recall.py): on decaying-spectrum data the
    routing is near-lossless (recall parity at 2.1x less wall clock,
    C=256), on near-isotropic data it loses recall — so check
    ``pca_fit(...).explained_ratio[:pca_dim].sum()`` FIRST; it is the
    cheap pre-flight diagnostic for whether pca_dim components carry the
    geometry (>0.9: route in PCA space; <0.5: stay full-dim). Output
    schema matches ivf_topk (query_id, rank, neighbor_id, cosine_e6)."""
    from pyspark.sql import Window

    from .similarity import (
        _centroid_scores,
        _maybe_broadcast,
        cosine,
        ivf_assign,
        kmeans_fit_int8,
    )

    if model is None:
        model = pca_fit(corpus, vec_col=vec_col, k=pca_dim)
    pc_c = pca_project(corpus, model, vec_col=vec_col, out_col="__pc")
    pc_q = pca_project(queries, model, vec_col=vec_col, out_col="__pc")
    cents = [
        (cid, [float(x) for x in codes])
        for cid, codes in kmeans_fit_int8(
            pc_c, k=n_centroids, n_iter=n_iter, id_col=id_col, vec_col="__pc"
        )
    ]
    c = ivf_assign(pc_c, cents, "__pc").select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        "__ivf_cell",
    )
    q = pc_q.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("__pc"),
    )
    cells = F.slice(
        F.array_sort(
            _centroid_scores(F.col("__pc"), cents),
            lambda a, b: F.when(a["s"] > b["s"], -1)
            .when(a["s"] < b["s"], 1)
            .otherwise(0),
        ),
        1,
        n_probe,
    )
    q = q.withColumn(
        "__ivf_cell", F.explode(F.transform(cells, lambda x: x["cid"]))
    ).drop("__pc")
    scored = (
        c.join(_maybe_broadcast(q, broadcast_limit), "__ivf_cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.floor(cosine(F.col("qv"), F.col("cv")) * 1000000)
            .cast("long")
            .alias("cosine_e6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_e6").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine_e6")
    )
