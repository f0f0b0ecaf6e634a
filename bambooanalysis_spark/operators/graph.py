"""Iterative graph algorithms on DataFrames.

Connected components (min-label fixpoint) lives in operators/dedup.py next
to its near-dup use case; this module holds the general random-walk
family. Everything is exact integer fixed-point so results are
bit-reproducible and DuckDB oracles can replicate whole iteration
histories (the kmeans unrolled-oracle pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping_e4: int = 8500,
) -> DataFrame:
    """PageRank with EXACT integer arithmetic (1e-9 fixed point):

        rank_{t+1}(v) = base + Σ_{u→v} (rank_t(u) * d_e4) div (1e4 * outdeg(u))
        base          = ((1e4 − d_e4) * 1e9) div (1e4 * n)

    All divisions are integer `div`, so every engine agrees bit-for-bit
    and the whole iteration history unrolls into a DuckDB oracle.
    Dangling-node mass is dropped (the standard simplification — ranks
    then sum to ≤ 1e9; redistribute explicitly if you need a strict
    distribution).

    Scale shape: per iteration, ONE join of the edge list with the rank
    vector on src (both big — shuffle join on the node key, AQE handles
    hub skew) + one groupBy(dst) with map-side partial sums + a left join
    back onto the node set. No collect — state stays distributed, unlike
    the k-means codebook (which is k rows by construction). Plans grow
    linearly with n_iter; persist the rank vector between iterations for
    large n_iter (callers at scale checkpoint every few rounds).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    total = nodes.agg(F.count(F.lit(1)).alias("__n"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))
    # product precomputed in Python: an INT*INT literal pair would overflow
    # under ANSI before widening (1500 * 1e9 > 2^31)
    base = F.expr(f"{(10000 - damping_e4) * 1_000_000_000} div (10000 * __n)")
    ranks = nodes.crossJoin(F.broadcast(total)).select(
        "node", F.expr("1000000000 div __n").cast("long").alias("rank_e9")
    )
    for _ in range(n_iter):
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(rank_e9 * {damping_e4}) div (10000 * odeg)")
                .cast("long")
                .alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(total))
            .join(contribs, "node", "left")
            .select(
                "node",
                (base + F.coalesce(F.col("s"), F.lit(0))).cast("long").alias("rank_e9"),
            )
        )
    return ranks
