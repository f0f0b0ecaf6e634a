"""Shared mixture-oracle SQL generators (registration-free).

The water-filling solver and mixture-executor CTE chains are needed by
oracles in several contract modules whose IMPORT ORDER is the driver's
slot order (contract/__init__.py) — pipeline.py (slot 50) loads before
approx.py, so the generators live here, in a module that registers
nothing and can be imported from anywhere without shifting the window.
"""

from __future__ import annotations

# weight rule shared by every mixture oracle: mirrors the Spark queries'
# dict EXACTLY — srcN for N in 0..63 gets 1 + (N % 4); anything else
# (renamed/extra sources in a future fixture) falls back to the
# operator's default weight 1 instead of diverging or crashing the CAST
# (review r10)
_SRC_WEIGHT_SQL = """CASE WHEN regexp_matches(source, '^src([0-9]|[1-5][0-9]|6[0-3])$')
                THEN 1 + (CAST(substr(source, 4) AS BIGINT) % 4)
                ELSE 1 END"""

# the Spark-side twin of _SRC_WEIGHT_SQL — ONE definition (review r11:
# four modules had their own copy of this comprehension; a one-sided
# weight-rule change would break engine parity for only some queries)
SRC_WEIGHTS = {f"src{i}": 1 + (i % 4) for i in range(64)}


def cluster_keepbest_ctes_sql(
    src: str, shingle_k: int = 3, tok_expr: str = "n_tok",
) -> str:
    """LSH candidate pairs -> symmetric edges -> recursive closure ->
    min-anchor clusters -> keep-best (`bk`: one row per kept-best doc,
    (doc_id, source, {tok_expr})) over any (doc_id, text, source,
    token) relation — shared by the crawl-pipeline oracle and the
    slot-50 corpus arm (review r11: the chain was copy-pasted; a
    closure/tie-break fix must hit both oracles at once). The enclosing
    statement must be WITH RECURSIVE."""
    from .extensions import _lsh_pairs_sql  # fully loaded before callers run

    return f"""pairs AS ({_lsh_pairs_sql(src, shingle_k=shingle_k)}),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(id, anc) AS (
    SELECT doc_id, doc_id FROM {src}
    UNION
    SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.id
),
clusters AS (
    SELECT id AS doc_id, MIN(anc) AS cluster_id FROM reach GROUP BY id
),
bk AS (
    SELECT k.doc_id, k.source, k.{tok_expr}
    FROM {src} k JOIN clusters c USING (doc_id)
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY c.cluster_id ORDER BY k.{tok_expr} DESC, k.doc_id
    ) = 1
)"""


def tbm_ctes_sql(
    src: str, budget: int, weight_sql: str, scale: int,
    tok_expr: str = "n_chars",
) -> str:
    """Water-filling CTE chain body (``counts`` .. ``alloc``) over any
    (source, token) relation — shared by the standalone solver oracle,
    the materializer oracle, the crawl-to-shards pipeline oracle and
    the slot-50 manifest oracle (round 11), so the fixpoint SQL exists
    exactly once. ``alloc`` exposes (strata, avail_tokens, weight,
    saturated, alloc_tokens)."""
    return f"""counts AS (
    SELECT source AS strata,
           -- COALESCE mirrors the Spark operator (ADVICE r10): an
           -- all-NULL-token stratum must contribute avail_tokens 0, not
           -- NULL (plain SUM over all NULLs is NULL, which would poison
           -- the fixpoint arithmetic where Spark water-fills with 0)
           SUM(COALESCE({tok_expr}, 0)) AS avail_tokens,
           {weight_sql} AS weight
    FROM {src} WHERE source IS NOT NULL GROUP BY source
),
keyed AS (
    SELECT *, (avail_tokens // weight) * {scale}
            + ((avail_tokens % weight) * {scale}) // weight AS rkey
    FROM counts
),
flagged AS (
    SELECT *,
        COALESCE(SUM(avail_tokens) OVER (ORDER BY rkey, strata
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a_prev,
        SUM(weight) OVER () -
        COALESCE(SUM(weight) OVER (ORDER BY rkey, strata
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS w_rem
    FROM keyed
),
sat AS (
    SELECT *,
        MIN(CASE WHEN avail_tokens * w_rem <= ({budget} - a_prev) * weight
                 THEN 1 ELSE 0 END)
            OVER (ORDER BY rkey, strata
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
            AS saturated
    FROM flagged
),
solved AS (
    SELECT *,
        {budget} - SUM(CASE WHEN saturated THEN avail_tokens ELSE 0 END)
            OVER () AS r_budget,
        SUM(CASE WHEN saturated THEN 0 ELSE weight END) OVER () AS w_unsat
    FROM sat
),
based AS (
    SELECT *,
        CASE WHEN saturated THEN avail_tokens
             ELSE (r_budget * weight) // w_unsat END AS base,
        CASE WHEN saturated THEN 0
             ELSE (r_budget * weight) % w_unsat END AS rem
    FROM solved
),
ranked AS (
    SELECT *,
        r_budget - SUM(CASE WHEN saturated THEN 0 ELSE base END) OVER ()
            AS leftover,
        ROW_NUMBER() OVER (ORDER BY CASE WHEN saturated THEN 1 ELSE 0 END,
                           rem DESC, strata) AS rem_rank
    FROM based
),
alloc AS (
    SELECT strata, avail_tokens, weight, saturated,
           CASE WHEN saturated THEN avail_tokens
                ELSE LEAST(
                    base + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END,
                    avail_tokens)
           END AS alloc_tokens
    FROM ranked
)"""


def materialize_ctes_sql(
    src: str, salt: str, tok_expr: str = "n_chars",
) -> str:
    """Mixture-executor CTE chain (``mdocs`` .. ``mixed``) reproducing
    materialize_token_mix's two-grain kept decision over any
    (doc_id, source, token) relation; composes after ``tbm_ctes_sql``
    (joins its ``alloc``). ``mixed`` exposes (doc_id, source, t,
    kept_i)."""
    return f"""mdocs AS (
    SELECT doc_id, source,
           CAST(COALESCE({tok_expr}, 0) AS BIGINT) AS t,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{salt}'), 1, 15)) AS BIGINT) AS h
    FROM {src} WHERE source IS NOT NULL
),
mstaged AS (SELECT *, CAST(h % 10000 AS INT) AS b FROM mdocs),
mpb AS (SELECT source, b, SUM(t) AS bt FROM mstaged GROUP BY 1, 2),
mcumb AS (
    SELECT *, COALESCE(SUM(bt) OVER (PARTITION BY source ORDER BY b
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
    FROM mpb
),
mbstat AS (
    SELECT c.source, c.b,
           (c.cum_before + c.bt <= COALESCE(a.alloc_tokens, 0)) AS full_b,
           GREATEST(COALESCE(a.alloc_tokens, 0) - c.cum_before, 0) AS remaining
    FROM mcumb c LEFT JOIN alloc a ON a.strata = c.source
),
mixed AS (
    SELECT s.doc_id, s.source, s.t,
           CAST(CASE WHEN bs.full_b THEN 1
                     WHEN SUM(s.t) OVER (PARTITION BY s.source, s.b
                             ORDER BY s.h, s.doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          <= bs.remaining THEN 1 ELSE 0 END AS BIGINT) AS kept_i
    FROM mstaged s JOIN mbstat bs ON bs.source = s.source AND bs.b = s.b
)"""
