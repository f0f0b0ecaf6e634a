"""Training-data-pipeline extension queries: text analysis, dedup families,
similarity search, multimodal plumbing, event-time windows.

Everything hash-derived uses md5 (standardized), so even MinHash signatures
and LSH band keys are replicated EXACTLY by the DuckDB oracles — these are
not approximate comparisons. Fixed-point integer outputs throughout (see
contract/relational.py rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import read_table, register

# DuckDB equivalents of operators/text.py primitives
_D_TOKENS = "list_filter(string_split({t}, ' '), x -> length(x) > 0)"
_D_HASH64 = "CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"
_D_NORM = "regexp_replace(lower({t}), '[^a-z0-9 ]', '', 'g')"
_STOPWORDS_SQL = "['the','a','an','of','and','to','in','is','on','for']"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Some generations of events.parquet store TIMESTAMP(NANOS), which
    Spark's parquet reader rejects by default: read nanos as long and
    convert to a microsecond timestamp (driver data is microsecond-aligned,
    so lossless; integer `div` keeps the arithmetic exact where doubles
    could not hold ns). Microsecond generations read as TIMESTAMP_NTZ and
    just need the session-timezone (pinned UTC) cast to plain timestamp so
    downstream unix_micros/window math is identical either way."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = read_table(spark, sf_dir, "events")
    if dict(raw.dtypes)["ts"] == "bigint":
        ts = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        ts = F.col("ts").cast("timestamp")
    return raw.withColumn("ts", ts)


# --- text analysis -----------------------------------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as T

    d = _docs(spark, sf_dir)
    t = F.col("text")
    return d.select(
        "doc_id",
        T.token_count(t).alias("n_tokens"),
        T.char_count(t).alias("n_chars_m"),
        T.punct_count(t).alias("n_punct"),
        T.stopword_count(t).alias("n_stop"),
        T.avg_token_len_e4(t).alias("avg_tok_len_e4"),
        T.quality_score_e4(t).alias("quality_e4"),
    )


ORACLE_TEXT_STATS = f"""
WITH d AS (
    SELECT doc_id, text,
           {_D_TOKENS.format(t='text')} AS toks,
           length(text) AS nc,
           length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS np
    FROM documents
),
s AS (
    SELECT doc_id, nc, np,
           len(toks) AS nt,
           CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS BIGINT) AS total_len,
           len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) AS ns
    FROM d
)
SELECT doc_id,
       CAST(nt AS BIGINT) AS n_tokens,
       CAST(nc AS BIGINT) AS n_chars_m,
       CAST(np AS BIGINT) AS n_punct,
       CAST(ns AS BIGINT) AS n_stop,
       CASE WHEN nt > 0 THEN CAST(FLOOR(total_len * 10000 / nt) AS BIGINT) ELSE 0 END AS avg_tok_len_e4,
       CAST(FLOOR(
           CAST(FLOOR(LEAST(nc * 10000 / 500, 10000.0)) AS BIGINT)
         * (CASE WHEN nc > 0 THEN CAST(FLOOR(10000 - np * 10000 / nc) AS BIGINT) ELSE 0 END)
         / 10000
         * (CASE WHEN nt > 0 THEN CAST(FLOOR(10000 - ns * 10000 / nt) AS BIGINT) ELSE 0 END)
         / 10000) AS BIGINT) AS quality_e4
FROM s
"""


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as T

    d = _docs(spark, sf_dir)
    scores = T.lang_scores(F.col("text"))
    return d.select(
        "doc_id",
        T.lang_id(F.col("text")).alias("lang_guess"),
        *[scores[lang].alias(f"score_{lang}") for lang in T.LANG_MARKERS],
    )


def _markers_sql() -> dict[str, str]:
    from ..operators import text as T

    return {
        lang: "[" + ",".join(f"'{m}'" for m in ms) + "]"
        for lang, ms in T.LANG_MARKERS.items()
    }


def _oracle_langid() -> str:
    m = _markers_sql()
    score = {
        lang: f"len(list_filter(toks, x -> list_contains({arr}, x)))"
        for lang, arr in m.items()
    }
    # argmax with first-wins tie-break in registration order en, de, es, fr
    return f"""
WITH d AS (
    SELECT doc_id, {_D_TOKENS.format(t='text')} AS toks FROM documents
),
s AS (
    SELECT doc_id,
           CAST({score['en']} AS BIGINT) AS score_en,
           CAST({score['de']} AS BIGINT) AS score_de,
           CAST({score['es']} AS BIGINT) AS score_es,
           CAST({score['fr']} AS BIGINT) AS score_fr
    FROM d
)
SELECT doc_id,
       CASE WHEN GREATEST(score_en, score_de, score_es, score_fr) = 0 THEN 'und'
            WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en'
            WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
            WHEN score_es >= score_fr THEN 'es'
            ELSE 'fr' END AS lang_guess,
       score_en, score_de, score_es, score_fr
FROM s
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as T

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        T.fingerprint(F.col("text")).alias("fp"),
        T.hash64(F.col("text")).alias("h64"),
    )


ORACLE_TEXT_FINGERPRINT = f"""
SELECT doc_id,
       md5({_D_NORM.format(t='text')}) AS fp,
       {_D_HASH64.format(s='text')} AS h64
FROM documents
"""


# --- dedup: exact ------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as D

    return D.exact_dedup_groups(_docs(spark, sf_dir), "doc_id", "text")


ORACLE_DEDUP_EXACT = f"""
SELECT md5({_D_NORM.format(t='text')}) AS fp,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1
"""


# --- dedup: minhash signatures + LSH candidate pairs -------------------------

_D_SHINGLES = f"""
list_transform(
    range(1, GREATEST(len(toks) - 1, 1)),
    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])
)
"""

# Universal-hash minhash (round-7, mirrors operators/dedup.py): one base
# hash per shingle mod P = 2^31 - 1, then per-permutation affine maps
# with the same sha256-derived coefficients inlined as literals.
from ..operators.dedup import _MINHASH_P as _MH_P
from ..operators.dedup import _minhash_coeffs as _mh_coeffs

_MH_A = "[%s]" % ", ".join(str(a) for a, _b in _mh_coeffs(16))
_MH_B = "[%s]" % ", ".join(str(b) for _a, b in _mh_coeffs(16))

_D_SIG = f"""
list_transform(
    range(0, 16),
    p -> COALESCE(
        list_min(list_transform(
            list_transform(sh, s -> {_D_HASH64.format(s="s")} % {_MH_P}),
            h -> ({_MH_A}[p + 1] * h + {_MH_B}[p + 1]) % {_MH_P})),
        -1)
)
"""


def q_dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as D

    d = _docs(spark, sf_dir)
    sig = D.minhash_signature(F.col("text"), k=16, shingle_k=3)
    # first 4 signature slots as columns (full array types are awkward to
    # hash portably; 4 slots pin the computation exactly)
    return d.select(
        "doc_id",
        *[F.element_at(sig, i + 1).alias(f"mh{i}") for i in range(4)],
    )


ORACLE_DEDUP_MINHASH_SIG = f"""
WITH d AS (
    SELECT doc_id, {_D_TOKENS.format(t='text')} AS toks FROM documents
),
sh AS (SELECT doc_id, {_D_SHINGLES} AS sh FROM d),
sig AS (SELECT doc_id, {_D_SIG} AS sig FROM sh)
SELECT doc_id, sig[1] AS mh0, sig[2] AS mh1, sig[3] AS mh2, sig[4] AS mh3
FROM sig
"""


def q_dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-bucket-pairs (max_bucket=None, the r5-ADVICE default):
    right for this oracle-checked pair surface, but a deliberate
    crawl-scale footgun — one mega-clique bucket (10^6 boilerplate
    copies) emits ~n^2/2 pairs from a single task. At crawl scale pass
    a finite max_bucket (or max_bucket=1 when only connectivity is
    consumed, as near_dup_clusters does), or use lsh_first_claim_keeps;
    see bucket_pairs' docstring and COVERAGE.md's row for this query."""
    from ..operators import dedup as D

    return D.minhash_lsh_pairs(
        _docs(spark, sf_dir), "doc_id", "text", k=16, bands=8, shingle_k=2
    )


def _lsh_banded_sql(src: str = "documents", shingle_k: int = 2) -> str:
    """CTE chain (d/sh/sig/banded) producing the LSH band memberships
    (doc_id, band_key) over any (doc_id, text) source — the shared core
    of the pair oracle below and the incremental-store oracle
    (contract/approx.py). ``shingle_k`` mirrors the Spark side's
    word-gram width (the range bound reproduces shingles_from_tokens'
    too-short-doc empty list: len < k yields no shingles, so the all--1
    signature sentinel filters the doc from banding on both engines)."""
    gram = ", ".join(f"toks[i + {j}]" for j in range(shingle_k))
    return f"""
d AS (
    SELECT doc_id, {_D_TOKENS.format(t='text')} AS toks FROM {src}
),
sh AS (
    SELECT doc_id,
           list_transform(range(1, GREATEST(len(toks) - {shingle_k - 2}, 1)),
                          i -> concat_ws(' ', {gram})) AS sh
    FROM d
),
sig AS (SELECT doc_id, {_D_SIG} AS sig FROM sh),
banded AS (
    SELECT doc_id,
           unnest(list_transform(range(0, 8),
               b -> md5(concat(CAST(b AS VARCHAR), ':',
                    array_to_string(list_transform(sig[b * 2 + 1 : b * 2 + 2],
                                                   v -> CAST(v AS VARCHAR)), '-')))))
               AS band_key
    -- sentinel guard, mirroring dedup.py minhash_lsh_pairs: docs too short
    -- to shingle share the all--1 signature and would otherwise band into
    -- one giant spurious clique
    FROM sig WHERE sig[1] <> -1
)"""


def _lsh_pairs_sql(src: str = "documents", shingle_k: int = 2) -> str:
    """LSH candidate-pair SQL over any (doc_id, text) source — the
    pipeline oracles reuse it over their quality-filtered dedup sets."""
    return f"""
WITH {_lsh_banded_sql(src, shingle_k)}
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


ORACLE_DEDUP_MINHASH_LSH = _lsh_pairs_sql()


# --- dedup: simhash ----------------------------------------------------------

def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as D

    d = _docs(spark, sf_dir)
    nparts = max(spark.sparkContext.defaultParallelism, 4)
    d = d.repartition(nparts, "doc_id")  # fan out the per-row bit aggregation
    # token hashes as a column: not CSE'd across the 32 per-bit lambdas
    d = d.withColumn("__hs", D.token_hashes(F.col("text")))
    return d.select(
        "doc_id", D.simhash_bits_from_hashes(F.col("__hs"), nbits=32).alias("simhash")
    )


ORACLE_DEDUP_SIMHASH = f"""
WITH d AS (
    SELECT doc_id,
           list_transform(list_distinct({_D_TOKENS.format(t='text')}),
                          t -> {_D_HASH64.format(s='t')}) AS hs
    FROM documents
)
SELECT doc_id,
       array_to_string(
           list_transform(range(31, -1, -1),
               j -> CASE WHEN CAST(list_aggregate(
                        list_transform(hs, h -> CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END),
                        'sum') AS BIGINT) >= 0
                    THEN '1' ELSE '0' END),
           '') AS simhash
FROM d
"""


# --- dedup: exact n-gram jaccard via posting-list join -----------------------

def q_dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as D

    # df-cutoff (fan-out guard) live in the contract plan; at the fixture's
    # 0.9 fraction nothing is dropped (31-token synthetic vocab), so the
    # values stay comparable across rounds while the guard is exercised —
    # its teeth are unit-tested on a planted corpus-wide token.
    # Strategy: the fixture is the DENSE regime (31-token vocab, 7.1M of
    # 12.5M possible pairs pass t=0.6 at sf0.1) — output is Ω(n²), so the
    # bitset64 enumerate+popcount plan is output-bound optimal there;
    # prefix (the sparse-corpus default) and postings produce identical
    # rows (equivalence-tested) but 7x/3x the time on this corpus
    # (PERFORMANCE.md §23). The ≤64-vocab precondition fails loudly
    # in-plan if the fixture ever changes.
    return D.jaccard_pairs(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        threshold_e4=6000,
        max_df_frac=0.9,
        strategy="bitset64",
    )


ORACLE_DEDUP_JACCARD = f"""
WITH toks0 AS (
    SELECT DISTINCT doc_id, unnest({_D_TOKENS.format(t='text')}) AS tok
    FROM documents
),
toks AS (
    SELECT * FROM toks0
    WHERE tok NOT IN (
        SELECT tok FROM toks0 GROUP BY tok
        HAVING COUNT(*) > CAST(FLOOR(0.9 * (SELECT COUNT(*) FROM documents)) AS BIGINT)
    )
),
sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY 1),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
    FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(FLOOR(n_inter * 10000 / (sa.n_tok + sb.n_tok - n_inter)) AS BIGINT) AS jaccard_e4
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE FLOOR(n_inter * 10000 / (sa.n_tok + sb.n_tok - n_inter)) >= 6000
"""


# --- similarity: brute-force cosine top-k ------------------------------------

_D_COS = """
(
  list_aggregate(list_transform(list_zip({a}, {b}),
      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
  / (
      sqrt(list_aggregate(list_transform({a},
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
    * sqrt(list_aggregate(list_transform({b},
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
    )
)
"""


def q_similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as S

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5)
    return S.cosine_topk(emb, queries, k=10)


ORACLE_SIMILARITY_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
    SELECT query_id, neighbor_id,
           CAST(FLOOR({_D_COS.format(a='qv', b='cv')} * 1000000) AS BIGINT) AS cosine_e6
    FROM c CROSS JOIN q
    WHERE neighbor_id <> query_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine_e6 DESC, neighbor_id) AS rank
    FROM scored
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine_e6
FROM ranked WHERE rank <= 10
"""


# --- similarity: embedding near-dup pairs ------------------------------------

def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """threshold_e6=400000: the fixture's max pairwise cosine is ~0.48-0.51
    at sf<=0.01, so the original 0.8 threshold returned 0 rows at every
    scale and the hash gate was vacuous (0 == 0 — the §37 failure mode,
    caught by the round-8 two-scale audit). 0.40 keeps the query selective
    (66/59 pairs at sf0.001/0.01) while checking real values.

    exact=True here BY NECESSITY, not preference: the banded sign-LSH
    default is calibrated for >=0.95 thresholds (per-pair miss <2e-4
    there) but recalls only ~1/3 of pairs at 0.40, and an exact-hash
    oracle slot cannot tolerate probabilistic recall. The scale-default
    LSH path keeps its own recall gate
    (tests/test_extensions.py::test_near_dup_bucketed_matches_exact)."""
    from ..operators import similarity as S

    return S.near_dup_pairs_cosine(
        _emb(spark, sf_dir), threshold_e6=400000, exact=True
    )


ORACLE_EMBEDDING_NEAR_DUP = f"""
WITH a AS (SELECT vec_id AS id_a, embedding AS va FROM embeddings),
b AS (SELECT vec_id AS id_b, embedding AS vb FROM embeddings)
SELECT id_a, id_b,
       CAST(FLOOR({_D_COS.format(a='va', b='vb')} * 1000000) AS BIGINT) AS cosine_e6
FROM a CROSS JOIN b
WHERE id_a < id_b
  AND FLOOR({_D_COS.format(a='va', b='vb')} * 1000000) >= 400000
"""


# --- similarity: LSH ANN (approximate — rows-only driver check) --------------

def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as S

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5)
    return S.ann_lsh_topk(emb, queries, k=10, nplanes=6)


# --- multimodal: binary payload plumbing (Arrow mapInPandas path) ------------

def q_multimodal_blob_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import multimodal as M

    blobs = M.attach_blob(_docs(spark, sf_dir), "doc_id", "text")
    return M.extract_blob_meta(blobs)


ORACLE_MULTIMODAL_BLOB_META = """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS md5_hex,
       64 + CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT) % 64 AS fake_width,
       64 + CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT) % 64 AS fake_height
FROM documents
"""


# --- event-time windows (batch form; streaming form tested in tests/) --------

def q_events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import windowed_event_stats

    out = windowed_event_stats(_events(spark, sf_dir), window="1 hour")
    # epoch-seconds integer output: timestamps round-trip differently
    # (ns vs us) across engine->pandas conversions, integers do not
    return out.select(
        F.col("window_start").cast("long").alias("window_start_s"),
        "event_type",
        "n_events",
        "value_cents",
        "n_users",
    )


ORACLE_EVENTS_TUMBLING = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_s,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import sessionize

    s = sessionize(_events(spark, sf_dir), gap_minutes=30)
    return s.select(
        "user_id",
        F.col("session_idx").cast("long").alias("session_idx"),
        F.unix_micros(F.col("session_start")).alias("session_start_us"),
        F.unix_micros(F.col("session_end")).alias("session_end_us"),
        "n_events",
    )


ORACLE_EVENTS_SESSIONIZE = """
WITH ordered AS (
    SELECT user_id, event_id, ts,
           CASE WHEN FLOOR(epoch(ts)) - LAG(FLOOR(epoch(ts)))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM events
),
sess AS (
    SELECT user_id, ts,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
    FROM ordered
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       epoch_us(MIN(ts)) AS session_start_us, epoch_us(MAX(ts)) AS session_end_us,
       COUNT(*) AS n_events
FROM sess
GROUP BY 1, 2
"""


# (registration consolidated at end of module — see _register_all; rows-only
# approximate queries register in contract/approx.py, after the window)


# --- similarity: IVF ANN (approximate — rows-only driver check) --------------

def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as S

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5)
    return S.ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=6)




# --- text: BPE-ish regex token counting --------------------------------------

def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as T

    d = _docs(spark, sf_dir)
    t = F.col("text")
    return d.select(
        "doc_id",
        T.bpe_token_count(t).alias("n_bpe_tokens"),
        T.token_count(t).alias("n_ws_tokens"),
        # subword expansion factor in 1e-4 fixed point
        F.when(
            T.token_count(t) > 0,
            F.floor(T.bpe_token_count(t) * 10000 / T.token_count(t)),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("expansion_e4"),
    )


ORACLE_TEXT_BPE_TOKENS = f"""
WITH d AS (
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS nb,
           len({_D_TOKENS.format(t='text')}) AS nw
    FROM documents
)
SELECT doc_id,
       CAST(nb AS BIGINT) AS n_bpe_tokens,
       CAST(nw AS BIGINT) AS n_ws_tokens,
       CASE WHEN nw > 0 THEN CAST(FLOOR(nb * 10000 / nw) AS BIGINT) ELSE 0 END AS expansion_e4
FROM d
"""




# --- dedup: near-dup clustering (LSH pairs -> connected components) ----------

def q_dedup_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster table (connected components over the LSH pair
    graph) plus (round 3) the online first-claim keep bit — kept iff the
    doc is the earliest in EVERY band bucket it occupies, the batch mirror
    of the streaming band-vote dedup
    (streaming/stateful.py:streaming_lsh_band_votes).

    r11 optimization: BOTH consumers (pair graph -> CC, and the
    first-claim band votes) read ONE shared banded_docs table,
    materialized once — the signature chain (shingle -> md5 -> 16 affine
    mins), the compute-heavy stage, previously ran twice per invocation
    (identical k/bands/shingle_k on both paths; values unchanged, see
    minhash_lsh_pairs' banded note).

    r12 (guide §2.6 overlap independent jobs): past the shared banded
    checkpoint the two consumers are fully independent, but the
    first-claim chain used to execute inside the FINAL join's job —
    serialized after the whole CC loop. It now materializes on a second
    driver thread while the main thread runs the CC rounds, whose short
    per-round jobs leave most cores idle for it to back-fill; the final
    join then reads two checkpoints. Byte-identical rows."""
    from concurrent.futures import ThreadPoolExecutor

    from ..operators import dedup as D

    docs = _docs(spark, sf_dir)
    banded = D.banded_docs(
        D._fan_out(docs.select("doc_id", "text"), "doc_id"),
        "doc_id", "text", k=16, bands=8, shingle_k=2,
    ).localCheckpoint(eager=True)

    def _fc():
        return D.lsh_first_claim_keeps(
            docs, "doc_id", "text", k=16, bands=8, shingle_k=2, banded=banded
        ).localCheckpoint(eager=True)

    with ThreadPoolExecutor(max_workers=1) as pool:
        fc_fut = pool.submit(_fc)
        clusters = D.near_dup_clusters(
            docs, "doc_id", "text", k=16, bands=8, shingle_k=2, banded=banded
        )
        fc = fc_fut.result().select(
            "doc_id", F.col("kept_i").alias("first_claim_kept_i")
        )
    return clusters.join(fc, "doc_id").orderBy("doc_id")


# Same banded-LSH pair graph as ORACLE_DEDUP_MINHASH_LSH, then connected
# components via a recursive CTE: anc propagates along (symmetric) edges, so
# per node MIN(anc) over everything reachable is the component's min id —
# exactly the engine's min-label fixpoint. Singletons come from the
# all-documents seed row (id, id).
def _clusters_sql(src: str = "documents") -> str:
    return f"""
WITH RECURSIVE pairs AS ({_lsh_pairs_sql(src)}),
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
fc AS (
    WITH fd AS (
        SELECT doc_id, {_D_TOKENS.format(t='text')} AS toks FROM {src}
    ),
    fsh AS (
        SELECT doc_id,
               list_transform(range(1, GREATEST(len(toks), 1)),
                              i -> concat_ws(' ', toks[i], toks[i + 1])) AS sh
        FROM fd
    ),
    fsig AS (SELECT doc_id, {_D_SIG} AS sig FROM fsh AS sh),
    fbanded AS (
        SELECT doc_id,
               unnest(list_transform(range(0, 8),
                   b -> md5(concat(CAST(b AS VARCHAR), ':',
                        array_to_string(list_transform(sig[b * 2 + 1 : b * 2 + 2],
                                                       v -> CAST(v AS VARCHAR)), '-')))))
                   AS band_key
        FROM fsig WHERE sig[1] <> -1
    ),
    ffirst AS (SELECT band_key, MIN(doc_id) AS first_id FROM fbanded GROUP BY band_key)
    SELECT b.doc_id,
           CAST(MIN(CASE WHEN b.doc_id = f.first_id THEN 1 ELSE 0 END) AS BIGINT)
               AS first_claim_kept_i
    FROM fbanded b JOIN ffirst f USING (band_key)
    GROUP BY b.doc_id
)
SELECT r.id AS doc_id, MIN(r.anc) AS cluster_id, MIN(r.anc) = r.id AS is_representative,
       CAST(COALESCE(MIN(fc.first_claim_kept_i), 1) AS BIGINT) AS first_claim_kept_i
FROM reach r LEFT JOIN fc ON fc.doc_id = r.id
GROUP BY r.id ORDER BY r.id
"""


ORACLE_DEDUP_NEAR_DUP_CLUSTERS = _clusters_sql()




# --- text: Gopher-style repetition rules ------------------------------------

def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition statistics (the Gopher repetition-removal
    rules): most frequent word 2-gram + the character fraction it covers,
    and the character fraction inside duplicated 5-grams. One scan, zero
    shuffle — pure per-row HOF aggregates over staged token arrays."""
    from ..operators import text as T
    from ..operators.dedup import _barrier

    d = _docs(spark, sf_dir).select("doc_id", "text")
    # stage tokens once (HOF lambdas get no CSE), then both widths' stats
    staged = _barrier(d.withColumn("__toks", T.tokens(F.col("text"))))
    staged = _barrier(
        staged.select(
            "doc_id",
            "text",
            T.run_stats(
                F.array_sort(T.shingles_from_tokens(F.col("__toks"), 2))
            ).alias("__r2"),
            T.run_stats(
                F.array_sort(T.shingles_from_tokens(F.col("__toks"), 5))
            ).alias("__r5"),
        )
    )
    t = F.col("text")
    return staged.select(
        "doc_id",
        F.col("__r2")["top"].alias("top_2gram"),
        F.col("__r2")["top_count"].alias("top2_count"),
        T.top_ngram_char_frac_e4(F.col("__r2"), t).alias("top2_frac_e4"),
        T.dup_ngram_char_frac_e4(F.col("__r5"), t).alias("dup5_frac_e4"),
    )


def _ngram_cte(n: int) -> str:
    """doc_id, gram rows for word n-grams (1-based inclusive list_slice)."""
    return (
        f"SELECT doc_id, UNNEST(list_transform(range(1, len(toks) - {n} + 2), "
        f"i -> array_to_string(list_slice(toks, i, i + {n} - 1), ' '))) AS gram "
        f"FROM d WHERE len(toks) >= {n}"
    )


# Tie-break contract: the engine's sorted run-length argmax keeps the
# lexicographically smallest gram among equal max counts, hence
# ORDER BY c DESC, gram. Coverage counts only actual repetition (c > 1).
ORACLE_TEXT_REPETITION = f"""
WITH d AS (
    SELECT doc_id, text, LENGTH(text) AS nc,
           {_D_TOKENS.format(t='text')} AS toks
    FROM documents
),
g2 AS ({_ngram_cte(2)}),
c2 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY doc_id, gram),
t2 AS (
    SELECT doc_id, gram, c,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS rn
    FROM c2
),
g5 AS ({_ngram_cte(5)}),
c5 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g5 GROUP BY doc_id, gram),
d5 AS (
    SELECT doc_id, SUM(c * LENGTH(gram)) AS dup_chars FROM c5 WHERE c > 1
    GROUP BY doc_id
)
SELECT d.doc_id,
       t2.gram AS top_2gram,
       CAST(COALESCE(t2.c, 0) AS BIGINT) AS top2_count,
       CASE WHEN COALESCE(t2.c, 0) > 1
            THEN LEAST(10000, CAST(FLOOR(t2.c * LENGTH(t2.gram) * 10000 / d.nc) AS BIGINT))
            ELSE 0 END AS top2_frac_e4,
       LEAST(10000, CAST(FLOOR(COALESCE(d5.dup_chars, 0) * 10000 / d.nc) AS BIGINT)) AS dup5_frac_e4
FROM d
LEFT JOIN t2 ON t2.doc_id = d.doc_id AND t2.rn = 1
LEFT JOIN d5 ON d5.doc_id = d.doc_id
"""




def q_text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style corpus filter: per-rule booleans (length, mean word
    length, stopword floor, 2-gram / 5-gram repetition caps) and the
    combined keep decision. One scan, zero shuffle — the decision a 100 TB
    cleaning pipeline applies before any dedup shuffle."""
    from ..operators import text as T
    from ..operators.dedup import _barrier

    d = _docs(spark, sf_dir).select("doc_id", "text")
    staged = _barrier(d.withColumn("__toks", T.tokens(F.col("text"))))
    staged = _barrier(
        staged.select(
            "doc_id",
            "text",
            T.run_stats(
                F.array_sort(T.shingles_from_tokens(F.col("__toks"), 2))
            ).alias("__r2"),
            T.run_stats(
                F.array_sort(T.shingles_from_tokens(F.col("__toks"), 5))
            ).alias("__r5"),
        )
    )
    flags = T.quality_flags(F.col("text"), F.col("__r2"), F.col("__r5"))
    return staged.select(
        "doc_id", *[c.alias(name) for name, c in flags.items()]
    )


# thresholds mirrored from operators/text.py GOPHER_* constants
ORACLE_TEXT_QUALITY_FILTER = f"""
WITH d AS (
    SELECT doc_id, text, LENGTH(text) AS nc,
           {_D_TOKENS.format(t='text')} AS toks
    FROM documents
),
s AS (
    SELECT doc_id, nc,
           len(toks) AS nt,
           CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS BIGINT) AS total_len,
           len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) AS ns
    FROM d
),
g2 AS ({_ngram_cte(2)}),
c2 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY doc_id, gram),
t2 AS (
    SELECT doc_id, gram, c,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS rn
    FROM c2
),
g5 AS ({_ngram_cte(5)}),
c5 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g5 GROUP BY doc_id, gram),
d5 AS (
    SELECT doc_id, SUM(c * LENGTH(gram)) AS dup_chars FROM c5 WHERE c > 1
    GROUP BY doc_id
),
f AS (
    SELECT s.doc_id,
           s.nt BETWEEN 20 AND 100000 AS keep_len,
           CASE WHEN s.nt > 0
                THEN CAST(FLOOR(s.total_len * 10000 / s.nt) AS BIGINT)
                     BETWEEN 30000 AND 100000
                ELSE FALSE END AS keep_avg_len,
           s.ns >= 2 AS keep_stop,
           (CASE WHEN COALESCE(t2.c, 0) > 1 AND s.nc > 0
                 THEN LEAST(10000, CAST(FLOOR(t2.c * LENGTH(t2.gram) * 10000 / s.nc) AS BIGINT))
                 ELSE 0 END) <= 2000 AS keep_rep2,
           (CASE WHEN s.nc > 0
                 THEN LEAST(10000, CAST(FLOOR(COALESCE(d5.dup_chars, 0) * 10000 / s.nc) AS BIGINT))
                 ELSE 0 END) <= 1500 AS keep_rep5
    FROM s
    LEFT JOIN t2 ON t2.doc_id = s.doc_id AND t2.rn = 1
    LEFT JOIN d5 ON d5.doc_id = s.doc_id
)
SELECT doc_id, keep_len, keep_avg_len, keep_stop, keep_rep2, keep_rep5,
       keep_len AND keep_avg_len AND keep_stop AND keep_rep2 AND keep_rep5 AS keep
FROM f
"""




# --- temporal: as-of join + multi-granularity rollup -------------------------

def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each 'click' event picks up the value and age of
    the same user's most recent 'view' at-or-before it. Union-tag-window
    plan — ONE shuffle on user_id, no range-join expansion
    (operators/temporal.py docstring). Round-3 batch 6: each click also
    carries trailing-1h rolling stats (count + cents sum of the user's
    clicks in [ts-1h, ts], RANGE window) — the rolling aggregation rides
    the join's user_id partitioning, adding a sort but no extra shuffle."""
    from ..operators.temporal import asof_join, rolling_stats

    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.where(F.col("event_type") == "view").select("user_id", "ts", "value")
    j = asof_join(
        clicks, views, on="user_id",
        payload={"value": "view_value", "ts": "view_ts"},
    )
    j = j.withColumn("click_cents", F.round(F.col("value") * 100).cast("long"))
    j = rolling_stats(
        j,
        {
            "n_clicks_1h": F.count(F.lit(1)),
            "cents_1h": F.sum("click_cents"),
        },
        key_col="user_id",
        ts_col="ts",
        window="1 hour",
    )
    return j.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "click_cents",
        F.round(F.col("view_value") * 100).cast("long").alias("view_cents"),
        F.unix_micros(F.col("view_ts")).alias("view_ts_us"),
        "n_clicks_1h",
        "cents_1h",
    )


# DuckDB has native ASOF JOIN (backward, inclusive) — the exact oracle; the
# trailing-window stats are the same RANGE frame over epoch microseconds.
ORACLE_EVENTS_ASOF = """
SELECT c.event_id,
       c.user_id,
       CAST(epoch_us(c.ts) AS BIGINT) AS ts_us,
       CAST(ROUND(c.value * 100) AS BIGINT) AS click_cents,
       CAST(ROUND(v.value * 100) AS BIGINT) AS view_cents,
       CAST(epoch_us(v.ts) AS BIGINT) AS view_ts_us,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_clicks_1h,
       CAST(SUM(CAST(ROUND(c.value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_1h
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts
WINDOW w AS (
    PARTITION BY c.user_id ORDER BY epoch_us(c.ts)
    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
)
"""




def q_events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: event counts, value sums AND
    distinct users per event_type at day/hour/minute granularity, all from
    ONE scan and ONE shuffle (bucket array exploded before the groupBy).
    The 'hour' grain with n_users subsumes the former
    events_tumbling_window query (round-3 window consolidation; the
    F.window streaming-parity path stays exercised by
    q_events_tumbling_window in bench.py and the streaming tests)."""
    from ..operators.temporal import time_rollup

    ev = _events(spark, sf_dir)
    out = time_rollup(
        ev,
        keys=["event_type"],
        aggs=[
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
            F.countDistinct("user_id").alias("n_users"),
        ],
    )
    return out.select(
        "unit",
        F.unix_micros(F.col("bucket")).alias("bucket_us"),
        "event_type",
        "n_events",
        "value_cents",
        "n_users",
    )


ORACLE_EVENTS_TIME_ROLLUP = """
SELECT u.unit,
       CAST(epoch_us(date_trunc(u.unit, e.ts)) AS BIGINT) AS bucket_us,
       e.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e
CROSS JOIN (SELECT unnest(['day', 'hour', 'minute']) AS unit) u
GROUP BY 1, 2, 3
"""


def q_events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled regular time series per user (hypertable
    `time_bucket_gapfill` + `locf` analog): hourly grid from each user's
    first to last observed hour, missing hours forward-filled with the
    most recent value. The per-bucket pick is max(struct(ts, value)) —
    deterministic and engine-exact (raw doubles carried, no arithmetic),
    so the whole 105k-row grid hash-matches the DuckDB oracle."""
    from ..operators.temporal import resample_ffill

    ev = _events(spark, sf_dir)
    out = resample_ffill(ev, unit="hour", step="1 hour")
    return out.select(
        "user_id",
        F.unix_micros(F.col("bucket")).alias("bucket_us"),
        "value_filled",
        "is_observed",
    )


ORACLE_EVENTS_RESAMPLE_FFILL = """
WITH pb AS (
    SELECT user_id AS key, date_trunc('hour', ts) AS bucket,
           (MAX(struct_pack(t := ts, v := value))).v AS v_obs
    FROM events GROUP BY 1, 2
),
span AS (SELECT key, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM pb GROUP BY key),
g AS (SELECT key, UNNEST(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket FROM span)
SELECT g.key AS user_id, CAST(epoch_us(g.bucket) AS BIGINT) AS bucket_us,
       LAST_VALUE(pb.v_obs IGNORE NULLS) OVER (
           PARTITION BY g.key ORDER BY g.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
       pb.v_obs IS NOT NULL AS is_observed
FROM g LEFT JOIN pb ON pb.key = g.key AND pb.bucket = g.bucket
"""




# --- sampling: deterministic hash-based sample / split -----------------------

def q_sampling_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible dataset assembly: every document gets a stable
    train/val/test assignment (80/10/10) and an independent 25% sample
    flag, both pure md5-bucket functions of doc_id — zero shuffle,
    rerun/repartition/engine invariant (operators/sampling.py)."""
    from ..operators import sampling as S

    d = _docs(spark, sf_dir).select("doc_id")
    return d.select(
        "doc_id",
        S.hash_bucket(F.col("doc_id"), "split").alias("split_bucket"),
        S.split_column(
            F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}
        ).alias("split"),
        (S.hash_bucket(F.col("doc_id")) < 2500).alias("in_sample_25"),
    )


_D_BUCKET = (
    "CAST(('0x' || substr(md5(CAST({k} AS VARCHAR) || '{salt}'), 1, 15)) AS BIGINT) % 10000"
)

ORACLE_SAMPLING_SPLIT = f"""
WITH b AS (
    SELECT doc_id,
           {_D_BUCKET.format(k='doc_id', salt='split')} AS sb,
           {_D_BUCKET.format(k='doc_id', salt='')} AS pb
    FROM documents
)
SELECT doc_id,
       sb AS split_bucket,
       CASE WHEN sb < 8000 THEN 'train'
            WHEN sb < 9000 THEN 'val'
            ELSE 'test' END AS split,
       pb < 2500 AS in_sample_25
FROM b
"""




def q_sampling_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum hash sampling on the event stream: 50% of clicks, 10% of
    views, nothing else. The stratum threshold is a CASE expression, not a
    join — zero shuffle and immune to stratum skew."""
    from ..operators import sampling as S

    ev = _events(spark, sf_dir).select("event_id", "event_type")
    return S.stratified_sample(
        ev, key="event_id", strata="event_type",
        fractions={"click": 0.5, "view": 0.1},
    )


ORACLE_SAMPLING_STRATIFIED = f"""
SELECT event_id, event_type
FROM events
WHERE {_D_BUCKET.format(k='event_id', salt='')} <
      CASE event_type WHEN 'view' THEN 1000 WHEN 'click' THEN 5000 ELSE 0 END
"""




# --- corpus-level token statistics -------------------------------------------

def q_text_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with term + document frequency, min_df=2. Built as
    a two-level aggregate ((doc,token) then token) so document frequency is
    a plain count, never a count-distinct Expand over the exploded token
    stream (operators/corpus.py docstring)."""
    from ..operators.corpus import vocabulary

    return vocabulary(_docs(spark, sf_dir), min_df=2)


ORACLE_TEXT_VOCABULARY = f"""
WITH t AS (
    SELECT doc_id, unnest({_D_TOKENS.format(t='text')}) AS token
    FROM documents
),
per_doc AS (
    SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY doc_id, token
)
SELECT token, CAST(SUM(tf) AS BIGINT) AS tf, COUNT(*) AS df
FROM per_doc GROUP BY token HAVING COUNT(*) >= 2
"""




def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over simulated video blobs (utf-8 payload stand-ins):
    16-byte frames, stride 4, md5 per kept frame. Selection is pure binary
    Column exprs BEFORE any Python/decode stage."""
    from ..operators import multimodal as M

    d = _docs(spark, sf_dir)
    frames = M.frame_sample(M.attach_blob(d, "doc_id", "text"))
    return frames.select("doc_id", "frame_idx", "n_bytes", "frame_md5")


# The engine chunks real BYTES; DuckDB 1.0 has no BLOB substring, so the
# oracle chunks VARCHAR instead — equivalent here because the fixture text
# is pure ASCII (verified: zero non-ASCII docs), where byte and char
# offsets coincide and md5(chunk-as-text) == md5(chunk-as-bytes).
ORACLE_MULTIMODAL_FRAME_SAMPLE = """
WITH d AS (
    SELECT doc_id, text, CAST(CEIL(LENGTH(text) / 16.0) AS INT) AS nf
    FROM documents
),
f AS (
    SELECT doc_id,
           UNNEST(list_filter(range(0, nf), i -> i % 4 = 0)) AS frame_idx,
           text
    FROM d WHERE nf > 0
)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(LENGTH(substring(text, frame_idx * 16 + 1, 16)) AS BIGINT) AS n_bytes,
       md5(substring(text, frame_idx * 16 + 1, 16)) AS frame_md5
FROM f
"""




# --- the full cleaning pipeline: filter -> exact dedup -> near-dup dedup -----

def q_corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning, the composition a training-data pipeline
    actually runs: Gopher quality filter (per-row, zero shuffle) -> exact
    dedup on md5 fingerprint (one fingerprint-keyed shuffle) -> MinHash-LSH
    near-dup clustering (banded bucket join, no all-pairs) -> keep each
    cluster's min-id representative. Output: the surviving doc_ids.

    Stage order matters at 100 TB: the cheap per-row filter runs FIRST so
    every shuffle downstream moves only surviving documents."""
    from ..operators import text as T
    from ..operators.dedup import (
        _barrier,
        connected_components,
        exact_dedup,
        minhash_lsh_pairs,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    staged = _barrier(d.withColumn("__toks", T.tokens(F.col("text"))))
    staged = _barrier(
        staged.select(
            "doc_id",
            "text",
            T.run_stats(
                F.array_sort(T.shingles_from_tokens(F.col("__toks"), 2))
            ).alias("__r2"),
            T.run_stats(
                F.array_sort(T.shingles_from_tokens(F.col("__toks"), 5))
            ).alias("__r5"),
        )
    )
    keep = T.quality_flags(F.col("text"), F.col("__r2"), F.col("__r5"))["keep"]
    kept = staged.where(keep).select("doc_id", "text")

    uniq = exact_dedup(kept, "doc_id", "text")
    pairs = minhash_lsh_pairs(uniq, "doc_id", "text", k=16, bands=8, shingle_k=2)
    cc = connected_components(pairs, uniq.select("doc_id"))
    return cc.where(F.col("is_representative")).select("doc_id")


def _quality_kept_sql() -> str:
    """(doc_id, text) of documents passing the Gopher filter — the first
    pipeline stage, reusing the rule thresholds of ORACLE_TEXT_QUALITY_FILTER."""
    return f"""
WITH dq AS (
    SELECT doc_id, text, LENGTH(text) AS nc,
           {_D_TOKENS.format(t='text')} AS toks
    FROM documents
),
sq AS (
    SELECT doc_id, nc, len(toks) AS nt,
           CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS BIGINT) AS total_len,
           len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) AS ns
    FROM dq
),
gq2 AS (SELECT doc_id, UNNEST(list_transform(range(1, len(toks) - 1),
        i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS gram
        FROM dq WHERE len(toks) >= 2),
cq2 AS (SELECT doc_id, gram, COUNT(*) AS c FROM gq2 GROUP BY doc_id, gram),
tq2 AS (SELECT doc_id, gram, c,
        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS rn FROM cq2),
gq5 AS (SELECT doc_id, UNNEST(list_transform(range(1, len(toks) - 4),
        i -> array_to_string(list_slice(toks, i, i + 4), ' '))) AS gram
        FROM dq WHERE len(toks) >= 5),
cq5 AS (SELECT doc_id, gram, COUNT(*) AS c FROM gq5 GROUP BY doc_id, gram),
dq5 AS (SELECT doc_id, SUM(c * LENGTH(gram)) AS dup_chars FROM cq5 WHERE c > 1
        GROUP BY doc_id)
SELECT dq.doc_id, dq.text
FROM dq
JOIN sq ON sq.doc_id = dq.doc_id
LEFT JOIN tq2 ON tq2.doc_id = dq.doc_id AND tq2.rn = 1
LEFT JOIN dq5 ON dq5.doc_id = dq.doc_id
WHERE sq.nt BETWEEN 20 AND 100000
  AND CAST(FLOOR(sq.total_len * 10000 / sq.nt) AS BIGINT) BETWEEN 30000 AND 100000
  AND sq.ns >= 2
  AND (CASE WHEN COALESCE(tq2.c, 0) > 1 AND sq.nc > 0
            THEN LEAST(10000, CAST(FLOOR(tq2.c * LENGTH(tq2.gram) * 10000 / sq.nc) AS BIGINT))
            ELSE 0 END) <= 2000
  AND (CASE WHEN sq.nc > 0
            THEN LEAST(10000, CAST(FLOOR(COALESCE(dq5.dup_chars, 0) * 10000 / sq.nc) AS BIGINT))
            ELSE 0 END) <= 1500
"""


ORACLE_CORPUS_CLEAN_PIPELINE = f"""
WITH RECURSIVE
kept AS ({_quality_kept_sql()}),
fp AS (
    SELECT doc_id, text, md5({_D_NORM.format(t='text')}) AS f FROM kept
),
uniq AS (
    SELECT doc_id, text FROM fp
    WHERE doc_id IN (SELECT MIN(doc_id) FROM fp GROUP BY f)
),
pairs AS ({_lsh_pairs_sql("uniq")}),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(id, anc) AS (
    SELECT doc_id, doc_id FROM uniq
    UNION
    SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id FROM reach GROUP BY id HAVING MIN(anc) = id
"""




# --- pretrain: benchmark decontamination -------------------------------------

def q_pretrain_contamination_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-leakage scan: hash-split documents 90/10 into pseudo
    train/benchmark halves (salt 'decontam'), then count per train doc the
    distinct word 5-grams it shares with the benchmark half. Join key is
    the 62-bit gram hash (8 bytes on the wire, never gram text); the
    benchmark gram set broadcasts. n=5 on this fixture plays the role the
    public pipelines' 13-gram rule plays on real text."""
    from ..operators import sampling as S
    from ..operators.pretrain import contamination_hits

    d = _docs(spark, sf_dir).select("doc_id", "text")
    b = S.hash_bucket(F.col("doc_id"), "decontam")
    train = d.where(b < 9000)
    bench = d.where(b >= 9000)
    return contamination_hits(train, bench, n=5)


_DECONTAM_CTES = f"""
d AS (
    SELECT doc_id, text,
           {_D_TOKENS.format(t='text')} AS toks,
           {_D_BUCKET.format(k='doc_id', salt='decontam')} AS b
    FROM documents
),
g AS (
    SELECT doc_id, b,
           UNNEST(list_distinct(list_transform(range(1, len(toks) - 3),
                  i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS gram
    FROM d WHERE len(toks) >= 5
),
gh AS (
    SELECT doc_id, b, {_D_HASH64.format(s='gram')} AS gram_h FROM g
),
bench AS (SELECT DISTINCT gram_h FROM gh WHERE b >= 9000),
hits AS (
    SELECT gh.doc_id, COUNT(*) AS n_hit_grams
    FROM gh JOIN bench USING (gram_h)
    WHERE gh.b < 9000
    GROUP BY gh.doc_id
)"""


ORACLE_PRETRAIN_CONTAMINATION_HITS = f"""
WITH {_DECONTAM_CTES}
SELECT doc_id, n_hit_grams FROM hits
"""




def q_pretrain_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surviving training corpus: train half minus every document
    sharing a 5-gram with the benchmark half (anti-join on doc_id)."""
    from ..operators import sampling as S
    from ..operators.pretrain import decontaminate

    d = _docs(spark, sf_dir).select("doc_id", "text")
    b = S.hash_bucket(F.col("doc_id"), "decontam")
    train = d.where(b < 9000)
    bench = d.where(b >= 9000)
    return decontaminate(train, bench, n=5).select("doc_id")


ORACLE_PRETRAIN_DECONTAMINATE = f"""
WITH {_DECONTAM_CTES}
SELECT doc_id FROM d
WHERE b < 9000 AND doc_id NOT IN (SELECT doc_id FROM hits)
"""




# --- pretrain: sequence packing ----------------------------------------------

def q_pretrain_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk layout into 64-token context windows. bucket_width
    100 forces the distributed prefix-sum path (5+ buckets at sf0.01) so
    the contract exercises the two-phase algebra, not a degenerate single
    bucket."""
    from ..operators.pretrain import pack_sequences

    d = _docs(spark, sf_dir).select("doc_id", "text")
    return pack_sequences(d, context_len=64, bucket_width=100)


ORACLE_PRETRAIN_PACK_SEQUENCES = f"""
WITH t AS (
    SELECT doc_id, CAST(len({_D_TOKENS.format(t='text')}) AS BIGINT) AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, n_tokens,
           SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS tok_start
    FROM t
)
SELECT doc_id, n_tokens, CAST(tok_start AS BIGINT) AS tok_start,
       CAST(FLOOR(tok_start / 64) AS BIGINT) AS pack_first,
       CAST(GREATEST(FLOOR(tok_start / 64),
                     FLOOR((tok_start + n_tokens - 1) / 64)) AS BIGINT) AS pack_last,
       CAST(GREATEST(FLOOR(tok_start / 64),
                     FLOOR((tok_start + n_tokens - 1) / 64))
            - FLOOR(tok_start / 64) + 1 AS BIGINT) AS n_packs
FROM c
"""




# --- pretrain: pattern redaction ---------------------------------------------

def q_pretrain_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrub over documents: the standard email/url/number rules
    (which this synthetic fixture cannot trigger — their zero counts are
    themselves oracle-checked) plus a fixture-active rule replacing the
    standalone token 'a' so the rewrite path is exercised end to end.
    Patterns are RE2-compatible Java regex, replicated verbatim in DuckDB."""
    from ..operators.pretrain import PII_PATTERNS, redact

    pats = dict(PII_PATTERNS)
    pats["unk"] = (r"\ba\b", "<UNK>")
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return redact(d, pats)


ORACLE_PRETRAIN_REDACT = r"""
WITH s1 AS (
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
    FROM documents
),
s2 AS (
    SELECT doc_id, n_email,
           len(regexp_extract_all(t, 'https?://[^\s]+')) AS n_url,
           regexp_replace(t, 'https?://[^\s]+', '<URL>', 'g') AS t
    FROM s1
),
s3 AS (
    SELECT doc_id, n_email, n_url,
           len(regexp_extract_all(t, '[0-9][0-9 .,-]{5,}[0-9]')) AS n_number,
           regexp_replace(t, '[0-9][0-9 .,-]{5,}[0-9]', '<NUM>', 'g') AS t
    FROM s2
),
s4 AS (
    SELECT doc_id, n_email, n_url, n_number,
           len(regexp_extract_all(t, '\ba\b')) AS n_unk,
           regexp_replace(t, '\ba\b', '<UNK>', 'g') AS t
    FROM s3
)
SELECT doc_id, t AS text_redacted,
       CAST(n_email AS BIGINT) AS n_email, CAST(n_url AS BIGINT) AS n_url,
       CAST(n_number AS BIGINT) AS n_number, CAST(n_unk AS BIGINT) AS n_unk
FROM s4
"""




# --- embeddings: int8 quantization -------------------------------------------

_D_QUANT = """
    SELECT vec_id,
           CASE WHEN ma = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                ELSE list_transform(embedding,
                     x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / ma + 0.5) AS BIGINT))
           END AS qvec,
           CAST(FLOOR(CASE WHEN ma = 0 THEN 0.0 ELSE ma / 127.0 END * 1000000000.0)
                AS BIGINT) AS scale_e9
    FROM (SELECT vec_id, embedding,
                 list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma
          FROM embeddings)"""


_PQ_M, _PQ_KSUB, _PQ_DSUB = 8, 16, 8


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantization family in one row per vector: symmetric per-vector
    int8 codes + fixed-point scale, plus the round-3 product-quantization
    codes (m=8 subspaces x 16 centroids, codebook = first-16-rows int8
    subvectors) and the reconstruction's exact squared norm. Every column
    is integer arithmetic, byte-exact across engines — including the PQ
    argmin (integer L2 costs, ties to the lowest centroid id)."""
    from ..operators.similarity import pq_default_codebook, pq_encode, quantize_int8

    emb = _emb(spark, sf_dir)
    out = quantize_int8(emb)
    cb = pq_default_codebook(emb, m=_PQ_M, ksub=_PQ_KSUB)
    pq = pq_encode(emb, cb)
    # Codes serialized to CSV: raw array columns are awkward to hash/sort
    # portably across engines (same convention as the minhash signature query).
    return (
        out.join(pq, "vec_id")
        .select(
            "vec_id",
            F.array_join(F.col("qvec").cast("array<string>"), ",").alias("qvec_csv"),
            "scale_e9",
            F.array_join(F.col("codes").cast("array<string>"), ",").alias(
                "pq_codes_csv"
            ),
            F.col("rnorm2").alias("pq_rnorm2"),
        )
    )


ORACLE_EMBEDDING_QUANTIZE = f"""
WITH q AS ({_D_QUANT}),
cb AS (
    SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c, qvec
    FROM (SELECT vec_id, qvec FROM q ORDER BY vec_id LIMIT {_PQ_KSUB})
),
costs AS (
    SELECT v.vec_id, t.s, cb.c,
           list_aggregate(list_transform(range(1, {_PQ_DSUB} + 1),
               j -> cb.qvec[t.s * {_PQ_DSUB} + j] * cb.qvec[t.s * {_PQ_DSUB} + j]
                    - 2 * v.qvec[t.s * {_PQ_DSUB} + j] * cb.qvec[t.s * {_PQ_DSUB} + j]),
               'sum') AS cost,
           list_aggregate(list_transform(range(1, {_PQ_DSUB} + 1),
               j -> cb.qvec[t.s * {_PQ_DSUB} + j] * cb.qvec[t.s * {_PQ_DSUB} + j]),
               'sum') AS cn2
    FROM q v
    CROSS JOIN generate_series(0, {_PQ_M} - 1) t(s)
    CROSS JOIN cb
),
chosen AS (
    SELECT vec_id, s, c, cn2,
           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY cost ASC, c ASC) AS rn
    FROM costs
),
pq AS (
    SELECT vec_id,
           string_agg(CAST(c AS VARCHAR), ',' ORDER BY s) AS pq_codes_csv,
           CAST(SUM(cn2) AS BIGINT) AS pq_rnorm2
    FROM chosen WHERE rn = 1 GROUP BY vec_id
)
SELECT q.vec_id, array_to_string(q.qvec, ',') AS qvec_csv, q.scale_e9,
       pq.pq_codes_csv, pq.pq_rnorm2
FROM q JOIN pq ON q.vec_id = pq.vec_id
"""




def q_similarity_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k cosine over int8 codes. Scales cancel out of cosine, so the
    score is pure integer dots inside one double expression — the ranking
    (and its e6 fixed-point) is exactly reproducible in SQL, which a
    float32-accumulation top-k is not."""
    from ..operators.similarity import quantized_cosine_topk

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5)
    return quantized_cosine_topk(emb, queries, k=10)


ORACLE_SIMILARITY_QUANTIZED_TOPK = f"""
WITH qz AS ({_D_QUANT}),
q AS (SELECT vec_id AS query_id, qvec AS qv FROM qz WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, qvec AS cv FROM qz),
scored AS (
    SELECT query_id, neighbor_id,
           CAST(FLOOR(
               CAST(list_aggregate(list_transform(range(1, len(qv) + 1),
                        i -> qv[i] * cv[i]), 'sum') AS DOUBLE)
               / (sqrt(CAST(list_aggregate(list_transform(range(1, len(qv) + 1),
                        i -> qv[i] * qv[i]), 'sum') AS DOUBLE))
                  * sqrt(CAST(list_aggregate(list_transform(range(1, len(cv) + 1),
                        i -> cv[i] * cv[i]), 'sum') AS DOUBLE)))
               * 1000000) AS BIGINT) AS qcosine_e6
    FROM c CROSS JOIN q
    WHERE neighbor_id <> query_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY qcosine_e6 DESC, neighbor_id) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, qcosine_e6
FROM ranked WHERE rank <= 10
"""




# --- semi-structured: JSON property extraction -------------------------------

def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed projection out of the per-event JSON properties blob, then a
    grouped rollup — the standard first step on any real event stream. One
    `from_json` parse per row (JVM-side, codegen; operators/semistructured.py),
    never a Python UDF; malformed blobs become NULLs, not task failures."""
    from ..operators.semistructured import with_json_fields

    ev = _events(spark, sf_dir).select("event_id", "event_type", "props")
    typed = with_json_fields(ev, "props", "k BIGINT")
    return typed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum(F.when(F.col("k") >= 50, 1).otherwise(0)).alias("n_hi"),
    )


ORACLE_EVENTS_JSON_EXTRACT = """
WITH typed AS (
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
)
SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k, MAX(k) AS max_k,
       CAST(SUM(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
FROM typed GROUP BY event_type
"""




# --- sampling: temperature-weighted source mixing ----------------------------

def q_sampling_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt-temperature source mixing targeting a ~200-doc corpus: per-source
    keep thresholds derived in integer fixed-point from the source counts
    (operators/sampling.py:temperature_mix), membership by stable hash
    bucket. Bit-exact across engines — the oracle reproduces the thresholds
    and the kept set identically."""
    from ..operators import sampling as S

    d = _docs(spark, sf_dir).select("doc_id", "source")
    out = S.temperature_mix(d, key="doc_id", strata="source", budget=200)
    return out.select("doc_id", "source")


_D_MIX_BUCKET = _D_BUCKET.format(k="doc_id", salt="mix")

ORACLE_SAMPLING_TEMPERATURE_MIX = f"""
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
w AS (SELECT source, n,
             CAST(FLOOR(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS w
      FROM c),
th AS (SELECT source,
              LEAST(CAST(FLOOR(2000000 * w / ((SELECT SUM(w) FROM w) * n))
                         AS BIGINT),
                    10000) AS thresh
       FROM w)
SELECT d.doc_id, d.source
FROM documents d JOIN th ON d.source = th.source
WHERE {_D_MIX_BUCKET} < th.thresh
"""




# --- clustering: exact integer k-means ----------------------------------------

_KM_K, _KM_ITERS, _KM_DIM = 8, 2, 64


def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means cell assignment over the embedding table after 2
    exact integer Lloyd's iterations (operators/similarity.py:
    kmeans_fit_int8). An ITERATIVE algorithm with a full SQL oracle: every
    step is integer or correctly-rounded IEEE, so the oracle can unroll the
    same iterations and match bit-for-bit."""
    from ..operators.similarity import kmeans_assign_int8, kmeans_fit_int8

    emb = _emb(spark, sf_dir)
    cents = kmeans_fit_int8(emb, k=_KM_K, n_iter=_KM_ITERS)
    return kmeans_assign_int8(emb, cents).select("vec_id", "cell")


def _oracle_kmeans(
    final: str = "SELECT vec_id, CAST(cid AS INT) AS cell FROM afinal",
) -> str:
    """Unrolled-SQL mirror of kmeans_fit_int8 + kmeans_assign_int8:
    n_iter x (assign, integer-floor-mean update), then the final assign.
    ``final`` is the closing SELECT over the `afinal` (vec_id, cid) CTE."""
    nn = "list_aggregate(list_transform({c}.c, x -> x * x), 'sum')"
    score = (
        "CAST(list_aggregate(list_transform(range(1, {dim1}), "
        "j -> v.qvec[j] * {c}.c[j]), 'sum') AS DOUBLE) / "
        "(CASE WHEN {nn} = 0 THEN 1.0 ELSE sqrt(CAST({nn} AS DOUBLE)) END)"
    )

    def assign(name: str, csrc: str) -> str:
        s = score.format(dim1=_KM_DIM + 1, c="c", nn=nn.format(c="c"))
        return (
            f"{name} AS (SELECT vec_id, cid FROM ("
            f"SELECT v.vec_id, c.cid, ROW_NUMBER() OVER (PARTITION BY v.vec_id "
            f"ORDER BY {s} DESC, c.cid DESC) AS rn "
            f"FROM qz v CROSS JOIN {csrc} c) WHERE rn = 1)"
        )

    def update(uname: str, cname: str, asrc: str) -> str:
        return (
            f"{uname} AS (SELECT a.cid, t.j, "
            f"CAST(FLOOR(CAST(SUM(v.qvec[t.j]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cj "
            f"FROM qz v JOIN {asrc} a USING (vec_id) "
            f"CROSS JOIN generate_series(1, {_KM_DIM}) t(j) GROUP BY a.cid, t.j), "
            f"{cname} AS (SELECT cid, list(cj ORDER BY j) AS c FROM {uname} GROUP BY cid)"
        )

    ctes = [
        f"qz AS ({_D_QUANT})",
        f"c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, qvec AS c "
        f"FROM (SELECT vec_id, qvec FROM qz ORDER BY vec_id LIMIT {_KM_K}))",
    ]
    for it in range(_KM_ITERS):
        ctes.append(assign(f"a{it}", f"c{it}"))
        ctes.append(update(f"u{it}", f"c{it + 1}", f"a{it}"))
    ctes.append(assign("afinal", f"c{_KM_ITERS}"))
    return "WITH " + ",\n".join(ctes) + "\n" + final




# --- streaming: stream-stream interval join (batch-checkable) -----------------

def q_events_funnel_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> purchase conversions within 30 minutes per user
    (streaming/windows.py:view_purchase_funnel). The same expression is
    Spark's watermarked stream-stream interval join when fed streams; run
    in batch here so the DuckDB range-join oracle pins the semantics."""
    from ..streaming import view_purchase_funnel

    ev = _events(spark, sf_dir)
    views = ev.where(F.col("event_type") == "view")
    purchases = ev.where(F.col("event_type") == "purchase")
    return view_purchase_funnel(views, purchases, max_lag_minutes=30)


ORACLE_EVENTS_FUNNEL_JOIN = """
WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
           FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, value
      FROM events WHERE event_type = 'purchase')
SELECT v.user_id, v.view_id, p.purchase_id,
       epoch_us(p.purchase_ts) - epoch_us(v.view_ts) AS lag_us,
       CAST(round(p.value * 100) AS BIGINT) AS purchase_cents
FROM v JOIN p ON v.user_id = p.user_id
 AND p.purchase_ts > v.view_ts
 AND p.purchase_ts <= v.view_ts + INTERVAL 30 MINUTE
"""




def q_embedding_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster label purity — the standard clustering-quality rollup:
    k-means cells joined back to ground-truth labels, majority label and
    fixed-point purity per cell. Because the cells themselves are exact
    (integer k-means), even this EVALUATION of an iterative algorithm has
    a full SQL oracle."""
    from pyspark.sql import Window

    from ..operators.similarity import kmeans_assign_int8, kmeans_fit_int8

    emb = _emb(spark, sf_dir)
    cents = kmeans_fit_int8(emb, k=_KM_K, n_iter=_KM_ITERS)
    cells = kmeans_assign_int8(emb, cents)
    cnt = (
        cells.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cell", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rank = Window.partitionBy("cell").orderBy(F.col("n").desc(), F.col("label").asc())
    total = Window.partitionBy("cell")
    return (
        cnt.withColumn("rn", F.row_number().over(rank))
        .withColumn("cell_n", F.sum("n").over(total))
        .where(F.col("rn") == 1)
        .select(
            "cell",
            F.col("cell_n").alias("n"),
            F.col("label").alias("majority_label"),
            F.floor(F.col("n") * 10000 / F.col("cell_n")).alias("purity_e4"),
        )
    )


_ORACLE_CLUSTER_PURITY_FINAL = """
, joined AS (SELECT a.vec_id, a.cid AS cell, e.label
             FROM afinal a JOIN embeddings e USING (vec_id)),
cnt AS (SELECT cell, label, COUNT(*) AS n FROM joined GROUP BY 1, 2),
maj AS (SELECT cell, label, n,
               ROW_NUMBER() OVER (PARTITION BY cell ORDER BY n DESC, label ASC) AS rn,
               CAST(SUM(n) OVER (PARTITION BY cell) AS BIGINT) AS cell_n
        FROM cnt)
SELECT CAST(cell AS INT) AS cell, cell_n AS n, label AS majority_label,
       CAST(FLOOR(n * 10000 / cell_n) AS BIGINT) AS purity_e4
FROM maj WHERE rn = 1
"""




# --- corpus histograms through the single-pass histogrammer -------------------

def q_corpus_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's flagship operator (plans/histogrammer.py: one scan, one
    shuffle for ALL booked plots + cutflow) applied to the documents table:
    token-count and quality-score histograms at the root selection, a
    token-count histogram under a quality cut, and a 3-node corpus cutflow
    (all docs -> quality>=5000 -> english). Demonstrates the single-pass
    multi-histogram plan is not HEP-specific."""
    from ..operators import text as T
    from ..plans import run_analysis
    from ..plans.cutflow import CutFlowReport
    from ..plans.plots import EquidistantBinning, Plot
    from ..plans.selection import Selection

    d = _docs(spark, sf_dir).withColumns(
        {
            "n_tokens": T.token_count(F.col("text")),
            "quality_e4": T.quality_score_e4(F.col("text")),
        }
    )
    root = Selection.root()
    sel_q = root.refine("quality", F.col("quality_e4") >= 5000)
    sel_en = sel_q.refine("english", F.col("lang") == "en")
    plots = [
        Plot.make1D("tokcount", F.col("n_tokens"), root, EquidistantBinning(20, 0.0, 100.0)),
        Plot.make1D("quality", F.col("quality_e4"), root, EquidistantBinning(20, 0.0, 10000.0)),
        Plot.make1D("tokcount_quality", F.col("n_tokens"), sel_q, EquidistantBinning(20, 0.0, 100.0)),
    ]
    cfr = CutFlowReport("docs")
    for sel in (root, sel_q, sel_en):
        cfr.add(sel)
    return run_analysis(d, plots, [cfr])


_D_QUALITY_CTE = f"""
d AS (
    SELECT doc_id, lang,
           {_D_TOKENS.format(t='text')} AS toks,
           length(text) AS nc,
           length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS np
    FROM documents
),
s AS (
    SELECT lang, len(toks) AS nt,
           CAST(FLOOR(
               CAST(FLOOR(LEAST(nc * 10000 / 500, 10000.0)) AS BIGINT)
             * (CASE WHEN nc > 0 THEN CAST(FLOOR(10000 - np * 10000 / nc) AS BIGINT) ELSE 0 END)
             / 10000
             * (CASE WHEN nt0 > 0 THEN CAST(FLOOR(10000 - ns * 10000 / nt0) AS BIGINT) ELSE 0 END)
             / 10000) AS BIGINT) AS q
    FROM (SELECT lang, toks, nc, np, len(toks) AS nt0,
                 len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) AS ns
          FROM d)
)
"""

_D_HBIN = (
    "CASE WHEN {x} < {lo} THEN -1 WHEN {x} >= {hi} THEN {n} "
    "ELSE LEAST(CAST(FLOOR(({x} - {lo}) / {w}) AS INT), {n} - 1) END"
)


def _hist_row(plot: str, xbin: str, where: str = "") -> str:
    return (
        f"SELECT '{plot}' AS plot, 'plot' AS kind, {xbin} AS bin, "
        f"0 AS bin2, 0 AS bin3, SUM(1.0) AS sumw, SUM(1.0) AS sumw2, "
        f"COUNT(*) AS n FROM s {where} GROUP BY 3"
    )


def _cutflow_row(plot: str, where: str = "") -> str:
    return (
        f"SELECT '{plot}' AS plot, 'cutflow' AS kind, 0 AS bin, 0 AS bin2, "
        f"0 AS bin3, SUM(1.0) AS sumw, SUM(1.0) AS sumw2, COUNT(*) AS n "
        f"FROM s {where}"
    )


_TOKBIN = _D_HBIN.format(x="nt", lo="0.0", hi="100.0", n=20, w="5.0")
_QBIN = _D_HBIN.format(x="q", lo="0.0", hi="10000.0", n=20, w="500.0")

ORACLE_CORPUS_HISTOGRAMS = f"""
WITH {_D_QUALITY_CTE}
{_hist_row('tokcount', _TOKBIN)}
UNION ALL {_hist_row('quality', _QBIN)}
UNION ALL {_hist_row('tokcount_quality', _TOKBIN, 'WHERE q >= 5000')}
UNION ALL {_cutflow_row('docs/noSel')}
UNION ALL {_cutflow_row('docs/quality', 'WHERE q >= 5000')}
UNION ALL {_cutflow_row('docs/english', "WHERE q >= 5000 AND lang = 'en'")}
"""




# --- corpus: bigram coherence (LM-perplexity proxy) ---------------------------

def q_text_bigram_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document corpus-conditional bigram frequency average
    (operators/corpus.py:bigram_coherence) — the cheap statistical stand-in
    for a perplexity quality filter, engine-exact via e6 fixed-point."""
    from ..operators.corpus import bigram_coherence

    return bigram_coherence(_docs(spark, sf_dir))


ORACLE_TEXT_BIGRAM_COHERENCE = f"""
WITH d AS (
    SELECT doc_id, {_D_TOKENS.format(t='text')} AS toks FROM documents
),
b AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks)),
                  i -> toks[i] || chr(9) || toks[i + 1])) AS bg
    FROM d WHERE len(toks) >= 2
),
cbg AS (SELECT bg, COUNT(*) AS c_bg FROM b GROUP BY 1),
cpre AS (SELECT string_split(bg, chr(9))[1] AS w1, COUNT(*) AS c_pre
         FROM b GROUP BY 1),
r AS (
    SELECT b.doc_id,
           CAST(FLOOR(1000000 * cbg.c_bg / cpre.c_pre) AS BIGINT) AS r_e6
    FROM b
    JOIN cbg USING (bg)
    JOIN cpre ON string_split(b.bg, chr(9))[1] = cpre.w1
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(FLOOR(CAST(SUM(r_e6) AS DOUBLE) / COUNT(*)) AS BIGINT) AS coherence_e6
FROM r GROUP BY 1
"""




def q_events_abandoned_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Views with no same-user purchase within 30 minutes
    (streaming/windows.py:abandoned_views) — the LEFT OUTER interval join
    whose streaming form emits unmatched rows on watermark passage."""
    from ..streaming import abandoned_views

    ev = _events(spark, sf_dir)
    return abandoned_views(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"),
        max_lag_minutes=30,
    )


ORACLE_EVENTS_ABANDONED_VIEWS = """
WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
           FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
SELECT v.user_id, v.view_id, epoch_us(v.view_ts) AS view_us
FROM v
WHERE NOT EXISTS (
    SELECT 1 FROM p
    WHERE p.user_id = v.user_id
      AND p.ts > v.view_ts
      AND p.ts <= v.view_ts + INTERVAL 30 MINUTE
)
"""




# =============================================================================
# MERGED driver queries (round 3) — driver-window consolidation.
#
# The driver's CORRECTNESS harness records exactly the FIRST 50 registered
# queries (VERDICT round 2, "Next round" #1). The per-operator queries above
# stay as building blocks (bench.py / tests keep using them); registration
# consolidates near-duplicate per-document projections into multi-column
# queries so every oracle-checked operator fits inside the window. Each
# operator still owns its output column(s), so failures stay attributable.
# =============================================================================


def q_text_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All per-document text-analysis scalars in ONE pass (one scan, zero
    shuffle): token/char/punct/stopword counts + quality score
    (text_stats), n-gram language ID with per-language scores
    (text_langid), normalized fingerprint + 62-bit hash
    (text_fingerprint), BPE-ish subword count + expansion factor
    (text_bpe_tokens), and — round-3 window consolidation, folding
    text_filters in — the Gopher-style repetition statistics plus the
    per-rule quality-filter booleans over once-staged token/run arrays.
    Merges six former queries into one driver-window slot."""
    from ..operators import text as T
    from ..operators.dedup import _barrier

    d = _docs(spark, sf_dir).select("doc_id", "text")
    staged = _barrier(d.withColumn("__toks", T.tokens(F.col("text"))))
    staged = _barrier(
        staged.withColumn(
            "__r2",
            T.run_stats(F.array_sort(T.shingles_from_tokens(F.col("__toks"), 2))),
        ).withColumn(
            "__r5",
            T.run_stats(F.array_sort(T.shingles_from_tokens(F.col("__toks"), 5))),
        )
    )
    t = F.col("text")
    scores = T.lang_scores(t)
    flags = T.quality_flags(t, F.col("__r2"), F.col("__r5"))
    return staged.select(
        "doc_id",
        F.col("__r2")["top"].alias("top_2gram"),
        F.col("__r2")["top_count"].alias("top2_count"),
        T.top_ngram_char_frac_e4(F.col("__r2"), t).alias("top2_frac_e4"),
        T.dup_ngram_char_frac_e4(F.col("__r5"), t).alias("dup5_frac_e4"),
        *[c.alias(name) for name, c in flags.items()],
        T.token_count(t).alias("n_tokens"),
        T.char_count(t).alias("n_chars_m"),
        T.punct_count(t).alias("n_punct"),
        T.stopword_count(t).alias("n_stop"),
        T.avg_token_len_e4(t).alias("avg_tok_len_e4"),
        T.quality_score_e4(t).alias("quality_e4"),
        T.lang_id(t).alias("lang_guess"),
        *[scores[lang].alias(f"score_{lang}") for lang in T.LANG_MARKERS],
        T.fingerprint(t).alias("fp"),
        T.hash64(t).alias("h64"),
        T.bpe_token_count(t).alias("n_bpe_tokens"),
        F.when(
            T.token_count(t) > 0,
            F.floor(T.bpe_token_count(t) * 10000 / T.token_count(t)),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("expansion_e4"),
    )


def _oracle_text_doc_features() -> str:
    m = _markers_sql()
    score = {
        lang: f"CAST(len(list_filter(toks, x -> list_contains({arr}, x))) AS BIGINT)"
        for lang, arr in m.items()
    }
    return f"""
WITH d AS (
    SELECT doc_id, text,
           {_D_TOKENS.format(t='text')} AS toks,
           length(text) AS nc,
           length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS np,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS nb
    FROM documents
),
s AS (
    SELECT doc_id, text, nc, np, nb,
           len(toks) AS nt,
           CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS BIGINT) AS total_len,
           len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) AS ns,
           {score['en']} AS score_en,
           {score['de']} AS score_de,
           {score['es']} AS score_es,
           {score['fr']} AS score_fr
    FROM d
),
g2 AS ({_ngram_cte(2)}),
c2 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY doc_id, gram),
t2 AS (
    SELECT doc_id, gram, c,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS rn
    FROM c2
),
g5 AS ({_ngram_cte(5)}),
c5 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g5 GROUP BY doc_id, gram),
d5 AS (
    SELECT doc_id, SUM(c * LENGTH(gram)) AS dup_chars FROM c5 WHERE c > 1
    GROUP BY doc_id
),
r AS (
    SELECT d.doc_id,
           t2.gram AS top_2gram,
           CAST(COALESCE(t2.c, 0) AS BIGINT) AS top2_count,
           CASE WHEN COALESCE(t2.c, 0) > 1
                THEN LEAST(10000, CAST(FLOOR(t2.c * LENGTH(t2.gram) * 10000 / d.nc) AS BIGINT))
                ELSE 0 END AS top2_frac_e4,
           LEAST(10000, CAST(FLOOR(COALESCE(d5.dup_chars, 0) * 10000 / d.nc) AS BIGINT)) AS dup5_frac_e4,
           s.nt BETWEEN 20 AND 100000 AS keep_len,
           CASE WHEN s.nt > 0
                THEN CAST(FLOOR(s.total_len * 10000 / s.nt) AS BIGINT)
                     BETWEEN 30000 AND 100000
                ELSE FALSE END AS keep_avg_len,
           s.ns >= 2 AS keep_stop
    FROM d
    JOIN s ON s.doc_id = d.doc_id
    LEFT JOIN t2 ON t2.doc_id = d.doc_id AND t2.rn = 1
    LEFT JOIN d5 ON d5.doc_id = d.doc_id
)
SELECT s.doc_id,
       r.top_2gram, r.top2_count, r.top2_frac_e4, r.dup5_frac_e4,
       r.keep_len, r.keep_avg_len, r.keep_stop,
       r.top2_frac_e4 <= 2000 AS keep_rep2,
       r.dup5_frac_e4 <= 1500 AS keep_rep5,
       r.keep_len AND r.keep_avg_len AND r.keep_stop
           AND r.top2_frac_e4 <= 2000 AND r.dup5_frac_e4 <= 1500 AS keep,
       CAST(nt AS BIGINT) AS n_tokens,
       CAST(nc AS BIGINT) AS n_chars_m,
       CAST(np AS BIGINT) AS n_punct,
       CAST(ns AS BIGINT) AS n_stop,
       CASE WHEN nt > 0 THEN CAST(FLOOR(total_len * 10000 / nt) AS BIGINT) ELSE 0 END AS avg_tok_len_e4,
       CAST(FLOOR(
           CAST(FLOOR(LEAST(nc * 10000 / 500, 10000.0)) AS BIGINT)
         * (CASE WHEN nc > 0 THEN CAST(FLOOR(10000 - np * 10000 / nc) AS BIGINT) ELSE 0 END)
         / 10000
         * (CASE WHEN nt > 0 THEN CAST(FLOOR(10000 - ns * 10000 / nt) AS BIGINT) ELSE 0 END)
         / 10000) AS BIGINT) AS quality_e4,
       CASE WHEN GREATEST(score_en, score_de, score_es, score_fr) = 0 THEN 'und'
            WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en'
            WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
            WHEN score_es >= score_fr THEN 'es'
            ELSE 'fr' END AS lang_guess,
       score_en, score_de, score_es, score_fr,
       md5({_D_NORM.format(t='text')}) AS fp,
       {_D_HASH64.format(s='text')} AS h64,
       CAST(nb AS BIGINT) AS n_bpe_tokens,
       CASE WHEN nt > 0 THEN CAST(FLOOR(nb * 10000 / nt) AS BIGINT) ELSE 0 END AS expansion_e4
FROM s JOIN r ON r.doc_id = s.doc_id
"""


def q_text_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition statistics AND the per-rule quality-filter
    booleans in one pass over once-staged token/run arrays. Merges round-2
    text_repetition + text_quality_filter."""
    from ..operators import text as T
    from ..operators.dedup import _barrier

    d = _docs(spark, sf_dir).select("doc_id", "text")
    staged = _barrier(d.withColumn("__toks", T.tokens(F.col("text"))))
    staged = _barrier(
        staged.select(
            "doc_id",
            "text",
            T.run_stats(
                F.array_sort(T.shingles_from_tokens(F.col("__toks"), 2))
            ).alias("__r2"),
            T.run_stats(
                F.array_sort(T.shingles_from_tokens(F.col("__toks"), 5))
            ).alias("__r5"),
        )
    )
    t = F.col("text")
    flags = T.quality_flags(t, F.col("__r2"), F.col("__r5"))
    return staged.select(
        "doc_id",
        F.col("__r2")["top"].alias("top_2gram"),
        F.col("__r2")["top_count"].alias("top2_count"),
        T.top_ngram_char_frac_e4(F.col("__r2"), t).alias("top2_frac_e4"),
        T.dup_ngram_char_frac_e4(F.col("__r5"), t).alias("dup5_frac_e4"),
        *[c.alias(name) for name, c in flags.items()],
    )


ORACLE_TEXT_FILTERS = f"""
WITH d AS (
    SELECT doc_id, text, LENGTH(text) AS nc,
           {_D_TOKENS.format(t='text')} AS toks
    FROM documents
),
s AS (
    SELECT doc_id, nc,
           len(toks) AS nt,
           CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS BIGINT) AS total_len,
           len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) AS ns
    FROM d
),
g2 AS ({_ngram_cte(2)}),
c2 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY doc_id, gram),
t2 AS (
    SELECT doc_id, gram, c,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS rn
    FROM c2
),
g5 AS ({_ngram_cte(5)}),
c5 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g5 GROUP BY doc_id, gram),
d5 AS (
    SELECT doc_id, SUM(c * LENGTH(gram)) AS dup_chars FROM c5 WHERE c > 1
    GROUP BY doc_id
),
r AS (
    SELECT d.doc_id,
           t2.gram AS top_2gram,
           CAST(COALESCE(t2.c, 0) AS BIGINT) AS top2_count,
           CASE WHEN COALESCE(t2.c, 0) > 1
                THEN LEAST(10000, CAST(FLOOR(t2.c * LENGTH(t2.gram) * 10000 / d.nc) AS BIGINT))
                ELSE 0 END AS top2_frac_e4,
           LEAST(10000, CAST(FLOOR(COALESCE(d5.dup_chars, 0) * 10000 / d.nc) AS BIGINT)) AS dup5_frac_e4,
           s.nt BETWEEN 20 AND 100000 AS keep_len,
           CASE WHEN s.nt > 0
                THEN CAST(FLOOR(s.total_len * 10000 / s.nt) AS BIGINT)
                     BETWEEN 30000 AND 100000
                ELSE FALSE END AS keep_avg_len,
           s.ns >= 2 AS keep_stop
    FROM d
    JOIN s ON s.doc_id = d.doc_id
    LEFT JOIN t2 ON t2.doc_id = d.doc_id AND t2.rn = 1
    LEFT JOIN d5 ON d5.doc_id = d.doc_id
)
SELECT doc_id, top_2gram, top2_count, top2_frac_e4, dup5_frac_e4,
       keep_len, keep_avg_len, keep_stop,
       top2_frac_e4 <= 2000 AS keep_rep2,
       dup5_frac_e4 <= 1500 AS keep_rep5,
       keep_len AND keep_avg_len AND keep_stop
           AND top2_frac_e4 <= 2000 AND dup5_frac_e4 <= 1500 AS keep
FROM r
"""


def q_dedup_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document dedup identity in one pass: exact-dedup group
    membership (canonical fingerprint + min-id representative + group
    size), the first 4 MinHash signature slots (k=16, 3-shingles), the
    32-bit SimHash bit string over once-staged token hashes, and (round 3)
    the C4-style line-level dedup columns — 8-word chunks counted across
    the corpus, duplicated chunks dropped everywhere but the earliest
    document, survivors rejoined in order. Merges round-2 dedup_exact +
    dedup_minhash_signature + dedup_simhash (+ round-3 line_dedup)."""
    from ..operators import dedup as D
    from ..operators import text as T

    d = _docs(spark, sf_dir)
    nparts = max(spark.sparkContext.defaultParallelism, 4)
    d = d.repartition(nparts, "doc_id")  # fan out single-split local input
    d = d.withColumn("__hs", D.token_hashes(F.col("text"))).withColumn(
        "fp", T.fingerprint(F.col("text"))
    )
    groups = D.exact_dedup_groups(_docs(spark, sf_dir), "doc_id", "text")
    sig = D.minhash_signature(F.col("text"), k=16, shingle_k=3)
    per_doc = d.select(
        "doc_id",
        "fp",
        *[F.element_at(sig, i + 1).alias(f"mh{i}") for i in range(4)],
        D.simhash_bits_from_hashes(F.col("__hs"), nbits=32).alias("simhash"),
    )
    ld = D.line_dedup(
        _docs(spark, sf_dir),
        lines=D.word_chunks(F.col("text"), n=8),
        join_sep=" ",
    ).select(
        "doc_id",
        F.col("text_dedup").alias("text_line_dedup"),
        F.col("n_lines").alias("line_n_total"),
        F.col("n_kept").alias("line_n_kept"),
    )
    return (
        per_doc.join(groups, "fp")
        .join(ld, "doc_id")
        .select(
            "doc_id", "fp", "keep_id", "n_docs", "mh0", "mh1", "mh2", "mh3",
            "simhash", "text_line_dedup", "line_n_total", "line_n_kept",
        )
    )


ORACLE_DEDUP_SIGNATURES = f"""
WITH d AS (
    SELECT doc_id, {_D_TOKENS.format(t='text')} AS toks,
           md5({_D_NORM.format(t='text')}) AS fp
    FROM documents
),
g AS (
    SELECT md5({_D_NORM.format(t='text')}) AS fp,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_docs
    FROM documents GROUP BY 1
),
sh AS (SELECT doc_id, {_D_SHINGLES} AS sh FROM d),
sig AS (SELECT doc_id, {_D_SIG} AS sig FROM sh),
sim AS (
    SELECT d.doc_id,
           array_to_string(
               list_transform(range(31, -1, -1),
                   j -> CASE WHEN CAST(list_aggregate(
                            list_transform(hs, h -> CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END),
                            'sum') AS BIGINT) >= 0
                        THEN '1' ELSE '0' END),
               '') AS simhash
    FROM (SELECT doc_id,
                 list_transform(list_distinct(toks), t -> {_D_HASH64.format(s='t')}) AS hs
          FROM d) d
),
lw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
lc AS (
    SELECT doc_id, t.i AS pos,
           array_to_string(ws[(t.i * 8 + 1):(t.i * 8 + 8)], ' ') AS line
    FROM lw CROSS JOIN generate_series(0, 4095) t(i)
    WHERE t.i * 8 < len(ws)
),
lcnt AS (SELECT line, COUNT(*) AS cnt, MIN(doc_id) AS first_id FROM lc GROUP BY line),
lkeep AS (
    SELECT lc.doc_id, lc.pos, lc.line,
           (lcnt.cnt < 2 OR lc.doc_id = lcnt.first_id) AS keep
    FROM lc JOIN lcnt USING (line)
),
ld AS (
    SELECT doc_id,
           COALESCE(string_agg(line, ' ' ORDER BY pos) FILTER (WHERE keep), '')
               AS text_line_dedup,
           COUNT(*) AS line_n_total,
           CAST(COALESCE(SUM(CASE WHEN keep THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS line_n_kept
    FROM lkeep GROUP BY doc_id
)
SELECT d.doc_id, d.fp, g.keep_id, g.n_docs,
       sig.sig[1] AS mh0, sig.sig[2] AS mh1, sig.sig[3] AS mh2, sig.sig[4] AS mh3,
       sim.simhash, ld.text_line_dedup, ld.line_n_total, ld.line_n_kept
FROM d
JOIN g ON g.fp = d.fp
JOIN sig ON sig.doc_id = d.doc_id
JOIN sim ON sim.doc_id = d.doc_id
JOIN ld ON ld.doc_id = d.doc_id
"""


def q_sampling_doc_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dataset assembly per document, one row per doc:
    hash bucket + 80/10/10 split + independent 25% sample flag
    (sampling_split) and the sqrt-temperature source-mix keep decision
    (sampling_temperature_mix), as a 0/1 long. Merges those two round-2
    queries; both stay zero-shuffle per-row decisions (the mix thresholds
    are a k-row broadcast)."""
    from ..operators import sampling as S

    d = _docs(spark, sf_dir).select("doc_id", "source")
    mix = (
        S.temperature_mix(d, key="doc_id", strata="source", budget=200)
        .select("doc_id")
        .withColumn("__mk", F.lit(1))
    )
    return (
        d.join(mix, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            S.hash_bucket(F.col("doc_id"), "split").alias("split_bucket"),
            S.split_column(
                F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}
            ).alias("split"),
            (S.hash_bucket(F.col("doc_id")) < 2500).alias("in_sample_25"),
            F.coalesce(F.col("__mk"), F.lit(0)).cast("long").alias("mix_keep_i"),
        )
    )


ORACLE_SAMPLING_DOC_ASSEMBLY = f"""
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
w AS (SELECT source, n,
             CAST(FLOOR(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS w
      FROM c),
th AS (SELECT source,
              LEAST(CAST(FLOOR(2000000 * w / ((SELECT SUM(w) FROM w) * n))
                         AS BIGINT),
                    10000) AS thresh
       FROM w),
b AS (
    SELECT doc_id, source,
           {_D_BUCKET.format(k='doc_id', salt='split')} AS sb,
           {_D_BUCKET.format(k='doc_id', salt='')} AS pb,
           {_D_BUCKET.format(k='doc_id', salt='mix')} AS mb
    FROM documents
)
SELECT b.doc_id, b.source,
       sb AS split_bucket,
       CASE WHEN sb < 8000 THEN 'train'
            WHEN sb < 9000 THEN 'val'
            ELSE 'test' END AS split,
       pb < 2500 AS in_sample_25,
       CAST(CASE WHEN mb < th.thresh THEN 1 ELSE 0 END AS BIGINT) AS mix_keep_i
FROM b JOIN th ON b.source = th.source
"""


def q_pretrain_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination, hits AND verdict per training document:
    distinct shared 5-gram count against the benchmark half
    (contamination_hits) plus the keep decision as a 0/1 long. Merges
    round-2 pretrain_contamination_hits + pretrain_decontaminate.

    r11 optimization (guide §1.2 "don't compute things you throw away"):
    ``decontaminate`` is BY DEFINITION the anti-join on contamination_hits
    (operators/pretrain.py:79), so kept_i == (no hit row) — the verdict is
    derived from the SAME left join instead of running the whole 5-gram
    explode + benchmark join a second time (the oracle has always computed
    kept_i this way). Plan: 12 -> 6 parquet scans, Exchange 9 -> 5;
    measured 9.7 -> ~5 s at 10x. ``decontaminate`` keeps its own identity
    gate (tests/test_pretrain.py) and test_extensions pins this query's
    kept_i against a direct decontaminate() run."""
    from ..operators import sampling as S
    from ..operators.pretrain import contamination_hits

    d = _docs(spark, sf_dir).select("doc_id", "text")
    b = S.hash_bucket(F.col("doc_id"), "decontam")
    train = d.where(b < 9000)
    bench = d.where(b >= 9000)
    hits = contamination_hits(train, bench, n=5)
    return (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hit_grams"), F.lit(0)).cast("long").alias("n_hit_grams"),
            F.when(F.col("n_hit_grams").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("kept_i"),
        )
    )


ORACLE_PRETRAIN_DECONTAMINATION = f"""
WITH {_DECONTAM_CTES}
SELECT d.doc_id,
       CAST(COALESCE(h.n_hit_grams, 0) AS BIGINT) AS n_hit_grams,
       CAST(CASE WHEN h.doc_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept_i
FROM d LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.b < 9000
"""


def q_embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over the embedding table (round-3
    addition): integer k-means cells, then drop vectors with cosine >=
    threshold to a lower-id cell-mate (operators/similarity.py:
    semantic_dedup). Fully oracle-checked: exact integer cells +
    bit-reproducible cosine. Threshold 0.30 is FIXTURE-scaled: the
    synthetic embeddings are near-orthogonal (max pairwise cosine 0.51 at
    sf0.01), so the production-style 0.95 default would never fire; 0.30
    exercises both verdicts (drops a real fraction, keeps the rest)."""
    from ..operators.similarity import semantic_dedup

    return semantic_dedup(
        _emb(spark, sf_dir), k=_KM_K, n_iter=_KM_ITERS, threshold_e6=300000
    )


_ORACLE_SEMANTIC_DEDUP_FINAL = f"""
, src AS (SELECT a.vec_id, a.cid AS cell, e.embedding
          FROM afinal a JOIN embeddings e USING (vec_id)),
dropped AS (
    SELECT DISTINCT x.vec_id
    FROM src x JOIN src y ON x.cell = y.cell AND y.vec_id < x.vec_id
    WHERE FLOOR({_D_COS.format(a='x.embedding', b='y.embedding')} * 1000000) >= 300000
)
SELECT s.vec_id, CAST(s.cell AS INT) AS cell,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept_i
FROM src s LEFT JOIN dropped d ON d.vec_id = s.vec_id
"""


_LIN_B, _LIN_MULT, _LIN_MOD = 512, 2654435761, 1001


def q_text_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature scoring family per document: feature-hashed
    bag-of-words vectors (operators/text.py:hashed_bow, dim=16 signed
    counts, CSV-serialized), plus (round 3) linear-classifier inference
    over 512 hashed buckets (deterministic integer weights
    w(b) = (b*2654435761) % 1001 - 500 — the model is driver metadata;
    the formula stands in for trained coefficients) and the DSIR
    importance-resampling sufficient statistics against the lang='en'
    target slice (exact bucket-count sums; the float log-weight is
    unit-tested against numpy and excluded here)."""
    from ..operators.importance import dsir_importance, linear_score
    from ..operators.text import hashed_bow

    d = _docs(spark, sf_dir)
    out = hashed_bow(d, dim=16)
    ws = [((b * _LIN_MULT) % _LIN_MOD) - 500 for b in range(_LIN_B)]
    lin = linear_score(d, ws).select(
        "doc_id", F.col("score").alias("lin_score"), F.col("label").alias("lin_label")
    )
    dsir = dsir_importance(
        d, F.col("lang") == "en", n_buckets=_LIN_B
    ).select("doc_id", "n_tokens", "target_hits", "source_hits")
    return (
        out.join(lin, "doc_id")
        .join(dsir, "doc_id")
        .select(
            "doc_id",
            F.array_join(F.col("fvec").cast("array<string>"), ",").alias("fvec_csv"),
            "nnz",
            "lin_score",
            "lin_label",
            "n_tokens",
            "target_hits",
            "source_hits",
        )
    )


ORACLE_TEXT_HASHED_FEATURES = f"""
WITH t AS (
    SELECT doc_id, unnest({_D_TOKENS.format(t='text')}) AS tok
    FROM documents
),
h AS (
    SELECT doc_id,
           {_D_HASH64.format(s='tok')} % 16 AS bucket,
           CASE WHEN ({_D_HASH64.format(s='tok')} & 2) <> 0 THEN 1 ELSE -1 END AS sign
    FROM t
),
pb AS (SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS v FROM h GROUP BY 1, 2),
pd AS (
    SELECT doc_id, map_from_entries(list(struct_pack(k := bucket, v := v))) AS m,
           COUNT(*) AS nnz
    FROM pb GROUP BY doc_id
),
tb AS (
    SELECT doc_id, {_D_HASH64.format(s='tok')} % {_LIN_B} AS b
    FROM t
),
bs AS (
    SELECT tb.b,
           CAST(SUM(CASE WHEN dd.lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tc,
           CAST(COUNT(*) AS BIGINT) AS sc
    FROM tb JOIN documents dd ON dd.doc_id = tb.doc_id
    GROUP BY tb.b
),
per AS (
    SELECT tb.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM((tb.b * {_LIN_MULT}) % {_LIN_MOD} - 500) AS BIGINT) AS lin_score,
           CAST(SUM(bs.tc) AS BIGINT) AS target_hits,
           CAST(SUM(bs.sc) AS BIGINT) AS source_hits
    FROM tb JOIN bs USING (b)
    GROUP BY tb.doc_id
)
SELECT d.doc_id,
       array_to_string(
           list_transform(range(0, 16),
               j -> COALESCE(element_at(pd.m, j)[1], 0)), ',') AS fvec_csv,
       CAST(COALESCE(pd.nnz, 0) AS BIGINT) AS nnz,
       CAST(COALESCE(per.lin_score, 0) AS BIGINT) AS lin_score,
       CAST(CASE WHEN COALESCE(per.lin_score, 0) >= 0 THEN 1 ELSE 0 END AS INT)
           AS lin_label,
       CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(per.target_hits, 0) AS BIGINT) AS target_hits,
       CAST(COALESCE(per.source_hits, 0) AS BIGINT) AS source_hits
FROM documents d
LEFT JOIN pd ON pd.doc_id = d.doc_id
LEFT JOIN per ON per.doc_id = d.doc_id
"""


def q_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal plumbing end to end in one output: per-blob typed
    metadata (mapInPandas Arrow batches — extract_blob_meta) joined onto
    the stride-sampled frames (frame_sample; selection by binary Column
    exprs BEFORE any decode). Merges round-2 multimodal_blob_meta +
    multimodal_frame_sample."""
    from ..operators import multimodal as M

    blobs = M.attach_blob(_docs(spark, sf_dir), "doc_id", "text")
    meta = M.extract_blob_meta(blobs)
    frames = M.frame_sample(blobs).select(
        "doc_id",
        "frame_idx",
        F.col("n_bytes").alias("n_frame_bytes"),
        "frame_md5",
    )
    return frames.join(meta, "doc_id")


ORACLE_MULTIMODAL_PIPELINE = """
WITH meta AS (
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS md5_hex,
           64 + CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT) % 64 AS fake_width,
           64 + CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT) % 64 AS fake_height
    FROM documents
),
d AS (
    SELECT doc_id, text, CAST(CEIL(LENGTH(text) / 16.0) AS INT) AS nf
    FROM documents
),
f AS (
    SELECT doc_id,
           UNNEST(list_filter(range(0, nf), i -> i % 4 = 0)) AS frame_idx,
           text
    FROM d WHERE nf > 0
)
SELECT f.doc_id,
       CAST(f.frame_idx AS INT) AS frame_idx,
       CAST(LENGTH(substring(f.text, f.frame_idx * 16 + 1, 16)) AS BIGINT) AS n_frame_bytes,
       md5(substring(f.text, f.frame_idx * 16 + 1, 16)) AS frame_md5,
       m.n_bytes, m.md5_hex, m.fake_width, m.fake_height
FROM f JOIN meta m ON m.doc_id = f.doc_id
"""


# --- RAG chunking (round-3 batch 5) -----------------------------------------

def q_pretrain_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window RAG chunking: 32-token chunks every 24 tokens
    (8-token overlap) with per-chunk md5 fingerprints — the indexing shape
    that feeds embedding + retrieval stages. Zero shuffle (per-row HOF +
    posexplode; see operators/retrieval.py)."""
    from ..operators.retrieval import chunk_documents

    chunks = chunk_documents(_docs(spark, sf_dir), size=32, stride=24)
    return chunks.withColumn("chunk_md5", F.md5(F.col("chunk_text")))


ORACLE_PRETRAIN_CHUNKING = f"""
WITH d AS (
    SELECT doc_id, {_D_TOKENS.format(t='text')} AS toks FROM documents
),
s AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
c AS (SELECT doc_id, n, toks, UNNEST(range(0, n, 24)) AS start FROM s)
SELECT doc_id,
       CAST(start // 24 AS BIGINT) AS chunk_id,
       CAST(start AS BIGINT) AS chunk_start,
       CAST(LEAST(32, n - start) AS BIGINT) AS n_chunk_tokens,
       array_to_string(list_slice(toks, start + 1, LEAST(start + 32, n)), ' ') AS chunk_text,
       md5(array_to_string(list_slice(toks, start + 1, LEAST(start + 32, n)), ' ')) AS chunk_md5
FROM c
"""


# --- count-min sketch (round-3 batch 5) --------------------------------------

_CM_DEPTH, _CM_WIDTH = 3, 256
_CM_PROBES = [
    "the", "a", "an", "of", "and", "to", "in", "is", "on", "for",
    "value", "fast", "zzz_absent_token",
]


def q_sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch over the corpus token stream (d=3,
    w=256; md5 hash family, so the sketch — and therefore every point
    estimate — is deterministic and engine-portable), probed for the
    stopword list + two corpus words + an absent token, with exact counts
    joined alongside. est >= exact always (CM guarantee, also pinned by a
    unit test); the sketch itself is bounded at d*w rows regardless of
    corpus size and merges across shards by summing buckets."""
    from ..operators.retrieval import cm_estimate, cm_sketch

    toks = _docs(spark, sf_dir).select(
        F.explode(F.split(F.col("text"), " ")).alias("term")
    ).where(F.length("term") > 0)
    # localCheckpoint materializes the bounded (≤ d*w rows) sketch once:
    # cm_estimate reads it twice (d-row derivation + broadcast) and must
    # not rescan the corpus for either.
    sk = cm_sketch(toks, "term", depth=_CM_DEPTH, width=_CM_WIDTH).localCheckpoint()
    probes = spark.createDataFrame([(p,) for p in _CM_PROBES], ["term"])
    est = cm_estimate(sk, probes, "term", depth=_CM_DEPTH, width=_CM_WIDTH)
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact_count"))
    return (
        est.join(exact, "term", "left")
        .select(
            "term",
            "est",
            F.coalesce(F.col("exact_count"), F.lit(0)).cast("long").alias("exact_count"),
            (F.col("est") >= F.coalesce(F.col("exact_count"), F.lit(0))).alias("overest"),
        )
    )


_CM_PROBES_SQL = "[" + ", ".join(f"'{p}'" for p in _CM_PROBES) + "]"
_CM_ROWS_SQL = "[" + ", ".join(str(i) for i in range(_CM_DEPTH)) + "]"
_CM_BUCKET_SQL = (
    "CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || term), 1, 15)) AS BIGINT) % "
    + str(_CM_WIDTH)
)

ORACLE_SKETCH_COUNT_MIN = f"""
WITH toks AS (
    SELECT UNNEST({_D_TOKENS.format(t='text')}) AS term FROM documents
),
h AS (
    SELECT ds.d, toks.term FROM toks CROSS JOIN (SELECT UNNEST({_CM_ROWS_SQL}) AS d) ds
),
sk AS (
    SELECT d, {_CM_BUCKET_SQL} AS bucket, COUNT(*) AS c FROM h GROUP BY 1, 2
),
probes AS (SELECT UNNEST({_CM_PROBES_SQL}) AS term),
pb AS (
    SELECT probes.term, ds.d,
           {_CM_BUCKET_SQL} AS bucket
    FROM probes CROSS JOIN (SELECT UNNEST({_CM_ROWS_SQL}) AS d) ds
),
est AS (
    SELECT pb.term, MIN(COALESCE(sk.c, 0)) AS est
    FROM pb LEFT JOIN sk ON sk.d = pb.d AND sk.bucket = pb.bucket
    GROUP BY pb.term
),
ex AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term)
SELECT est.term,
       CAST(est.est AS BIGINT) AS est,
       CAST(COALESCE(ex.c, 0) AS BIGINT) AS exact_count,
       est.est >= COALESCE(ex.c, 0) AS overest
FROM est LEFT JOIN ex ON ex.term = est.term
"""


def _register_all() -> None:
    """Driver-window registration: every oracle-checked extension query, in
    family order. Must stay within the first-50 window jointly with
    contract/hep.py and contract/relational.py — see contract/__init__.py."""
    # text analysis (text_filters rides text_doc_features since round 3,
    # batch 5 — the freed slot funds sketch_count_min below)
    register("text_doc_features", q_text_doc_features, _oracle_text_doc_features())
    register("text_vocabulary", q_text_vocabulary, ORACLE_TEXT_VOCABULARY)
    register(
        "text_bigram_coherence", q_text_bigram_coherence, ORACLE_TEXT_BIGRAM_COHERENCE
    )
    register(
        "text_hashed_features", q_text_hashed_features, ORACLE_TEXT_HASHED_FEATURES
    )
    # dedup (exact-dedup groups ride dedup_signatures since round 3)
    register("dedup_signatures", q_dedup_signatures, ORACLE_DEDUP_SIGNATURES)
    register(
        "dedup_minhash_lsh_pairs", q_dedup_minhash_lsh_pairs, ORACLE_DEDUP_MINHASH_LSH
    )
    register("dedup_ngram_jaccard_pairs", q_dedup_jaccard_pairs, ORACLE_DEDUP_JACCARD)
    register(
        "dedup_near_dup_clusters",
        q_dedup_near_dup_clusters,
        ORACLE_DEDUP_NEAR_DUP_CLUSTERS,
    )
    # similarity / embeddings
    register("similarity_cosine_topk", q_similarity_cosine_topk, ORACLE_SIMILARITY_TOPK)
    register("embedding_near_dup_pairs", q_embedding_near_dup, ORACLE_EMBEDDING_NEAR_DUP)
    register("embedding_quantize_int8", q_embedding_quantize, ORACLE_EMBEDDING_QUANTIZE)
    register(
        "similarity_quantized_topk",
        q_similarity_quantized_topk,
        ORACLE_SIMILARITY_QUANTIZED_TOPK,
    )
    register("embedding_kmeans_cells", q_embedding_kmeans, _oracle_kmeans())
    register(
        "embedding_cluster_purity",
        q_embedding_cluster_purity,
        _oracle_kmeans(final=_ORACLE_CLUSTER_PURITY_FINAL),
    )
    register(
        "embedding_semantic_dedup",
        q_embedding_semantic_dedup,
        _oracle_kmeans(final=_ORACLE_SEMANTIC_DEDUP_FINAL),
    )
    # event-time / temporal / semi-structured (tumbling window rides the
    # n_users'd hour grain of events_time_rollup since round 3)
    register("events_sessionize", q_events_sessionize, ORACLE_EVENTS_SESSIONIZE)
    register("events_asof_join", q_events_asof_join, ORACLE_EVENTS_ASOF)
    register("events_time_rollup", q_events_time_rollup, ORACLE_EVENTS_TIME_ROLLUP)
    register(
        "events_resample_ffill", q_events_resample_ffill, ORACLE_EVENTS_RESAMPLE_FFILL
    )
    register("events_json_extract", q_events_json_extract, ORACLE_EVENTS_JSON_EXTRACT)
    register("events_funnel_join", q_events_funnel_join, ORACLE_EVENTS_FUNNEL_JOIN)
    register(
        "events_abandoned_views", q_events_abandoned_views, ORACLE_EVENTS_ABANDONED_VIEWS
    )
    # sampling / pretrain assembly
    register(
        "sampling_doc_assembly", q_sampling_doc_assembly, ORACLE_SAMPLING_DOC_ASSEMBLY
    )
    register("sampling_stratified", q_sampling_stratified, ORACLE_SAMPLING_STRATIFIED)
    register(
        "pretrain_decontamination",
        q_pretrain_decontamination,
        ORACLE_PRETRAIN_DECONTAMINATION,
    )
    register(
        "pretrain_pack_sequences", q_pretrain_pack_sequences, ORACLE_PRETRAIN_PACK_SEQUENCES
    )
    register("pretrain_redact", q_pretrain_redact, ORACLE_PRETRAIN_REDACT)
    register("pretrain_chunking", q_pretrain_chunking, ORACLE_PRETRAIN_CHUNKING)
    # sketches (exact-deterministic md5 family — NOT the approx rows-only set)
    register("sketch_count_min", q_sketch_count_min, ORACLE_SKETCH_COUNT_MIN)
    # corpus-level
    register(
        "corpus_clean_pipeline", q_corpus_clean_pipeline, ORACLE_CORPUS_CLEAN_PIPELINE
    )
    register("corpus_histograms", q_corpus_histograms, ORACLE_CORPUS_HISTOGRAMS)
    # multimodal
    register("multimodal_pipeline", q_multimodal_pipeline, ORACLE_MULTIMODAL_PIPELINE)


_register_all()
