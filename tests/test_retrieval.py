"""Retrieval-stack operators: RAG chunking, count-min sketch, BM25,
reciprocal-rank fusion."""

import math

import pytest
from pyspark.sql import functions as F

from bambooanalysis_spark.operators import retrieval as R


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d1", "a b c d e f g"),          # 7 tokens
        ("d2", "x y"),                    # shorter than one chunk
        ("d3", ""),                       # empty -> no chunks
        ("d4", "a a a b b quick brown fox jumps over"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


# --- chunking ----------------------------------------------------------------

def test_chunk_documents_semantics(docs):
    out = R.chunk_documents(docs, size=3, stride=2).orderBy("doc_id", "chunk_id")
    got = [
        (r.doc_id, r.chunk_id, r.chunk_start, r.n_chunk_tokens, r.chunk_text)
        for r in out.collect()
    ]
    # d1: starts 0,2,4,6 over 7 tokens
    d1 = [g for g in got if g[0] == "d1"]
    assert d1 == [
        ("d1", 0, 0, 3, "a b c"),
        ("d1", 1, 2, 3, "c d e"),
        ("d1", 2, 4, 3, "e f g"),
        ("d1", 3, 6, 1, "g"),
    ]
    d2 = [g for g in got if g[0] == "d2"]
    assert d2 == [("d2", 0, 0, 2, "x y")]
    assert not [g for g in got if g[0] == "d3"]
    # overlap property: consecutive chunks share size-stride tokens
    for (_, _, s0, _, t0), (_, _, s1, _, t1) in zip(d1, d1[1:]):
        assert s1 - s0 == 2
        assert t0.split()[2:] == t1.split()[:1]


def test_chunk_documents_zero_shuffle(docs):
    plan = (
        R.chunk_documents(docs, size=3, stride=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # per-row HOF + posexplode only


# --- count-min sketch --------------------------------------------------------

def test_cm_sketch_overestimates_and_merges(spark):
    words = (
        ["apple"] * 50 + ["banana"] * 20 + ["cherry"] * 5 + ["durian"] * 1
        + [f"noise{i}" for i in range(300)]
    )
    df = spark.createDataFrame([(w,) for w in words], ["term"])
    sk = R.cm_sketch(df, "term", depth=3, width=64)
    probes = spark.createDataFrame(
        [("apple",), ("banana",), ("cherry",), ("durian",), ("absent",)], ["term"]
    )
    est = {r.term: r.est for r in R.cm_estimate(sk, probes, "term", depth=3, width=64).collect()}
    true = {"apple": 50, "banana": 20, "cherry": 5, "durian": 1, "absent": 0}
    for t, c in true.items():
        assert est[t] >= c, (t, est[t], c)
    # with 376 items in 3x64 buckets the heavy hitter is still near-exact
    assert est["apple"] <= 50 + 330

    # mergeability: sketch(half1) + sketch(half2) == sketch(all), exactly
    h1 = spark.createDataFrame([(w,) for w in words[:200]], ["term"])
    h2 = spark.createDataFrame([(w,) for w in words[200:]], ["term"])
    merged = R.cm_merge(
        R.cm_sketch(h1, "term", depth=3, width=64),
        R.cm_sketch(h2, "term", depth=3, width=64),
    )
    a = {(r.d, r.bucket): r.c for r in merged.collect()}
    b = {(r.d, r.bucket): r.c for r in sk.collect()}
    assert a == b


def test_cm_sketch_is_bounded(spark):
    df = spark.createDataFrame([(f"w{i}",) for i in range(5000)], ["term"])
    sk = R.cm_sketch(df, "term", depth=4, width=32)
    assert sk.count() <= 4 * 32


# --- BM25 --------------------------------------------------------------------

def _bm25_reference(corpus, queries, k1=1.2, b=0.75):
    """Plain-Python BM25 over whitespace tokens."""
    toks = {d: t.split() for d, t in corpus.items() if t.split()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = {}
    for qid, qtext in queries.items():
        for doc, t in toks.items():
            score = 0.0
            for term in set(qtext.split()):
                tf = t.count(term)
                if tf == 0 or term not in df:
                    continue
                idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
                score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            if score > 0:
                out[(qid, doc)] = score
    return out


def test_bm25_matches_python_reference(spark):
    corpus = {
        "d1": "the quick brown fox jumps over the lazy dog",
        "d2": "a quick brown dog outpaces a quick fox",
        "d3": "lorem ipsum dolor sit amet",
        "d4": "the dog sat on the mat",
        "d5": "fox fox fox",
    }
    queries = {"q1": "quick fox", "q2": "lazy dog", "q3": "unicorn"}
    docs = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    qs = spark.createDataFrame(list(queries.items()), ["query_id", "qtext"])
    got = {
        (r.query_id, r.doc_id): r.score
        for r in R.bm25_scores(docs, qs).collect()
    }
    ref = _bm25_reference(corpus, queries)
    assert set(got) == set(ref)
    for key, v in ref.items():
        assert got[key] == pytest.approx(v, rel=1e-12), key

    topk = R.bm25_topk(docs, qs, k=2)
    rows = sorted(
        [(r.query_id, r.rank, r.doc_id) for r in topk.collect()]
    )
    # q1 'quick fox': d5 (fox x3) and d2 (quick x2 + fox) lead; verify
    # against the reference ordering with doc_id tie-break
    def ref_rank(qid, k=2):
        scored = sorted(
            ((v, d) for (q, d), v in ref.items() if q == qid),
            key=lambda x: (-x[0], x[1]),
        )
        return [(qid, i + 1, d) for i, (_, d) in enumerate(scored[:k])]

    expect = sorted(ref_rank("q1") + ref_rank("q2") + ref_rank("q3"))
    assert rows == expect


# --- RRF fusion --------------------------------------------------------------

def test_rrf_fuse_hand_computed(spark):
    lex = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3)],
        ["query_id", "doc_id", "rank"],
    )
    vec = spark.createDataFrame(
        [("q1", "b", 1), ("q1", "d", 2)],
        ["query_id", "doc_id", "rank"],
    )
    out = R.rrf_fuse(lex, vec, k0=60, k=10).orderBy("fused_rank").collect()
    # b: floor(1e6/62)+floor(1e6/61)=16129+16393=32522 -> rank 1
    # a: floor(1e6/61)=16393; d: floor(1e6/62)=16129; c: floor(1e6/63)=15873
    got = [(r.doc_id, r.rrf_e6, r.fused_rank) for r in out]
    assert got == [
        ("b", 32522, 1),
        ("a", 16393, 2),
        ("d", 16129, 3),
        ("c", 15873, 4),
    ]


def test_rrf_with_real_rankers(spark, sf_small):
    """Compose bm25_topk + cosine_topk end-to-end on the fixture tables."""
    from bambooanalysis_spark.operators.similarity import cosine_topk

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    qs = docs.limit(3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("qtext")
    )
    lex = R.bm25_topk(docs, qs, k=5)
    id_col, vec_col = emb.columns[0], emb.columns[1]
    vq = emb.limit(3)
    vec = cosine_topk(emb, vq, id_col=id_col, vec_col=vec_col, k=5).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    # align id namespaces: embeddings ids may differ from doc ids; rename
    # lexical query ids into the vector namespace is not meaningful on the
    # fixture, so just verify the fusion executes and respects k + ordering
    fused = R.rrf_fuse(lex, vec, k0=60, k=4)
    rows = fused.collect()
    assert rows, "fusion produced no rows"
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append((r.fused_rank, r.rrf_e6))
    for q, lst in per_q.items():
        lst.sort()
        assert len(lst) <= 4
        assert [x[0] for x in lst] == list(range(1, len(lst) + 1))
        scores = [x[1] for x in lst]
        assert scores == sorted(scores, reverse=True)


# --- resample + forward fill (temporal family; lives here with the other
# --- round-3 batch-5 additions) ----------------------------------------------

def test_resample_ffill_hand_computed(spark):
    from datetime import datetime

    from bambooanalysis_spark.operators.temporal import resample_ffill

    rows = [
        # key A: observations in minutes 0, 3 (two in min 3 -> later ts wins)
        ("A", datetime(2024, 1, 1, 0, 0, 10), 1.0),
        ("A", datetime(2024, 1, 1, 0, 3, 5), 2.0),
        ("A", datetime(2024, 1, 1, 0, 3, 50), 3.0),
        # key B: single observation -> single-row grid
        ("B", datetime(2024, 1, 1, 5, 0, 0), 9.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = resample_ffill(df, step="1 minute", unit="minute").orderBy(
        "user_id", "bucket"
    )
    got = [
        (r.user_id, r.bucket.minute, r.value_filled, r.is_observed)
        for r in out.collect()
    ]
    assert got == [
        ("A", 0, 1.0, True),
        ("A", 1, 1.0, False),   # gap carries minute-0 value
        ("A", 2, 1.0, False),
        ("A", 3, 3.0, True),    # later ts (00:03:50) wins within the bucket
        ("B", 0, 9.0, True),
    ]


def test_streaming_cm_sketch_matches_batch(spark, tmp_path):
    """cm_sketch is a plain stateful aggregation, so the SAME operator runs
    unchanged as a Structured Streaming query (file source, availableNow,
    complete mode) — the streaming sketch state must equal the batch
    sketch exactly. This is the 100 TB ingestion shape: per-day/stream
    sketches maintained incrementally, merged by cm_merge."""
    words = ["apple"] * 40 + ["banana"] * 15 + [f"w{i}" for i in range(100)]
    df = spark.createDataFrame([(w,) for w in words], ["term"])
    src = str(tmp_path / "terms_stream")
    df.repartition(4).write.parquet(src)  # several files -> several batches

    batch = {(r.d, r.bucket): r.c for r in R.cm_sketch(df, "term", 3, 64).collect()}

    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = R.cm_sketch(stream, "term", 3, 64)
    q = (
        out.writeStream.format("memory")
        .queryName("cm_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.d, r.bucket): r.c for r in spark.sql("SELECT * FROM cm_stream").collect()
    }
    assert got == batch and len(got) > 0


def test_rolling_stats_hand_computed(spark):
    from datetime import datetime

    from bambooanalysis_spark.operators.temporal import rolling_stats

    rows = [
        ("A", datetime(2024, 1, 1, 0, 0, 0), 10),
        ("A", datetime(2024, 1, 1, 0, 30, 0), 20),
        ("A", datetime(2024, 1, 1, 1, 0, 0), 30),   # 1h window includes 0:00 (inclusive)
        ("A", datetime(2024, 1, 1, 2, 30, 0), 40),  # alone
        ("B", datetime(2024, 1, 1, 0, 45, 0), 5),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "cents"])
    out = rolling_stats(
        df,
        {"n_1h": F.count(F.lit(1)), "sum_1h": F.sum("cents")},
        window="1 hour",
    ).orderBy("user_id", "ts")
    got = [(r.user_id, r.ts.hour * 60 + r.ts.minute, r.n_1h, r.sum_1h) for r in out.collect()]
    assert got == [
        ("A", 0, 1, 10),
        ("A", 30, 2, 30),
        ("A", 60, 3, 60),    # RANGE inclusive both ends
        ("A", 150, 1, 40),
        ("B", 45, 1, 5),
    ]


# --- data-quality validation -------------------------------------------------

def test_quality_report_planted_violations(spark):
    from bambooanalysis_spark.operators.quality import quality_report

    left = spark.createDataFrame(
        [
            (1, 10.0, "A", 100),
            (2, None, "A", 100),      # null price
            (2, 5.0, "B", 200),       # dup id
            (3, -1.0, "C", 999),      # out of range, bad category, bad FK
            (None, 3.0, "A", None),   # null id; NULL FK allowed
        ],
        "id bigint, price double, cat string, ref bigint",
    )
    ref = spark.createDataFrame([(100,), (200,)], ["k"])
    rep = {
        r.rule: (r.n_violations, r.n_rows, r.passed)
        for r in quality_report(
            left,
            not_null=["id", "price"],
            unique=[["id"]],
            ranges={"price": (0.0, 100.0)},
            accepted={"cat": ["A", "B"]},
            foreign_keys=[("ref", ref, "k")],
        ).collect()
    }
    assert rep == {
        "not_null:id": (1, 5, False),
        "not_null:price": (1, 5, False),
        "range:price": (2, 5, False),     # -1.0 and the NULL
        "accepted:cat": (1, 5, False),    # 'C'
        "unique:id": (1, 5, False),       # id=2 twice (NULL id is a key value)
        "foreign_key:ref": (1, 5, False), # 999; NULL ref not counted
    }


def test_quality_report_scalar_rules_single_scan(spark, sf_oracle):
    """All scalar rules share ONE scan+aggregate — rule count must not
    change the number of table scans."""
    from bambooanalysis_spark.operators.quality import quality_report

    orders = spark.read.parquet(f"{sf_oracle}/orders.parquet")
    rep = quality_report(
        orders,
        not_null=["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"],
        unique=[["o_orderkey"]],
        ranges={"o_totalprice": (0.0, 1e9)},
        accepted={"o_orderstatus": ["O", "F", "P"]},
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    assert all(r.passed for r in rep.where(~F.col("rule").startswith("accepted")).collect())


def test_rolling_anomaly_flags_hand_computed(spark):
    from datetime import datetime

    from bambooanalysis_spark.operators.temporal import rolling_anomaly_flags

    # key A within one hour: values 10,10,10,100 -> the spike is anomalous
    rows = [
        ("A", datetime(2024, 1, 1, 0, 0), 10),
        ("A", datetime(2024, 1, 1, 0, 10), 10),
        ("A", datetime(2024, 1, 1, 0, 20), 10),
        ("A", datetime(2024, 1, 1, 0, 30), 100),
        ("A", datetime(2024, 1, 1, 5, 0), 7),   # fresh window, alone -> not anomalous
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value_cents"])
    out = rolling_anomaly_flags(df, window="1 hour", z=1).orderBy("ts")
    got = [(r.value_cents, r.n_win, r.is_anomaly) for r in out.collect()]
    # spike: n=4 s=130 q=10300; dev=4*100-130=270; var*n^2... scaled
    # var=4*10300-130^2=24300; dev^2=72900 > 1*24300 -> anomaly
    assert got == [
        (10, 1, False),
        (10, 2, False),
        (10, 3, False),
        (100, 4, True),
        (7, 1, False),
    ]
    # plain 10s: last one n=3 s=30 q=300 dev=0 -> never anomalous  (checked above)


def test_hll_partials_merge_vs_direct(spark):
    """Per-shard HLL partials unioned on keys must estimate the same
    distinct count as a single whole-corpus sketch, and be exact at the
    fixture's cardinality (150 users << 2^12)."""
    from bambooanalysis_spark.contract.extensions import _events
    from bambooanalysis_spark.operators.retrieval import (
        hll_merge_estimate,
        hll_partials,
    )

    ev = _events(spark, "/root/testdata/sf0.01")
    cut = F.lit("2024-01-16").cast("timestamp")
    parts = [
        hll_partials(ev.where(F.col("ts") < cut), ["event_type"], "user_id"),
        hll_partials(ev.where(F.col("ts") >= cut), ["event_type"], "user_id"),
    ]
    merged = {
        r.event_type: r.n_distinct_est
        for r in hll_merge_estimate(parts, ["event_type"]).collect()
    }
    direct = {
        r.event_type: r.n_distinct_est
        for r in hll_merge_estimate(
            [hll_partials(ev, ["event_type"], "user_id")], ["event_type"]
        ).collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert merged == direct
    assert merged == exact  # 150 users: HLL at lg_k=12 is exact here


def test_training_order_deterministic_and_uniform(spark):
    from bambooanalysis_spark.operators.sampling import training_order

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = {(r.doc_id): (r.shard, r.pos) for r in training_order(docs, seed=1).collect()}
    b = {(r.doc_id): (r.shard, r.pos) for r in
         training_order(docs.repartition(13), seed=1).collect()}
    assert a == b  # partitioning-invariant
    c = {(r.doc_id): (r.shard, r.pos) for r in training_order(docs, seed=2).collect()}
    assert a != c  # re-seedable per epoch
    # (shard, pos) is a dense unique address
    addrs = sorted(a.values())
    assert len(set(addrs)) == len(addrs) == 500
    per_shard = {}
    for s, p in addrs:
        per_shard.setdefault(s, []).append(p)
    for s, ps in per_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # rough uniformity across 64 shards at n=500
    assert max(len(v) for v in per_shard.values()) <= 4 * (500 // 64)


def test_stream_static_join_enrichment(spark, tmp_path):
    """Stream-static join: a streaming event feed enriched against a
    static dimension (broadcast per micro-batch, no state) — the standard
    streaming lookup shape next to the stream-stream funnel."""
    from bambooanalysis_spark.contract.extensions import _events

    events = _events(spark, "/root/testdata/sf0.01")
    src = str(tmp_path / "ev_stream")
    events.limit(500).write.parquet(src)
    dim = spark.createDataFrame(
        [("view", 1), ("click", 2), ("purchase", 5), ("error", 0)],
        ["event_type", "weight"],
    )
    batch = (
        spark.read.parquet(src).join(dim, "event_type")
        .groupBy("event_type").agg(F.sum("weight").alias("w"))
    )
    expect = {(r.event_type, r.w) for r in batch.collect()}
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = stream.join(dim, "event_type").groupBy("event_type").agg(
        F.sum("weight").alias("w")
    )
    q = (
        out.writeStream.format("memory").queryName("ss_join")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r.event_type, r.w) for r in spark.sql("SELECT * FROM ss_join").collect()}
    assert got == expect and got


def test_json_corrupt_records_permissive(spark, tmp_path):
    """Malformed JSON lines must not kill the pipeline: PERMISSIVE mode
    captures them in _corrupt_record for quarantine while good rows parse."""
    p = str(tmp_path / "raw.jsonl")
    with open(p, "w") as f:
        f.write('{"a": 1, "b": "x"}\n')
        f.write('{"a": 2, "b": "y"}\n')
        f.write('{"a": broken!!\n')
        f.write('not json at all\n')
    df = (
        spark.read.schema("a long, b string, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(p)
    )
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {(r.a, r.b) for r in good} == {(1, "x"), (2, "y")}
    assert len(bad) == 2 and all(r.a is None for r in bad)


def test_compression_ratio_signal(spark):
    from bambooanalysis_spark.operators.importance import compression_ratio

    rows = [
        (1, "spam spam spam spam spam spam spam spam spam spam"),
        (2, "the quick brown fox jumps over a lazy dog tonight"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in compression_ratio(df).collect()}
    assert out[3].ratio_e4 == 0 and out[3].n_raw == 0
    # repetition compresses far better than natural text
    assert out[1].ratio_e4 < out[2].ratio_e4
    assert 0 < out[1].ratio_e4 < 10_000
    # deterministic within the environment + arithmetic self-consistent
    again = {r.doc_id: r for r in compression_ratio(df).collect()}
    for k in out:
        assert (out[k].n_zlib, out[k].ratio_e4) == (again[k].n_zlib, again[k].ratio_e4)
        if out[k].n_raw:
            assert out[k].ratio_e4 == out[k].n_zlib * 10_000 // out[k].n_raw


def test_pagerank_hub_gets_max_rank(spark):
    from bambooanalysis_spark.operators.graph import pagerank

    # star graph: everyone points at the hub (0), hub points at 1
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)] + [(0, 1)], ["src", "dst"]
    )
    ranks = {r.node: r.rank_e9 for r in pagerank(edges, n_iter=5).collect()}
    assert set(ranks) == set(range(6))
    assert ranks[0] == max(ranks.values())       # hub dominates
    assert ranks[1] > ranks[2] == ranks[5]       # hub's sole target beats leaves
    # mass conservation (minus integer-floor dust): <= 1e9, close to it
    assert 0.9e9 < sum(ranks.values()) <= 1e9


def test_pretrain_pipeline_end_to_end(spark):
    """The full pretraining assembly, each stage an existing operator:
    quality filter -> exact dedup -> decontamination -> BPE tokenize ->
    sequence packing -> deterministic training order. Verifies stage
    hand-offs (schemas/ids survive), monotone corpus shrinkage, and that
    the final (shard, pos) addressing covers exactly the surviving docs."""
    from bambooanalysis_spark.operators import text as T
    from bambooanalysis_spark.operators.bpe import bpe_encode, bpe_train
    from bambooanalysis_spark.operators.dedup import exact_dedup
    from bambooanalysis_spark.operators.pretrain import decontaminate, pack_sequences
    from bambooanalysis_spark.operators.sampling import training_order

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    n0 = docs.count()

    # 1. quality gate (length only — the fixture is synthetic)
    kept = docs.where(T.token_count(F.col("text")) >= 10)
    n1 = kept.count()
    # 2. exact dedup
    deduped = exact_dedup(kept, "doc_id", "text")
    n2 = deduped.count()
    # 3. decontamination against a planted benchmark
    bench = deduped.orderBy("doc_id").limit(3).select("doc_id", "text")
    clean = decontaminate(deduped, bench)
    n3 = clean.count()
    assert n0 >= n1 >= n2 > n3 > 0

    # 4. tokenize (trained BPE) — every surviving doc gets a token count
    merges = bpe_train(clean, n_merges=32)
    toks = bpe_encode(clean, merges)
    assert toks.count() == n3
    assert toks.where(F.col("n_subwords") <= 0).count() == 0

    # 5. pack into 128-token contexts — offsets strictly increasing, packs
    # cover the whole stream
    packed = pack_sequences(clean, context_len=128)
    rows = packed.orderBy("tok_start").collect()
    assert len(rows) == n3
    total = 0
    for r in rows:
        assert r.tok_start == total
        total += r.n_tokens
        assert r.pack_first == r.tok_start // 128
    # 6. deterministic training order covers exactly the surviving docs
    order = training_order(clean, "doc_id", seed=3, n_shards=8)
    assert order.count() == n3
    ids_in = {r.doc_id for r in clean.select("doc_id").collect()}
    ids_out = {r.doc_id for r in order.select("doc_id").collect()}
    assert ids_in == ids_out


def test_weighted_sample_aes_properties(spark):
    """A-ES weighted sampling: matches a numpy replay of the identical
    formula, is partitioning-invariant, and empirically favors heavy rows
    (inclusion prob proportional to weight)."""
    import hashlib

    import numpy as np

    from bambooanalysis_spark.operators.sampling import weighted_sample

    n = 400
    rows = [(i, 10.0 if i % 20 == 0 else 1.0) for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = sorted(r.doc_id for r in weighted_sample(df, 50, "w", salt="s1").collect())

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    pri = {
        i: np.power((h60(f"{i}s1") + 1) / float(2**60), 1.0 / w)
        for i, w in rows
    }
    expect = sorted(sorted(pri, key=lambda i: (-pri[i], i))[:50])
    assert got == expect

    again = sorted(
        r.doc_id
        for r in weighted_sample(df.repartition(7), 50, "w", salt="s1").collect()
    )
    assert again == got
    # heavy rows (weight 10, 5% of corpus) should be strongly over-represented
    heavy = sum(1 for i in got if i % 20 == 0)
    assert heavy >= 10  # 20 heavy rows exist; uniform draw would give ~2.5


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution across partitions: old files lack a column, new
    files add one — mergeSchema reads both with NULL backfill, and filters
    on the new column still prune to the new files."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], ["id", "x"]).write.parquet(p + "/batch=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], ["id", "x", "score"]
    ).write.parquet(p + "/batch=2")
    df = spark.read.option("mergeSchema", True).parquet(p)
    rows = {r.id: (r.x, r.score) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}
    assert df.where(F.col("score") > 5).count() == 1


def test_fuzzy_term_pairs_semantics(spark):
    from bambooanalysis_spark.operators.dedup import fuzzy_term_pairs

    df = spark.createDataFrame(
        [("color",), ("colour",), ("colr",), ("banana",), ("bananas",),
         ("apple",), ("ample",), ("xy",)],
        ["term"],
    )
    got = sorted(
        (r.term_a, r.term_b, r.dist) for r in fuzzy_term_pairs(df).collect()
    )
    # insert: banana/bananas + color/colour; delete: color/colr;
    # substitute: apple/ample (p->m); xy below min_len
    assert got == [
        ("ample", "apple", 1),
        ("banana", "bananas", 1),
        ("color", "colour", 1),
        ("color", "colr", 1),
    ]


def test_fuzzy_term_pairs_substitution(spark):
    from bambooanalysis_spark.operators.dedup import fuzzy_term_pairs

    df = spark.createDataFrame([("chat",), ("chap",), ("chip",)], ["term"])
    got = sorted((r.term_a, r.term_b) for r in fuzzy_term_pairs(df).collect())
    assert got == [("chap", "chat"), ("chap", "chip")]  # chat/chip distance 2


def test_watermark_append_mode_single_final_emission(spark, tmp_path):
    """Watermark guarantees, pinned as Spark actually defines them: in
    append mode a window emits exactly ONCE, only after the watermark
    passes its end; windows the watermark never passes emit nothing; and
    rows arriving after the window's state was evicted are silently
    dropped — they can never cause a second emission. (Dropping of rows
    that are late-but-arrive-while-state-still-exists is best effort —
    Spark merges them — so the test asserts the emission contract, not an
    exact late-row count.)"""
    import time
    from datetime import datetime

    from bambooanalysis_spark.streaming import windowed_event_stats

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    src = str(tmp_path / "late_stream")

    def batch(rows, first=False):
        # flat directory, appended in arrival order (file-source batches
        # follow modification time; the sleep separates mtimes)
        mode = "overwrite" if first else "append"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(mode).parquet(src)
        time.sleep(1.1)

    h0 = datetime(2024, 1, 1, 0, 30)
    batch([(1, h0, 1, "view", 1.0), (2, h0, 2, "view", 2.0)], first=True)
    batch([(3, datetime(2024, 1, 1, 9, 0), 3, "view", 3.0)])  # wm -> 8:00
    batch([(4, datetime(2024, 1, 1, 0, 45), 4, "view", 4.0)])  # hour-0 evicted+emitted here
    batch([(5, datetime(2024, 1, 1, 0, 50), 5, "view", 5.0)])  # after eviction: dropped

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    out = windowed_event_stats(stream, "1 hour", watermark="1 hour")
    q = (
        out.writeStream.format("memory").queryName("late_win")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM late_win").collect()
    hour0 = [r for r in rows if r.window_start == datetime(2024, 1, 1, 0, 0)]
    # exactly one final emission for hour-0; the post-eviction row (id 5)
    # is provably absent from it
    assert len(hour0) == 1
    assert hour0[0].n_events in (2, 3) and hour0[0].value_cents in (300, 700)
    # hour-9 window: watermark never passed its end -> no emission
    assert not [r for r in rows if r.window_start == datetime(2024, 1, 1, 9, 0)]



def test_linkage_resolves_planted_dirty_records(spark):
    """Record linkage on planted dirty data: typo'd names must resolve to
    their true source, the unrelated record must fall below threshold,
    and blocking must keep the candidate set equi-join-sized."""
    from bambooanalysis_spark.operators.linkage import (
        blocked_candidates,
        resolve_best_match,
        score_pairs,
    )

    clean = spark.createDataFrame(
        [
            (1, "alice johnson", "NY", "GOLD"),
            (2, "bob smith", "NY", "GOLD"),
            (3, "carol white", "CA", "SILVER"),
        ],
        ["id_r", "name", "state", "tier"],
    )
    dirty = spark.createDataFrame(
        [
            (101, "alice jonson", "NY", "GOLD"),    # 1 deletion -> 1
            (102, "bob smyth", "NY", "GOLD"),       # 1 substitution -> 2
            (103, "zzzz qqqq", "CA", "SILVER"),     # junk: no match
        ],
        ["id_l", "name", "state", "tier"],
    )
    cand = blocked_candidates(dirty, clean, ["state", "tier"])
    assert cand.count() == 5  # 2x2 in (NY,GOLD) + 1x1 in (CA,SILVER)
    best = resolve_best_match(
        score_pairs(cand, fuzzy_fields={"name": 1}), min_score=-2
    )
    got = {(r.id_l, r.id_r, r.score) for r in best.collect()}
    assert got == {(101, 1, -1), (102, 2, -1)}


def test_snapshot_diff_cdc(spark):
    from bambooanalysis_spark.sources.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "k long, v string, n int",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 30), (4, "D", 40), (5, "e", 50)],
        "k long, v string, n int",
    )
    got = {(r.k, r.op) for r in snapshot_diff(old, new, "k").collect()}
    # 1 deleted, 2 unchanged (absent), 3 NULL->30 update, 4 cased update, 5 insert
    assert got == {(1, "delete"), (3, "update"), (4, "update"), (5, "insert")}


def test_chunk_documents_partition_property(spark):
    """With stride == size (no overlap) the chunks partition the token
    stream exactly: concatenating chunk_texts in chunk order reconstructs
    the tokenized document."""
    from bambooanalysis_spark.operators.retrieval import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    chunks = chunk_documents(docs, size=7, stride=7).orderBy("doc_id", "chunk_id")
    rebuilt = {}
    for r in chunks.collect():
        rebuilt.setdefault(r.doc_id, []).append(r.chunk_text)
    for r in docs.collect():
        toks = [t for t in (r.text or "").split(" ") if t]
        if toks:
            assert " ".join(rebuilt[r.doc_id]).split(" ") == toks, r.doc_id
        else:
            assert r.doc_id not in rebuilt


def test_streaming_foreachbatch_merge_upsert(spark, tmp_path):
    """The production streaming-CDC-apply pattern: a change stream applied
    to a parquet snapshot via foreachBatch + merge_snapshot, one MERGE per
    micro-batch in arrival order. Final table must equal applying the
    batches sequentially in batch mode."""
    import time

    from bambooanalysis_spark.sources.merge import merge_snapshot

    snap_dir = str(tmp_path / "snap")
    spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "k long, v string, ver int"
    ).write.parquet(snap_dir)

    src = str(tmp_path / "changes")
    b1 = [(2, "b2", 2, "U"), (4, "d", 2, "U")]        # update 2, insert 4
    b2 = [(1, None, 3, "D"), (4, "d3", 3, "U")]       # delete 1, update 4
    schema = "k long, v string, ver int, op string"
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    def apply_batch(batch_df, batch_id):
        # read-merge-overwrite; collect() breaks the read-write cycle only
        # because the snapshot is test-sized — a real deployment writes
        # each MERGE result to a NEW versioned directory (scd2/time-travel
        # pattern) instead of overwriting in place
        snap = batch_df.sparkSession.read.parquet(snap_dir)
        merged = merge_snapshot(snap, batch_df, key="k").collect()
        batch_df.sparkSession.createDataFrame(
            merged, "k long, v string, ver int"
        ).write.mode("overwrite").parquet(snap_dir)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    final = {(r.k, r.v, r.ver) for r in spark.read.parquet(snap_dir).collect()}
    assert final == {(2, "b2", 2), (3, "c", 1), (4, "d3", 3)}


# --- round-4 ADVICE fixes ----------------------------------------------------

def test_snapshot_diff_key_only_and_explicit_empty_cols(spark):
    """compare_cols=[] (explicitly, or implied by key-only snapshots) is a
    key-membership diff: inserts/deletes only, never 'update' and never a
    plan-build crash (ADVICE r3: F.when(None, ...) raised)."""
    from bambooanalysis_spark.sources.merge import snapshot_diff

    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    got = {(r.k, r.op) for r in snapshot_diff(old, new, "k").collect()}
    assert got == {(3, "insert"), (1, "delete")}

    old2 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    new2 = spark.createDataFrame([(2, "CHANGED"), (3, "c")], "k long, v string")
    got2 = {
        (r.k, r.op)
        for r in snapshot_diff(old2, new2, "k", compare_cols=[]).collect()
    }
    # the value change on k=2 is invisible to an explicit key-only diff
    assert got2 == {(3, "insert"), (1, "delete")}


def test_resample_ffill_rejects_misaligned_step(spark):
    from datetime import datetime

    from bambooanalysis_spark.operators.temporal import resample_ffill

    df = spark.createDataFrame(
        [("A", datetime(2024, 1, 1, 0, 0, 0), 1.0)], ["user_id", "ts", "value"]
    )
    with pytest.raises(ValueError, match="not a whole multiple"):
        resample_ffill(df, step="90 seconds", unit="minute")
    # aligned multiples are fine
    resample_ffill(df, step="2 minutes", unit="minute").collect()


def test_resample_ffill_max_gap_bounds_fanout(spark):
    """A planted multi-year gap emits a bounded segment (max_gap/step rows
    past the earlier observation), not ~10^6 grid rows."""
    from datetime import datetime

    from bambooanalysis_spark.operators.temporal import resample_ffill

    rows = [
        ("A", datetime(2020, 1, 1, 0, 0, 0), 1.0),
        ("A", datetime(2023, 6, 1, 0, 0, 0), 2.0),   # 3.4-year gap
        ("A", datetime(2023, 6, 1, 0, 2, 0), 3.0),   # short gap: normal fill
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = resample_ffill(
        df, step="1 minute", unit="minute", max_gap="3 minutes"
    ).orderBy("bucket")
    got = [(r.bucket, r.value_filled, r.is_observed) for r in out.collect()]
    # segment 1: obs + 3 filled minutes, then the grid skips to the next obs
    assert len(got) == 4 + 3
    assert [g[1] for g in got] == [1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 3.0]
    assert [g[2] for g in got] == [True, False, False, False, True, False, True]
    # uncapped equivalence on gap-free data
    short = spark.createDataFrame(rows[1:], ["user_id", "ts", "value"])
    uncapped = resample_ffill(short, step="1 minute", unit="minute")
    capped = resample_ffill(short, step="1 minute", unit="minute", max_gap="1 day")
    assert sorted(map(tuple, uncapped.collect())) == sorted(
        map(tuple, capped.collect())
    )


def test_cm_estimate_depth_derived_from_sketch(spark):
    """Estimate depth comes from the sketch itself: a build at depth=2
    probed with a (previously fatal) larger depth argument still returns
    est >= true count for inserted keys (ADVICE r3: extra hash rows
    left-joined to nothing and min() returned 0)."""
    import bambooanalysis_spark.operators.retrieval as R

    toks = spark.createDataFrame(
        [("the",)] * 10 + [("rare",)] * 2, ["term"]
    )
    sk = R.cm_sketch(toks, "term", depth=2, width=64).localCheckpoint()
    probes = spark.createDataFrame([("the",), ("rare",), ("absent",)], ["term"])
    est = {r.term: r.est for r in R.cm_estimate(sk, probes, "term", depth=5, width=64).collect()}
    assert est["the"] >= 10
    assert est["rare"] >= 2
    assert est["absent"] >= 0


def test_events_trend_hour_bucket_boundary(spark):
    """`unix_micros(ts) div 3600000000` truncates exactly like the
    oracle's integer `//` at an hour edge ± 1 µs."""
    from datetime import datetime, timedelta

    edge = datetime(2024, 3, 1, 7, 0, 0)
    rows = [
        (edge - timedelta(microseconds=1),),
        (edge,),
        (edge + timedelta(microseconds=1),),
    ]
    df = spark.createDataFrame(rows, ["ts"])
    got = [
        r.x
        for r in df.select(F.expr("unix_micros(ts) div 3600000000").alias("x"))
        .orderBy("ts")
        .collect()
    ]
    import calendar

    edge_us = calendar.timegm(edge.timetuple()) * 1_000_000
    expect = [(edge_us - 1) // 3_600_000_000, edge_us // 3_600_000_000,
              edge_us // 3_600_000_000]
    assert got == expect
    assert got[0] == got[1] - 1


def test_pagerank_20_iterations_bounded_plan_and_convergence(spark):
    """Round-4 hardening: lineage must stay bounded at real iteration
    counts (localCheckpoint every `checkpoint_every` rounds), a
    convergence tolerance stops early on an already-stable graph, and
    dangling-mass redistribution conserves rank mass."""
    from bambooanalysis_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i + 1) % 8) for i in range(8)] + [(0, 4), (3, 7)],
        ["src", "dst"],
    )
    ranks = pagerank(edges, n_iter=20, checkpoint_every=5)
    rows = {r.node: r.rank_e9 for r in ranks.collect()}
    assert set(rows) == set(range(8))
    # plan depth bounded: at most the joins of the final (<=5) un-checkpointed
    # iterations appear above the checkpointed scan — 20 iterations of 3
    # joins each would show ~60
    plan = ranks._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") <= 3 * 5 + 2

    # a pure cycle is at the fixed point after iteration 1: uniform ranks;
    # tol stops the loop well before 20
    cycle = spark.createDataFrame([(i, (i + 1) % 6) for i in range(6)], ["src", "dst"])
    r, n_done = pagerank(cycle, n_iter=20, tol_e9=0, return_iterations=True)
    vals = [x.rank_e9 for x in r.collect()]
    assert len(set(vals)) == 1
    assert n_done < 20

    # dangling redistribution: node 2 has no out-edges; without it mass
    # leaks, with it the total stays within floor-dust of 1e9
    dang = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    leaky = sum(r.rank_e9 for r in pagerank(dang, n_iter=10).collect())
    tight = sum(
        r.rank_e9
        for r in pagerank(dang, n_iter=10, redistribute_dangling=True).collect()
    )
    assert leaky < 0.8e9
    assert 0.999e9 < tight <= 1e9


def test_per_group_cap_and_window_group_limit(spark):
    from bambooanalysis_spark.operators.sampling import per_group_cap

    rows = [(i, "a" if i < 7 else "b", 100 - i) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "score"])
    out = per_group_cap(df, "source", "doc_id", cap=3)
    got = sorted((r.source, r.doc_id, r.rank_in_group) for r in out.collect())
    assert got == [
        ("a", 0, 1), ("a", 1, 2), ("a", 2, 3),
        ("b", 7, 1), ("b", 8, 2), ("b", 9, 3),
    ]
    # descending picks the other end
    top = sorted(
        r.doc_id
        for r in per_group_cap(df, "source", "doc_id", 2, descending=True).collect()
    )
    assert top == [5, 6, 8, 9]
    # the rank<=cap cutoff is pushed into the window (no full ranked list
    # per group at scale): Spark's WindowGroupLimit node must appear
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_retention_cohorts_hand_computed(spark):
    from datetime import datetime

    from bambooanalysis_spark.operators.temporal import retention_cohorts

    rows = [
        # user 1: first day D0, back on D1 and D3 (two events on D1)
        (1, datetime(2024, 1, 1, 9)), (1, datetime(2024, 1, 2, 5)),
        (1, datetime(2024, 1, 2, 23)), (1, datetime(2024, 1, 4, 1)),
        # user 2: joins D1, never returns
        (2, datetime(2024, 1, 2, 12)),
        # user 3: joins D0, returns D1
        (3, datetime(2024, 1, 1, 1)), (3, datetime(2024, 1, 2, 2)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (str(r.cohort_date)[:10], r.day_offset): r.n_users
        for r in retention_cohorts(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,   # users 1, 3
        ("2024-01-01", 1): 2,   # both back next day
        ("2024-01-01", 3): 1,   # user 1 on D3
        ("2024-01-02", 0): 1,   # user 2's cohort
    }


def test_cm_estimate_empty_sketch_returns_zero_per_probe(spark):
    """An empty sketch (nothing inserted) must still return est=0 for
    every probe key, not an empty frame (round-4 review finding)."""
    import bambooanalysis_spark.operators.retrieval as R

    empty = spark.createDataFrame([], "d int, bucket long, c long")
    probes = spark.createDataFrame([("a",), ("b",)], ["term"])
    got = {r.term: r.est for r in R.cm_estimate(empty, probes, "term", width=64).collect()}
    assert got == {"a": 0, "b": 0}


def test_resample_ffill_calendar_units(spark):
    from datetime import datetime

    from bambooanalysis_spark.operators.temporal import resample_ffill

    df = spark.createDataFrame(
        [("A", datetime(2024, 1, 15), 1.0), ("A", datetime(2024, 4, 2), 2.0)],
        ["user_id", "ts", "value"],
    )
    out = resample_ffill(df, step="1 month", unit="month").orderBy("bucket")
    got = [(r.bucket.month, r.value_filled, r.is_observed) for r in out.collect()]
    assert got == [(1, 1.0, True), (2, 1.0, False), (3, 1.0, False), (4, 2.0, True)]
    with pytest.raises(ValueError, match="calendar unit"):
        resample_ffill(df, step="30 days", unit="month")


def test_repeated_ngram_spans_hand_computed(spark):
    """Planted shared substring across two docs -> one maximal span per
    doc covering exactly the shared region; a doc with no repeats emits
    nothing; adjacent repeated grams merge into ONE island."""
    from pyspark.sql import Row

    from bambooanalysis_spark.operators.dedup import repeated_ngram_spans

    docs = [
        Row(doc_id=1, text="a b c d e f g h i j"),
        Row(doc_id=2, text="x y a b c d e z q w"),
        Row(doc_id=3, text="unique tokens only here now"),
        # doc 4 repeats the shared region TWICE internally -> two islands
        Row(doc_id=4, text="a b c d e k k k k a b c d e"),
    ]
    out = repeated_ngram_spans(
        spark.createDataFrame(docs), "doc_id", "text", n=3, min_df=2
    )
    got = sorted((r.doc_id, r.span_start, r.span_end, r.n_grams) for r in out.collect())
    assert got == [
        (1, 0, 5, 3),     # 'a b c d e' at the head
        (2, 2, 7, 3),     # same region offset by 2
        (4, 0, 5, 3),     # first copy
        (4, 9, 14, 3),    # second copy, separate island
    ]
    # short docs (< n tokens) are silently span-free, not an error
    short = spark.createDataFrame([Row(doc_id=9, text="a b")])
    assert repeated_ngram_spans(short, "doc_id", "text", n=3).count() == 0


def test_remove_spans_excises_repeated_regions(spark):
    from pyspark.sql import Row

    from bambooanalysis_spark.operators.dedup import (
        remove_spans,
        repeated_ngram_spans,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e f g h i j"),
            Row(doc_id=2, text="x y a b c d e z q w"),
            Row(doc_id=3, text="untouched text stays put"),
        ]
    )
    spans = repeated_ngram_spans(docs, "doc_id", "text", n=3, min_df=2)
    # policy: keep doc 1's copy, excise from the rest
    excise = spans.where(F.col("doc_id") != 1)
    out = {r.doc_id: (r.text, r.n_removed_tokens)
           for r in remove_spans(docs, excise, "doc_id", "text").collect()}
    assert out[1] == ("a b c d e f g h i j", 0)
    assert out[2] == ("x y z q w", 5)
    assert out[3] == ("untouched text stays put", 0)


def test_asof_join_null_payload_is_atomic(spark):
    """A matched right row with a NULL payload column must be attached
    AS-IS — not column-mixed with older rows (round-4 review finding: the
    old per-column last(ignorenulls) returned (a=5, b=7) from two
    different rows)."""
    from datetime import datetime

    from bambooanalysis_spark.operators.temporal import asof_join

    right = spark.createDataFrame(
        [
            ("k", datetime(2024, 1, 1, 0, 0, 1), 5, None),
            ("k", datetime(2024, 1, 1, 0, 0, 2), None, 7),
        ],
        "user_id string, ts timestamp, a int, b int",
    )
    left = spark.createDataFrame(
        [("k", datetime(2024, 1, 1, 0, 0, 3))], "user_id string, ts timestamp"
    )
    row = asof_join(
        left, right, on="user_id", payload={"a": "a", "b": "b"}
    ).collect()[0]
    assert (row.a, row.b) == (None, 7)  # the ts=2 row, atomically
    # salted path must agree
    row_s = asof_join(
        left, right, on="user_id", payload={"a": "a", "b": "b"},
        salt_interval="1 hour",
    ).collect()[0]
    assert (row_s.a, row_s.b) == (None, 7)


def test_lm_perplexity_matches_python_reference(spark):
    """operators/lm.py float surface: Laplace-smoothed bigram log-prob and
    perplexity must match a plain-Python reimplementation to 1e-12, and
    the exact integer columns must match it EXACTLY (train/apply split,
    unseen bigram and unseen prefix both exercised)."""
    import math

    from pyspark.sql import Row

    from bambooanalysis_spark.operators.lm import score_bigram_lm, train_bigram_lm

    train = [
        (0, "the cat sat on the mat"),
        (1, "the cat ran"),
        (2, "a dog sat"),
    ]
    apply_ = [
        (10, "the cat sat"),        # all bigrams seen
        (11, "the dog sat quietly"),  # unseen bigrams, seen + unseen prefix
        (12, "zebra"),               # single token: no bigrams -> absent
    ]
    tdf = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in train])
    adf = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in apply_])
    model = train_bigram_lm(tdf)
    got = {r["doc_id"]: r for r in score_bigram_lm(adf, model).collect()}

    # plain-Python reference
    c12, c1, vocab = {}, {}, set()
    for _, t in train:
        toks = t.split()
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    V = len(vocab)
    assert 12 not in got  # single-token doc contributes no bigrams
    for doc_id, t in apply_[:2]:
        toks = t.split()
        pairs = list(zip(toks, toks[1:]))
        nll, p_e6s, oov = [], [], 0
        for a, b in pairs:
            n, d = c12.get((a, b), 0) + 1, c1.get(a, 0) + V
            if (a, b) not in c12:
                oov += 1
            nll.append(-math.log(n / d))
            p_e6s.append(n * 1000000 // d)
        r = got[doc_id]
        assert r["n_bigrams"] == len(pairs)
        assert r["n_oov_bigrams"] == oov
        assert r["lm_score_e6"] == sum(p_e6s) // len(pairs)
        assert r["avg_logprob"] == pytest.approx(-sum(nll) / len(nll), rel=1e-12)
        assert r["perplexity"] == pytest.approx(
            math.exp(sum(nll) / len(nll)), rel=1e-12
        )


def test_streaming_lm_scoring_matches_batch(spark, tmp_path):
    """LM model serving in Structured Streaming: the trained bigram model
    (three static DataFrames) scores a streaming doc feed via stream-
    static joins + a per-doc aggregation, and the result matches the
    batch scorer row-for-row — the shape of a continuous-ingestion
    quality gate backed by a periodically retrained model."""
    from pyspark.sql import Row

    from bambooanalysis_spark.operators.lm import score_bigram_lm, train_bigram_lm

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
    )
    train = docs.where(F.col("doc_id") % 5 != 0)
    apply_ = docs.where(F.col("doc_id") % 5 == 0).limit(100)
    model = train_bigram_lm(train)
    # model tables must be static snapshots for the stream-static join:
    # persist them (a real deployment writes them as parquet)
    model = type(model)(*[d.localCheckpoint() for d in model])

    expect = {
        (r["doc_id"], r["n_bigrams"], r["n_oov_bigrams"], r["lm_score_e6"])
        for r in score_bigram_lm(apply_, model).collect()
    }

    src = str(tmp_path / "doc_stream")
    apply_.write.parquet(src)
    stream = spark.readStream.schema(apply_.schema).parquet(src)
    out = score_bigram_lm(stream, model).select(
        "doc_id", "n_bigrams", "n_oov_bigrams", "lm_score_e6"
    )
    q = (
        out.writeStream.format("memory").queryName("lm_stream")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM lm_stream").collect()}
    assert got == expect and got


def test_lm_save_load_roundtrip(spark, tmp_path):
    """Persisted-model lifecycle: save -> load -> scores identical to the
    in-memory model."""
    from bambooanalysis_spark.operators.lm import (
        load_bigram_lm,
        save_bigram_lm,
        score_bigram_lm,
        train_bigram_lm,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    model = train_bigram_lm(docs.where(F.col("doc_id") % 2 == 0))
    held = docs.where(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "lm_model")
    save_bigram_lm(model, path)
    loaded = load_bigram_lm(spark, path)
    cols = ["doc_id", "n_bigrams", "n_oov_bigrams", "lm_score_e6"]
    a = {tuple(r) for r in score_bigram_lm(held, model).select(cols).collect()}
    b = {tuple(r) for r in score_bigram_lm(held, loaded).select(cols).collect()}
    assert a == b and a
