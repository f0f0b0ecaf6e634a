"""Property-based semantics checks (hypothesis): core operators vs
INDEPENDENT reference implementations on randomized small inputs — the
third leg next to unit tests and the DuckDB oracles (SURVEY.md §5).

Each example runs real Spark jobs, so example counts are deliberately
small; shrinking still pins minimal counterexamples on failure.
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

T0 = dt.datetime(2024, 1, 1)


def _ts(seconds: int) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


# (user, ts-seconds) pairs; right side deduped on (user, ts) so the
# backward-asof match is unambiguous between implementations
_left_events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 5000)), min_size=1, max_size=25
)
_right_events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 5000)), min_size=1, max_size=25
).map(lambda xs: sorted({(u, s) for u, s in xs}))


@given(left=_left_events, right=_right_events)
@settings(**SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """asof_join == pandas.merge_asof(by=key, direction='backward') —
    the library the reference semantics are defined against."""
    import pandas as pd

    from bambooanalysis_spark.operators.temporal import asof_join

    ldf = spark.createDataFrame(
        [Row(event_id=i, user_id=u, ts=_ts(s)) for i, (u, s) in enumerate(left)]
    )
    rdf = spark.createDataFrame(
        [Row(user_id=u, ts=_ts(s), value=float(u * 10000 + s)) for u, s in right]
    )
    got = {
        r["event_id"]: r["rv"]
        for r in asof_join(ldf, rdf, on="user_id", payload={"value": "rv"}).collect()
    }

    lp = pd.DataFrame(
        [{"event_id": i, "user_id": u, "ts": _ts(s)} for i, (u, s) in enumerate(left)]
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        [{"user_id": u, "ts": _ts(s), "value": float(u * 10000 + s)} for u, s in right]
    ).sort_values("ts", kind="stable")
    merged = pd.merge_asof(lp, rp, on="ts", by="user_id", direction="backward")
    expect = {
        int(r.event_id): (None if pd.isna(r.value) else float(r.value))
        for r in merged.itertuples()
    }
    assert got == expect


@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 8000)), min_size=1, max_size=30
    ),
    gap_minutes=st.sampled_from([1, 5, 30]),
)
@settings(**SETTINGS)
def test_sessionize_matches_naive_grouping(spark, events, gap_minutes):
    """sessionize == the obvious per-user sort-and-split (gap > g starts a
    new session), on arbitrary event sets including ts duplicates."""
    from bambooanalysis_spark.streaming import sessionize

    df = spark.createDataFrame(
        [Row(event_id=i, user_id=u, ts=_ts(s)) for i, (u, s) in enumerate(events)]
    )
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(df, gap_minutes=gap_minutes).collect()
    }

    by_user: dict[int, list[tuple[int, int]]] = {}
    for i, (u, s) in enumerate(events):
        by_user.setdefault(u, []).append((s, i))
    expect = set()
    for u, evs in by_user.items():
        evs.sort()
        sessions: list[list[int]] = []
        prev = None
        for s, _i in evs:
            if prev is None or s - prev > gap_minutes * 60:
                sessions.append([])
            sessions[-1].append(s)
            prev = s
        for sess in sessions:
            expect.add((u, _ts(sess[0]), _ts(sess[-1]), len(sess)))
    assert got == expect


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=8),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_jaccard_pairs_match_python_sets(spark, docs):
    """jaccard_pairs (inverted-index join) == Python set arithmetic with
    the same floor(e4) fixed point, at threshold 0 (every sharing pair)."""
    from bambooanalysis_spark.operators.dedup import jaccard_pairs

    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(toks)) for i, toks in enumerate(docs)]
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard_e4"]
        for r in jaccard_pairs(df, "doc_id", "text", threshold_e4=0).collect()
    }
    sets = [set(toks) for toks in docs]
    expect = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sets[a] & sets[b])
            if inter:
                union = len(sets[a] | sets[b])
                expect[(a, b)] = inter * 10000 // union
    assert got == expect


@given(
    n_nodes=st.integers(1, 12),
    edges=st.lists(st.tuples(st.integers(0, 11), st.integers(0, 11)), max_size=15),
)
@settings(**SETTINGS)
def test_connected_components_match_union_find(spark, n_nodes, edges):
    """connected_components (min-label fixpoint) == a plain union-find,
    on arbitrary graphs incl. self-loops, dup edges, out-of-range edges."""
    from bambooanalysis_spark.operators.dedup import connected_components

    edges = [(a, b) for a, b in edges if a < n_nodes and b < n_nodes and a != b]
    nodes = spark.createDataFrame([Row(doc_id=i) for i in range(n_nodes)])
    schema = "doc_a long, doc_b long"
    pairs = spark.createDataFrame(
        [Row(doc_a=a, doc_b=b) for a, b in edges] or [], schema=schema
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs, nodes).collect()
    }

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {i: find(i) for i in range(n_nodes)}
    assert got == expect


# --- minroot ROOT-format round-trip (pure Python, no Spark needed) ----------

_f32 = st.floats(
    width=32, allow_nan=False, allow_infinity=False, min_value=-999999995904.0, max_value=999999995904.0
)
_f64 = st.floats(allow_nan=False, allow_infinity=False, min_value=-1e300, max_value=1e300)
_i32 = st.integers(-(2**31), 2**31 - 1)
_i64 = st.integers(-(2**62), 2**62 - 1)


@given(
    scalar_f=st.lists(_f64, min_size=0, max_size=40),
    scalar_i=st.lists(_i32, min_size=0, max_size=40),
    jagged=st.lists(st.lists(_f32, max_size=6), min_size=0, max_size=40),
    jagged_l=st.lists(st.lists(_i64, max_size=6), min_size=0, max_size=40),
    basket=st.integers(1, 7),
)
@settings(**SETTINGS)
def test_minroot_roundtrip_property(tmp_path_factory, scalar_f, scalar_i, jagged, jagged_l, basket):
    """Any combination of basic-type flat/jagged branches round-trips
    bit-exactly (f64/i32/i64) or to f32 precision, across arbitrary
    basket chunking — entry counts forced equal across branches."""
    import math
    import struct as _struct

    from bambooanalysis_spark.sources import minroot

    n = min(len(scalar_f), len(scalar_i), len(jagged), len(jagged_l))
    branches = {
        "sf": ("D", scalar_f[:n]),
        "si": ("I", scalar_i[:n]),
        "jf": ("F", jagged[:n]),
        "jl": ("L", jagged_l[:n]),
    }
    path = str(tmp_path_factory.mktemp("mr") / "t.root")
    minroot.write_flat_tree(path, "tr", branches, basket_entries=basket)
    got = minroot.read_flat_tree(path, "tr")
    assert got["sf"] == scalar_f[:n]
    assert got["si"] == scalar_i[:n]
    assert got["jl"] == [list(x) for x in jagged_l[:n]]
    # f32: round-trip through single precision
    for want_row, got_row in zip(jagged[:n], got["jf"]):
        assert len(want_row) == len(got_row)
        for w, g in zip(want_row, got_row):
            w32 = _struct.unpack(">f", _struct.pack(">f", w))[0]
            assert g == w32 or (math.isnan(w32) and math.isnan(g))


@given(
    scalar_f=st.lists(_f64, min_size=1, max_size=60),
    jagged_l=st.lists(st.lists(_i64, max_size=5), min_size=1, max_size=60),
    basket=st.integers(1, 9),
    level=st.integers(1, 9),
)
@settings(**SETTINGS)
def test_minroot_compressed_roundtrip_property(
    tmp_path_factory, scalar_f, jagged_l, basket, level
):
    """Compressed write == raw write at every zlib level and basket
    chunking: identical values back, and every payload byte-identical to
    the uncompressed read (round-5 ZL frame codec)."""
    from bambooanalysis_spark.sources import minroot

    n = min(len(scalar_f), len(jagged_l))
    branches = {"sf": ("D", scalar_f[:n]), "jl": ("L", jagged_l[:n])}
    base = tmp_path_factory.mktemp("mrc")
    raw_p, zip_p = str(base / "raw.root"), str(base / "zip.root")
    minroot.write_flat_tree(raw_p, "tr", branches, basket_entries=basket)
    minroot.write_flat_tree(
        zip_p, "tr", branches, basket_entries=basket, compress=level
    )
    assert minroot.read_flat_tree(zip_p, "tr") == minroot.read_flat_tree(raw_p, "tr")


_px = st.tuples(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255))


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    data=st.data(),
    level=st.integers(1, 9),
)
@settings(**SETTINGS)
def test_png_roundtrip_property(w, h, data, level):
    """encode_png -> decode_image is the identity on arbitrary 8-bit RGB
    pixel grids at every compression level."""
    from bambooanalysis_spark.operators import multimodal as M

    px = data.draw(st.lists(_px, min_size=w * h, max_size=w * h))
    assert M.decode_image(M.encode_png(w, h, px, level=level)) == (w, h, px)


@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=200),
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.integers(1, 2),
)
@settings(**SETTINGS)
def test_wav_roundtrip_property(samples, rate, channels):
    """encode_wav16 -> decode_wav is the identity on arbitrary int16
    sample streams; probe_media agrees on the container metadata."""
    from bambooanalysis_spark.operators import multimodal as M

    blob = M.encode_wav16(channels, rate, samples)
    assert M.decode_wav(blob) == (channels, rate, 16, samples)
    meta = M.probe_media(blob)
    assert meta["format"] == "wav" and meta["sample_rate"] == rate
    assert meta["channels"] == channels
