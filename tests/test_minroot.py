"""Vendored mini-ROOT I/O: real ROOT-format bytes through the full ingest
path (round-4 task #1 — uproot uninstallable in this container, so the
uncompressed flat-tree subset is exercised with the stdlib reader/writer).
"""

import struct

import pytest
from pyspark.sql import functions as F

from bambooanalysis_spark.sources import minroot
from bambooanalysis_spark.sources import root_ingest as R


def test_minroot_roundtrip_all_dtypes(tmp_path):
    path = str(tmp_path / "t.root")
    branches = {
        "s_f32": ("F", [1.5, -2.25, 0.0, 1e7]),
        "s_f64": ("D", [1.1, 2.2, 3.3, -4.4]),
        "s_i32": ("I", [1, -2, 3, 2**31 - 1]),
        "s_i64": ("L", [2**40, 0, -5, 7]),
        "j_f64": ("D", [[1.0, 2.0], [], [3.5], [4.0, 5.0, 6.0]]),
        "j_i32": ("I", [[1], [2, 3], [], [4]]),
    }
    minroot.write_flat_tree(path, "myana/mytree", branches, basket_entries=3)
    raw = open(path, "rb").read()
    assert raw[:4] == b"root"  # genuine ROOT magic + header layout
    fbegin, fend = struct.unpack(">ii", raw[8:16])
    assert fbegin == 100 and fend == len(raw)

    got = minroot.read_flat_tree(path, "myana/mytree")
    for name, (_code, data) in branches.items():
        if name == "s_f32":  # float32 round-trips through f32 precision
            assert got[name] == pytest.approx(data, rel=1e-6)
        else:
            assert got[name] == data

    keys = minroot.list_keys(path)
    classes = {c for c, *_ in keys}
    assert {"TFile", "TNamed", "TBasket"} <= classes
    # basket_entries=3 over 4 entries -> 2 baskets (cycles) per branch
    assert sum(1 for c, n, _t, _cy in keys if c == "TBasket" and n == "s_f64") == 2


def test_minroot_rejects_non_root_and_missing_tree(tmp_path):
    bad = tmp_path / "bad.root"
    bad.write_bytes(b"not a root file at all")
    with pytest.raises(ValueError, match="bad magic"):
        minroot.read_flat_tree(str(bad))
    path = str(tmp_path / "t.root")
    minroot.write_flat_tree(path, "tr", {"x": ("I", [1])})
    with pytest.raises(KeyError, match="not in file"):
        minroot.read_flat_tree(path, "other_tree")


def _lcg_events(n, seed=1234):
    """Deterministic flat phase-2 ntuple branches (no numpy needed)."""
    state = seed

    def rnd():
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % 2**64
        return state >> 33

    chunk = {b: [] for b in R._ntuple_branches()}
    for _ in range(n):
        for coll, fields in R.COLLECTION_BRANCHES.items():
            k = rnd() % (5 if coll != "elec" else 3)
            per = {f: [] for f in fields}
            for _i in range(k):
                per["pt"].append(5.0 + (rnd() % 2000) / 10.0)
                per["eta"].append(((rnd() % 600) / 100.0) - 3.0)
                per["phi"].append(((rnd() % 6283) / 1000.0) - 3.1415)
                per["mass"].append((rnd() % 500) / 100.0)
                if "charge" in fields:
                    per["charge"].append(1 if rnd() % 2 else -1)
                    # bit 2 (medium WP) mostly set so the selection chain
                    # is genuinely exercised down to the MET cut
                    per["isopass"].append(int(rnd() % 16) | 4)
                    per["idpass"].append(int(rnd() % 16) | 4)
                if "btag" in fields:
                    per["btag"].append(int(rnd() % 16))
            for f in fields:
                chunk[f"{coll}_{f}"].append(per[f])
        chunk["metpuppi_pt"].append((rnd() % 2500) / 10.0)
        chunk["metpuppi_phi"].append(((rnd() % 6283) / 1000.0) - 3.1415)
    return chunk


def _write_ntuple(path, chunk, basket_entries=200, compress=0):
    branches = {}
    for name, data in chunk.items():
        is_jagged = name.split("_", 1)[0] in R.COLLECTION_BRANCHES
        code = (
            "I"
            if name.endswith(("charge", "isopass", "idpass", "btag"))
            else "D"
        )
        branches[name] = (code, data)
        assert is_jagged == isinstance(data[0], list)
    minroot.write_flat_tree(
        path, "myana/mytree", branches, basket_entries, compress=compress
    )


def test_root_ingest_end_to_end_phase2(spark, tmp_path):
    """Real ROOT-format bytes -> ingest_root_files -> nested pT-sorted
    parquet -> full phase2 single-pass analysis; identical to running the
    analysis on the same events built directly in Arrow (two paths, one
    truth)."""
    from bambooanalysis_spark.analyses import define_phase2
    from bambooanalysis_spark.plans import run_analysis
    from bambooanalysis_spark.plans.histogrammer import cutflow_table

    n1, n2 = 180, 120
    c1, c2 = _lcg_events(n1, seed=11), _lcg_events(n2, seed=22)
    f1, f2 = str(tmp_path / "a.root"), str(tmp_path / "b.root")
    # f1: multi-basket AND zlib-compressed (ROOT's default on-disk state —
    # jet_test.yml inputs are compressed) so the full compressed-ingest
    # path runs through phase2; f2 stays raw for mixed-file coverage
    _write_ntuple(f1, c1, basket_entries=64, compress=6)
    _write_ntuple(f2, c2)

    out = tmp_path / "ingested"
    out.mkdir()
    counters = R.ingest_root_files([f1, f2], "myana/mytree", str(out), chunk_events=100)
    assert counters == {"nEvents": float(n1 + n2), "genEvents": float(n1 + n2)}

    ingested = spark.read.parquet(str(out / "events.parquet"))
    assert ingested.count() == n1 + n2
    # pT-descending invariant straight off the ROOT bytes
    bad = ingested.select(
        F.exists(
            F.zip_with(
                F.col("jetpuppi"),
                F.slice(F.col("jetpuppi"), 2, 10000),
                lambda a, b: a["pt"] < b["pt"],
            ),
            lambda x: x,
        ).alias("bad")
    ).where("bad").count()
    assert bad == 0

    # reference truth: same chunks straight through the Arrow builder
    direct_tables = []
    off = 0
    for c, n in ((c1, n1), (c2, n2)):
        c = dict(c)
        c["event_id"] = list(range(off, off + n))
        off += n
        direct_tables.append(R.flat_chunk_to_arrow(c))
    import pyarrow as pa

    direct = spark.createDataFrame(
        pa.concat_tables(direct_tables).to_pandas()
    )

    order = ["noSel", "nmumu", "InvM", "njet", "btag", "MET"]

    def cutflow(df):
        d, plots, cfr, _sels = define_phase2(df)
        hist = run_analysis(d, plots, [cfr])
        return {
            r["selection"]: (r["num_events"], r["sum_weights"])
            for r in cutflow_table(hist, "yields", order).collect()
        }

    got, expect = cutflow(ingested), cutflow(direct)
    assert got == expect
    assert got["noSel"][0] == n1 + n2
    # the fixture must actually exercise the chain, not vacuously pass
    assert got["nmumu"][0] > 0


def test_minroot_compressed_roundtrip(tmp_path):
    """zlib-compressed baskets (round-5 task #2): same data, ZL frame
    sequences on disk, bit-identical values back; the compressed file is
    genuinely smaller and its header records fCompress = algo*100+level."""
    import struct as _struct

    branches = {
        "x": ("D", [float(i % 17) for i in range(4000)]),  # compressible
        "j": ("I", [[i % 7] * (i % 4) for i in range(4000)]),
    }
    raw_p = str(tmp_path / "raw.root")
    zip_p = str(tmp_path / "zip.root")
    minroot.write_flat_tree(raw_p, "t", branches, basket_entries=1500)
    minroot.write_flat_tree(zip_p, "t", branches, basket_entries=1500, compress=6)

    raw, comp = open(raw_p, "rb").read(), open(zip_p, "rb").read()
    assert len(comp) < len(raw) / 2  # compression actually happened
    assert comp[:4] == b"root"
    compress_field = _struct.unpack(">i", comp[33:37])[0]
    assert compress_field == 106  # zlib(1)*100 + level 6

    assert minroot.read_flat_tree(zip_p, "t") == minroot.read_flat_tree(raw_p, "t")
    # key chain still walks (list_keys decompresses per-key)
    assert {c for c, *_ in minroot.list_keys(zip_p)} >= {"TFile", "TBasket"}


def test_minroot_incompressible_payload_stays_raw(tmp_path):
    """ROOT keeps raw bytes when deflate doesn't shrink a key; the reader
    must treat such keys as uncompressed even in a compress>0 file."""
    import os

    rnd = [float(int.from_bytes(os.urandom(7), "big")) for _ in range(50)]
    p = str(tmp_path / "r.root")
    minroot.write_flat_tree(p, "t", {"x": ("D", rnd)}, compress=9)
    assert minroot.read_flat_tree(p, "t")["x"] == rnd


def test_minroot_rejects_unknown_codec_frames(tmp_path):
    """Unknown-codec frames fail loudly with a pointer to uproot, not
    with garbage data (lz4 AND zstd became readable round 7, so the
    unknown tag here is synthetic)."""
    p = str(tmp_path / "t.root")
    minroot.write_flat_tree(p, "t", {"x": ("D", [0.0] * 1000)}, compress=6)
    buf = bytearray(open(p, "rb").read())
    idx = buf.find(b"ZL", minroot.FBEGIN)
    assert idx > 0
    buf[idx : idx + 2] = b"QQ"
    bad = tmp_path / "bad.root"
    bad.write_bytes(bytes(buf))
    with pytest.raises(NotImplementedError, match="uproot"):
        minroot.read_flat_tree(str(bad), "t")


def test_minroot_lz4_frames_roundtrip(tmp_path):
    """Round-7: L4 (lz4) compression frames — ROOT's 6.14+ default — in
    both layouts, via the vendored pure-Python block codec with the
    ZipLZ4 XXH64-checksummed frame shape; a flipped payload byte must
    fail the checksum loudly."""
    import struct as _struct

    branches = {
        "x": ("D", [float(i % 17) for i in range(4000)]),
        "j": ("I", [[i % 7] * (i % 4) for i in range(4000)]),
    }
    want = {k: v for k, (_c, v) in branches.items()}
    p = str(tmp_path / "l4.root")
    minroot.write_flat_tree(p, "t", branches, basket_entries=1500,
                            compress=1, compress_algo="L4")
    assert minroot.read_flat_tree(p, "t") == want
    # fCompress records kLZ4*100 + level
    comp = _struct.unpack(">i", open(p, "rb").read()[33:37])[0]
    assert comp == 401
    s = str(tmp_path / "l4s.root")
    minroot.write_streamered_tree(s, "myana/mytree", branches,
                                  basket_entries=1500, compress=1,
                                  compress_algo="L4")
    assert minroot.read_flat_tree(s, "myana/mytree") == want

    buf = bytearray(open(p, "rb").read())
    idx = buf.find(b"L4", minroot.FBEGIN)
    assert idx > 0
    buf[idx + 9 + 8 + 3] ^= 0xFF  # flip a byte inside the lz4 block
    bad = tmp_path / "bad.root"
    bad.write_bytes(bytes(buf))
    with pytest.raises(ValueError, match="XXH64 mismatch"):
        minroot.read_flat_tree(str(bad), "t")


def test_lz4_block_codec_and_xxh64():
    """The vendored codec itself: spec-conformance via a hand-built block
    (literals + overlapping-match RLE), roundtrips over pathological
    inputs, truncation errors; XXH64 against its published empty-input
    vector."""
    import random

    from bambooanalysis_spark.sources.lz4block import (
        lz4_block_compress,
        lz4_block_decompress,
        xxh64,
    )

    assert xxh64(b"") == 0xEF46DB3751D8E999  # published reference vector

    # hand-built: 4 literals, match offset 4 len 8, then 4 literals
    hand = bytes([0x44]) + b"abcd" + bytes([0x04, 0x00, 0x40]) + b"wxyz"
    assert lz4_block_decompress(hand, 16) == b"abcdabcdabcdwxyz"
    # overlapping match (offset 1) = RLE expansion
    rle = bytes([0x1B]) + b"z" + bytes([0x01, 0x00]) + bytes([0x00])
    assert lz4_block_decompress(rle, 16) == b"z" * 16

    rnd = random.Random(1)
    for case in (b"", b"a", b"abcd" * 1000, bytes(rnd.randrange(256) for _ in range(10000)),
                 b"\x00" * 100000, bytes(rnd.randrange(4) for _ in range(50000))):
        z = lz4_block_compress(case)
        assert lz4_block_decompress(z, len(case)) == case

    with pytest.raises(ValueError, match="truncated"):
        lz4_block_decompress(bytes([0xF4]), 100)
    with pytest.raises(ValueError, match="zero match offset"):
        lz4_block_decompress(bytes([0x14]) + b"a" + bytes([0x00, 0x00]), 6)


def test_xxh64_matches_spark_jvm(spark):
    """Independent oracle for the vendored XXH64: Spark's JVM xxhash64
    (seed 42) over random binary rows must equal the pure-Python value
    with the same seed."""
    import random

    from pyspark.sql import functions as F

    from bambooanalysis_spark.sources.lz4block import xxh64

    rnd = random.Random(9)
    blobs = [bytes(rnd.randrange(256) for _ in range(ln))
             for ln in (0, 1, 3, 4, 7, 8, 9, 31, 32, 33, 100, 1000)]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(blobs)], "i long, b binary"
    )
    got = {r["i"]: r["h"] for r in df.select(
        "i", F.xxhash64("b").alias("h")).collect()}
    for i, b in enumerate(blobs):
        want = xxh64(b, seed=42)
        if want >= 1 << 63:
            want -= 1 << 64  # Spark returns signed long
        assert got[i] == want, (i, len(b))


def test_sniff_file_reports_metadata_without_decompressing(tmp_path, monkeypatch):
    """Round-5 task #5: the header-level probe must inventory a COMPRESSED
    file's trees/branches/entry counts from the TKey chain alone — no
    frame may be decompressed along the way."""
    chunk = _lcg_events(50, seed=7)
    p = str(tmp_path / "c.root")
    _write_ntuple(p, chunk, basket_entries=20, compress=6)

    def _boom(*a, **k):  # any decompression attempt fails the test
        raise AssertionError("sniff_file decompressed a frame")

    monkeypatch.setattr(minroot, "_decompress_frames", _boom)
    info = minroot.sniff_file(p)
    assert info["compression"] == 106 and not info["large_file"]
    assert info["trees"] == {"myana/mytree": 50}
    assert set(info["branches"]["myana/mytree"]) == set(R._ntuple_branches())
    classes = {k[0] for k in info["keys"]}
    assert {"TFile", "TNamed", "TBasket"} <= classes
    # compressed baskets visibly carry objlen > stored payload
    tb = [k for k in info["keys"] if k[0] == "TBasket"]
    assert any(objlen > nbytes for _c, _n, _t, _cy, objlen, nbytes in tb)


def test_sniff_file_skips_gap_records(tmp_path):
    """Real ROOT files contain freed-key gaps (negative fNbytes); the
    probe must skip them and keep walking."""
    import struct as _struct

    p = str(tmp_path / "g.root")
    minroot.write_flat_tree(p, "t", {"x": ("I", [1, 2, 3])})
    buf = bytearray(open(p, "rb").read())
    # splice a 32-byte gap record between header and first key
    gap = _struct.pack(">i", -32) + b"\x00" * 28
    out = buf[: minroot.FBEGIN] + gap + buf[minroot.FBEGIN :]
    # patch fEND and every key's implicit position shift is irrelevant to
    # the walker (it chains by fNbytes), only fEND must grow
    fend = len(out)
    out[12:16] = _struct.pack(">i", fend)
    g = tmp_path / "gap.root"
    g.write_bytes(bytes(out))
    info = minroot.sniff_file(str(g))
    assert info["trees"] == {"t": 3}
    assert {k[0] for k in info["keys"]} >= {"TFile", "TBasket"}


# --- real-ROOT layout: streamer-carrying files (round-7 task #3) -------------


def _write_streamered_ntuple(path, chunk, basket_entries=200, compress=1,
                             tree="myana/mytree", tree_cycles=1):
    branches = {}
    for name, data in chunk.items():
        code = (
            "I"
            if name.endswith(("charge", "isopass", "idpass", "btag"))
            else "D"
        )
        branches[name] = (code, data)
    minroot.write_streamered_tree(
        path, tree, branches, basket_entries, compress=compress,
        tree_cycles=tree_cycles,
    )


def test_streamered_roundtrip_and_layout(tmp_path):
    """A file in the REAL ROOT layout — StreamerInfo key (fSeekInfo set),
    TDirectory, streamed-TTree metadata key, baskets keyed by branch name
    with the basket header inside fKeyLen and a WriteArray fEntryOffset
    table — reads back bit-identically, with the streamer record skipped
    rather than choked on."""
    import struct as _struct

    path = str(tmp_path / "s.root")
    branches = {
        "s_f64": ("D", [1.1, 2.2, 3.3, -4.4, 5.5]),
        "s_i32": ("I", [1, -2, 3, 2**31 - 1, 0]),
        "j_f64": ("D", [[1.0, 2.0], [], [3.5], [4.0, 5.0, 6.0], [7.0]]),
        "j_i64": ("L", [[2**40], [0, -5], [], [7], [8, 9]]),
    }
    minroot.write_streamered_tree(
        path, "myana/mytree", branches, basket_entries=2, compress=6
    )
    raw = open(path, "rb").read()
    assert raw[:4] == b"root"
    seek_info = _struct.unpack(">i", raw[45:49])[0]
    assert seek_info > 0  # fSeekInfo points at the StreamerInfo key

    keys = minroot.list_keys(path)
    classes = {c for c, *_ in keys}
    assert {"TFile", "TDirectory", "TTree", "TBasket", "TList"} <= classes
    # real shape: basket key NAME is the branch, title the bare tree name
    tb = [(n, t) for c, n, t, _cy in keys if c == "TBasket"]
    assert ("s_f64", "mytree") in tb and ("j_f64", "mytree") in tb

    got = minroot.read_flat_tree(path, "myana/mytree")
    for name, (_code, data) in branches.items():
        assert got[name] == data, name
    # bare basename and trailing ;cycle resolve too
    assert minroot.read_flat_tree(path, "mytree") == got
    assert minroot.read_flat_tree(path, "myana/mytree;1") == got


def test_streamered_tree_cycles(tmp_path):
    """ROOT's name;cycle convention: two Write() cycles of the TTree key;
    bare name resolves to the highest cycle, explicit ;N pins one, a
    missing cycle raises."""
    path = str(tmp_path / "c.root")
    minroot.write_streamered_tree(
        path, "myana/mytree", {"x": ("D", [1.0, 2.0, 3.0])}, tree_cycles=2
    )
    cycles = sorted(
        cy for c, n, _t, cy in minroot.list_keys(path)
        if c == "TTree" and n == "mytree"
    )
    assert cycles == [1, 2]
    got = minroot.read_flat_tree(path, "myana/mytree")
    assert got["x"] == [1.0, 2.0, 3.0]
    assert minroot.read_flat_tree(path, "mytree;2") == got
    assert minroot.read_flat_tree(path, "mytree;1") == got
    with pytest.raises(KeyError, match="no cycle 3"):
        minroot.read_flat_tree(path, "mytree;3")

    info = minroot.sniff_file(path)
    assert info["tree_cycles"] == {"mytree": [1, 2]}


def test_sniff_streamered_counts_entries_from_baskets(tmp_path, monkeypatch):
    """Real files store the entry count inside the streamed TTree object;
    sniff now recovers it layout-only by summing fNevBuf over one
    branch's basket key headers — still zero decompression."""
    chunk = _lcg_events(50, seed=7)
    p = str(tmp_path / "s.root")
    _write_streamered_ntuple(p, chunk, basket_entries=20, compress=6)

    def _boom(*a, **k):
        raise AssertionError("sniff_file decompressed a frame")

    monkeypatch.setattr(minroot, "_decompress_frames", _boom)
    info = minroot.sniff_file(p)
    assert info["trees"]["mytree"] == 50
    assert set(info["branches"]["mytree"]) == set(R._ntuple_branches())


def test_validate_catalog_streamered_runnable(tmp_path):
    """VERDICT r6 #3 'Done =' clause: validate_catalog reports a
    streamer-carrying file runnable for jet_test.yml-style configs,
    including ;cycle specs."""
    from bambooanalysis_spark.sources.catalog import Catalog, Sample, validate_catalog

    p = str(tmp_path / "s.root")
    _write_streamered_ntuple(p, _lcg_events(10, seed=3), tree_cycles=2)
    cat = Catalog(
        tree="myana/mytree",
        eras={},
        samples={"sig": Sample(name="sig", files=[p], group="SIG")},
        plot_defaults={},
    )
    assert validate_catalog(cat) == {}
    assert validate_catalog(cat, tree="myana/mytree;2") == {}
    probs = validate_catalog(cat, tree="myana/mytree;9")
    assert "sig" in probs and "no cycle 9" in probs["sig"][0]
    probs = validate_catalog(cat, tree="otherana/mytree")
    assert "sig" in probs


def test_root_ingest_end_to_end_phase2_streamered(spark, tmp_path):
    """The round-7 'Done =' criterion: ingest -> phase2 cutflow on a file
    CARRYING A STREAMER RECORD (real ROOT layout, zlib-compressed),
    matching the same events ingested from the simplified minroot layout
    row-for-row."""
    from bambooanalysis_spark.analyses import define_phase2
    from bambooanalysis_spark.plans import run_analysis
    from bambooanalysis_spark.plans.histogrammer import cutflow_table

    n = 150
    chunk = _lcg_events(n, seed=33)
    f_stream = str(tmp_path / "stream.root")
    f_plain = str(tmp_path / "plain.root")
    _write_streamered_ntuple(f_stream, chunk, basket_entries=64, compress=6)
    _write_ntuple(f_plain, chunk, basket_entries=64, compress=6)

    out_s, out_p = tmp_path / "ing_s", tmp_path / "ing_p"
    out_s.mkdir(); out_p.mkdir()
    cs = R.ingest_root_files([f_stream], "myana/mytree", str(out_s), chunk_events=64)
    cp = R.ingest_root_files([f_plain], "myana/mytree", str(out_p), chunk_events=64)
    assert cs == cp == {"nEvents": float(n), "genEvents": float(n)}

    ing_s = spark.read.parquet(str(out_s / "events.parquet"))
    ing_p = spark.read.parquet(str(out_p / "events.parquet"))

    order = ["noSel", "nmumu", "InvM", "njet", "btag", "MET"]

    def cutflow(df):
        d, plots, cfr, _sels = define_phase2(df)
        hist = run_analysis(d, plots, [cfr])
        return {
            r["selection"]: (r["num_events"], r["sum_weights"])
            for r in cutflow_table(hist, "yields", order).collect()
        }

    got, expect = cutflow(ing_s), cutflow(ing_p)
    assert got == expect
    assert got["noSel"][0] == n
    assert got["nmumu"][0] > 0


def test_streamered_unskimmable_branch_raises(tmp_path):
    """A real-layout basket whose branch has no leaflist descriptor in
    the TTree blob (object-model branch) must fail loudly with a pointer
    to uproot, never return garbage."""
    path = str(tmp_path / "s.root")
    # compress=0 so the descriptor bytes are findable for corruption
    minroot.write_streamered_tree(path, "t", {"x": ("D", [1.0, 2.0])}, compress=0)
    buf = bytearray(open(path, "rb").read())
    # corrupt the descriptor string inside the TTree blob: x/D -> q/D
    idx = buf.find(b"\x03x/D")
    assert idx > 0
    buf[idx + 1] = ord("q")
    bad = tmp_path / "bad.root"
    bad.write_bytes(bytes(buf))
    with pytest.raises(NotImplementedError, match="uproot"):
        minroot.read_flat_tree(str(bad), "t")


def test_minroot_zstd_frames_roundtrip(tmp_path):
    """Round-7: ZS (zstd) compression frames — ROOT's modern option —
    through the vendored RFC 8878 codec, both layouts; corruption fails
    loudly via zstd's own content checksum. Every compression algorithm
    real ROOT writes (zlib/lzma/lz4/zstd) now reads without uproot."""
    import struct as _struct

    branches = {
        "x": ("D", [float(i % 17) for i in range(4000)]),
        "j": ("I", [[i % 7] * (i % 4) for i in range(4000)]),
    }
    want = {k: v for k, (_c, v) in branches.items()}
    p = str(tmp_path / "zs.root")
    minroot.write_flat_tree(p, "t", branches, basket_entries=1500,
                            compress=1, compress_algo="ZS")
    assert minroot.read_flat_tree(p, "t") == want
    comp = _struct.unpack(">i", open(p, "rb").read()[33:37])[0]
    assert comp == 501  # kZSTD*100 + level
    s = str(tmp_path / "zss.root")
    minroot.write_streamered_tree(s, "myana/mytree", branches,
                                  basket_entries=1500, compress=1,
                                  compress_algo="ZS")
    assert minroot.read_flat_tree(s, "myana/mytree") == want

    buf = bytearray(open(p, "rb").read())
    idx = buf.find(b"ZS", minroot.FBEGIN)
    assert idx > 0
    buf[idx + 9 + 12] ^= 0xFF  # flip a byte inside the zstd frame
    bad = tmp_path / "bad.root"
    bad.write_bytes(bytes(buf))
    with pytest.raises(ValueError):
        minroot.read_flat_tree(str(bad), "t")


def test_root_ingest_mixed_compression_phase2(spark, tmp_path):
    """One sample, three files, three compression algorithms (zlib, lz4,
    zstd) -> one ingest -> phase2 cutflow equals the all-zlib ingest of
    the same events row-for-row."""
    from bambooanalysis_spark.analyses import define_phase2
    from bambooanalysis_spark.plans import run_analysis
    from bambooanalysis_spark.plans.histogrammer import cutflow_table

    chunks = [_lcg_events(60, seed=s) for s in (1, 2, 3)]
    mixed, plain = [], []
    for i, (chunk, algo) in enumerate(zip(chunks, ("ZL", "L4", "ZS"))):
        branches = {}
        for name, data in chunk.items():
            code = ("I" if name.endswith(("charge", "isopass", "idpass", "btag"))
                    else "D")
            branches[name] = (code, data)
        fm = str(tmp_path / f"m{i}.root")
        fp = str(tmp_path / f"p{i}.root")
        minroot.write_flat_tree(fm, "myana/mytree", branches, 64,
                                compress=1, compress_algo=algo)
        minroot.write_flat_tree(fp, "myana/mytree", branches, 64, compress=6)
        mixed.append(fm)
        plain.append(fp)

    out_m, out_p = tmp_path / "im", tmp_path / "ip"
    out_m.mkdir(); out_p.mkdir()
    cm = R.ingest_root_files(mixed, "myana/mytree", str(out_m), chunk_events=64)
    cp = R.ingest_root_files(plain, "myana/mytree", str(out_p), chunk_events=64)
    assert cm == cp == {"nEvents": 180.0, "genEvents": 180.0}

    def cutflow(path):
        df = spark.read.parquet(str(path / "events.parquet"))
        d, plots, cfr, _sels = define_phase2(df)
        hist = run_analysis(d, plots, [cfr])
        return {
            r["selection"]: (r["num_events"], r["sum_weights"])
            for r in cutflow_table(
                hist, "yields",
                ["noSel", "nmumu", "InvM", "njet", "btag", "MET"]
            ).collect()
        }

    assert cutflow(out_m) == cutflow(out_p)


# --- 64-bit (large-file) layout — round 8 ------------------------------------
# Real ROOT switches to this layout past ~2 GB: header fVersion +
# 1000000, i64 fEND/fSeekFree/fSeekInfo, fUnits=8, big keys with
# fVersion + 1000 and i64 fSeekKey/fSeekPdir. The reference's actual
# inputs are multi-GB EOS files (jet_test.yml:10-11), so this is the
# layout real CMS files present. The writers emit it at any size
# (large=True) so the paths are testable on small fixtures.


def test_large_file_layout_roundtrip(tmp_path):
    """Both writers x both layouts x compression: 64-bit files sniff as
    large_file, list their keys, and read back value-identical to their
    32-bit twins."""
    chunk = _lcg_events(120, seed=44)
    for algo in ("ZL", "L4", "ZS"):
        f32 = str(tmp_path / f"f32_{algo}.root")
        f64 = str(tmp_path / f"f64_{algo}.root")
        _write_streamered_ntuple(f32, chunk, basket_entries=50, compress=6)
        branches = {
            name: (
                "I" if name.endswith(("charge", "isopass", "idpass", "btag"))
                else "D",
                data,
            )
            for name, data in chunk.items()
        }
        minroot.write_streamered_tree(
            f64, "myana/mytree", branches, 50, compress=6,
            compress_algo=algo, large=True,
        )
        s = minroot.sniff_file(f64)
        assert s["large_file"] and s["version"] >= 1000000
        assert not minroot.sniff_file(f32)["large_file"]
        assert minroot.read_flat_tree(f64, "myana/mytree") == \
            minroot.read_flat_tree(f32, "myana/mytree")
        names = [k[0] for k in minroot.list_keys(f64)]
        assert "TBasket" in names and "TList" in names

    # simplified layout too, uncompressed
    p64 = str(tmp_path / "flat64.root")
    minroot.write_flat_tree(
        p64, "t", {"x": ("D", [0.5, 1.5]), "n": ("I", [1, 2])}, large=True
    )
    assert minroot.sniff_file(p64)["large_file"]
    out = minroot.read_flat_tree(p64, "t")
    assert out == {"x": [0.5, 1.5], "n": [1, 2]}


def test_large_file_ingest_end_to_end_phase2(spark, tmp_path):
    """Ingest -> phase2 cutflow on a 64-bit-layout streamer-carrying file
    matches the same events ingested from the 32-bit layout row-for-row —
    the VERDICT r7 #3 'Done =' criterion."""
    from bambooanalysis_spark.analyses import define_phase2
    from bambooanalysis_spark.plans import run_analysis
    from bambooanalysis_spark.plans.histogrammer import cutflow_table

    n = 150
    chunk = _lcg_events(n, seed=55)
    f64 = str(tmp_path / "large.root")
    f32 = str(tmp_path / "small.root")
    branches = {
        name: (
            "I" if name.endswith(("charge", "isopass", "idpass", "btag"))
            else "D",
            data,
        )
        for name, data in chunk.items()
    }
    minroot.write_streamered_tree(
        f64, "myana/mytree", branches, 64, compress=6, large=True
    )
    _write_streamered_ntuple(f32, chunk, basket_entries=64, compress=6)

    out64, out32 = tmp_path / "ing64", tmp_path / "ing32"
    out64.mkdir(); out32.mkdir()
    c64 = R.ingest_root_files([f64], "myana/mytree", str(out64), chunk_events=64)
    c32 = R.ingest_root_files([f32], "myana/mytree", str(out32), chunk_events=64)
    assert c64 == c32 == {"nEvents": float(n), "genEvents": float(n)}

    order = ["noSel", "nmumu", "InvM", "njet", "btag", "MET"]

    def cutflow(df):
        d, plots, cfr, _sels = define_phase2(df)
        hist = run_analysis(d, plots, [cfr])
        return {
            r["selection"]: (r["num_events"], r["sum_weights"])
            for r in cutflow_table(hist, "yields", order).collect()
        }

    got = cutflow(spark.read.parquet(str(out64 / "events.parquet")))
    expect = cutflow(spark.read.parquet(str(out32 / "events.parquet")))
    assert got == expect
    assert got["noSel"][0] == n


def test_large_file_key_beyond_2gb_offset(tmp_path):
    """The reason i64 seeks exist: a key whose file offset exceeds 2^31.
    Surgery on a 64-bit-layout file inserts two freed-key gap records
    (negative fNbytes, the real ROOT convention for deleted keys) that
    push the final basket past the 2 GB mark; the sparse file reads back
    value-identical and sniffs with fend > 2^31."""
    import os
    import struct as _st

    src = str(tmp_path / "src.root")
    minroot.write_flat_tree(
        src, "t",
        {"x": ("D", [float(i) for i in range(100)]), "n": ("I", list(range(100)))},
        basket_entries=40, large=True,
    )
    expect = minroot.read_flat_tree(src, "t")
    buf = open(src, "rb").read()

    # find the start of the LAST key by walking the chain
    fend = _st.unpack(">q", buf[12:20])[0]
    seek, last = minroot.FBEGIN, None
    while seek < fend:
        nb = _st.unpack(">i", buf[seek : seek + 4])[0]
        last = seek
        seek += nb
    gap = 0x48000000  # ~1.2 GB; two gaps put the final key past 2^31
    new_last = last + 2 * gap
    assert new_last > 2**31

    dst = str(tmp_path / "sparse.root")
    with open(dst, "wb") as fh:
        fh.write(buf[:last])
        fh.write(_st.pack(">i", -gap))          # gap record 1
        fh.seek(last + gap)
        fh.write(_st.pack(">i", -gap))          # gap record 2
        fh.seek(new_last)
        tail = bytearray(buf[last:])
        # patch the relocated key's stored fSeekKey (i64 at +18 in a big key)
        tail[18:26] = _st.pack(">q", new_last)
        fh.write(bytes(tail))
    # patch header fEND/fSeekFree (i64 at 12 and 20)
    with open(dst, "r+b") as fh:
        fh.seek(12)
        fh.write(_st.pack(">qq", fend + 2 * gap, fend + 2 * gap))

    assert os.path.getsize(dst) == fend + 2 * gap
    s = minroot.sniff_file(dst)
    assert s["large_file"] and s["fend"] > 2**31
    assert minroot.read_flat_tree(dst, "t") == expect


def test_minroot_fast_codec_path_matches_vendored(tmp_path, monkeypatch):
    """Round 8: L4/ZS basket frames decode through pyarrow's C codecs
    when available (bulk-ingest throughput) and through the vendored
    pure-Python codecs otherwise — both paths must recover identical
    branches. Forces the fallback by poisoning the codec cache."""
    branches = {
        "pt": ("F", [float(i) * 0.5 for i in range(4000)]),
        "n": ("I", list(range(4000))),
    }
    for algo in ("L4", "ZS"):
        p = str(tmp_path / f"fast_{algo}.root")
        minroot.write_flat_tree(p, "t", branches, compress=1, compress_algo=algo)
        fast = minroot.read_flat_tree(p, "t")
        monkeypatch.setattr(
            minroot, "_FAST_CODECS", {"lz4_raw": None, "zstd": None}
        )
        slow = minroot.read_flat_tree(p, "t")
        monkeypatch.setattr(minroot, "_FAST_CODECS", {})
        assert fast == slow
        assert slow["n"] == list(range(4000))


def test_key_walkers_reject_truncated_chains(tmp_path):
    """ADVICE r8: the sniff_file fuzz hardening (ValueError on garbage)
    must extend to list_keys/read_flat_tree — a corrupt chain that
    leaves < 4 bytes (gap probe) or < 18 bytes (key header) before fEND
    raised struct.error instead of the documented ValueError."""
    p = tmp_path / "t.root"
    minroot.write_flat_tree(str(p), "t", {"x": ("D", [1.0, 2.0])})
    buf = bytearray(p.read_bytes())
    # lie about fEND: point it 2 bytes past the true end so the walker's
    # final record probe straddles EOF
    fend = len(buf) + 2
    buf[12:16] = struct.pack(">i", fend)
    bad = tmp_path / "bad.root"
    bad.write_bytes(bytes(buf))
    with pytest.raises(ValueError):
        minroot.list_keys(str(bad))
    # truncate mid-key so an 18-byte header read straddles EOF
    buf2 = bytearray(p.read_bytes())
    fbegin = 100
    buf2 = buf2[: fbegin + 10]
    buf2[12:16] = struct.pack(">i", fbegin + 10)
    bad2 = tmp_path / "bad2.root"
    bad2.write_bytes(bytes(buf2))
    with pytest.raises(ValueError):
        minroot.list_keys(str(bad2))


def test_read_tstring_rejects_truncated_body():
    """ADVICE r9: a TString whose BODY extends past EOF must raise, not
    silently decode a short name (the length-byte guard alone let the
    slice truncate)."""
    buf = bytes([5]) + b"ab"  # claims 5 bytes, only 2 present
    with pytest.raises(ValueError, match="extends past EOF"):
        minroot._read_tstring(buf, 0)
    # length byte itself past EOF still raises
    with pytest.raises(ValueError, match="length byte past EOF"):
        minroot._read_tstring(b"", 0)
    # exact fit stays fine
    assert minroot._read_tstring(bytes([2]) + b"ab", 0) == ("ab", 3)


def test_corrupt_baskets_fail_loudly_not_silently(tmp_path):
    """Self-review r9: corrupt baskets must raise, never silently return
    fewer values — (a) a value region truncated mid-value, (b) an fLast
    below the basket header or past the payload."""
    # (a) minroot layout: chop 3 bytes off the f64 value region
    p = tmp_path / "t.root"
    minroot.write_flat_tree(str(p), "t", {"x": ("D", [1.0, 2.0, 3.0])})
    buf = bytearray(p.read_bytes())
    vals = struct.pack(">3d", 1.0, 2.0, 3.0)
    i = bytes(buf).index(vals)
    bad = tmp_path / "trunc.root"
    # overwrite fLast in the basket sub-header (10 bytes before values
    # end of header: ver h, bufsize i, nevbufsize i, nevbuf i, last i, B)
    hdr_start = i - 19
    ver, bufsize, nevbufsize, nevbuf, last, flag = struct.unpack(
        ">hiiiiB", bytes(buf[hdr_start:hdr_start + 19])
    )
    buf[hdr_start:hdr_start + 19] = struct.pack(
        ">hiiiiB", ver, bufsize, nevbufsize, nevbuf, last - 3, flag
    )
    bad.write_bytes(bytes(buf))
    with pytest.raises(ValueError, match="multiple of the 8-byte"):
        minroot.read_flat_tree(str(bad), "t")
    # (b) fLast below the 19-byte header
    buf2 = bytearray(p.read_bytes())
    buf2[hdr_start:hdr_start + 19] = struct.pack(
        ">hiiiiB", ver, bufsize, nevbufsize, nevbuf, 7, flag
    )
    bad2 = tmp_path / "flast.root"
    bad2.write_bytes(bytes(buf2))
    with pytest.raises(ValueError, match="fLast"):
        minroot.read_flat_tree(str(bad2), "t")
