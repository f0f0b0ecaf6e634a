"""Hand-authored streamed-TTree METADATA fixture (VERDICT r9 next #3 —
the last self-validated minroot layer). test_root_layout_spec.py freed
the TFile/TKey/TBasket container from writer/reader self-validation;
the TTree metadata blob that `_skim_leaflists` reads, however, was
still produced only by `write_streamered_tree`'s simplified framing.

This file assembles the blob the way REAL ROOT streams a flat-ntuple
TTree, field by field from the public serialization format — ROOT's
TBufferFile documentation and the uproot project's published format
notes (both describe the identical on-disk object framing):

- every streamed object opens with fByteCount (u32, OR
  kByteCountMask = 0x40000000; counts the bytes AFTER the count field)
  then fVersion (u16);
- polymorphic members (TObjArray elements, pointers) are written via
  "object-any" framing: fByteCount, then a u32 class tag — either
  kNewClassTag = 0xFFFFFFFF followed by the NULL-TERMINATED class name
  (a C string, not a TString), or a CLASS back-reference
  (buffer_position_of_first_tag + kMapOffset) | kClassMask where
  kClassMask = 0x80000000, kMapOffset = 2. A pointer to an
  ALREADY-WRITTEN OBJECT (e.g. a leaf's fLeafCount aiming at the
  counter leaf) is different: the bare u32
  (object_start_position + kMapOffset) WITHOUT kClassMask and without
  a byte-count prefix — the reader distinguishes the three cases by
  the kByteCountMask / kNewClassTag / kClassMask bits;
- TObject base: fVersion u16 = 1, fUniqueID u32, fBits u32;
- TNamed v1: TObject, then fName and fTitle as TStrings (1 length
  byte + bytes);
- TAttLine v2 (h color, h style, h width), TAttFill v2 (h, h),
  TAttMarker v2 (h color, h style, f size);
- TLeaf v2: TNamed(name, title = LEAFLIST DESCRIPTOR), fLen i32,
  fLenType i32, fOffset i32, fIsRange u8, fIsUnsigned u8, fLeafCount
  object pointer (0 = null, or a back-reference tag to the counter
  leaf); TLeafF/D/I v1 append typed fMinimum/fMaximum;
- TBranch v13: TNamed(name, title = the leaflist descriptor
  TTree::Branch books verbatim), TAttFill, fCompress i32, fBasketSize
  i32, fEntryOffsetLen i32, fWriteBasket i32, fEntryNumber i64,
  fOffset i32, fMaxBaskets i32, fSplitLevel i32, fEntries i64,
  fFirstEntry i64, fTotBytes i64, fZipBytes i64, then the fBranches /
  fLeaves / fBaskets TObjArrays, the speed-bumped basket bookkeeping
  arrays (u8 1 + fMaxBaskets i32 fBasketBytes; u8 1 + i64
  fBasketEntry; u8 1 + i64 fBasketSeek) and fFileName TString;
- TObjArray v3: TObject, fName TString, nObjects i32, fLowerBound
  i32, then the elements via object-any framing;
- TTree v20 header: TNamed, the three TAtt, fEntries/fTotBytes/
  fZipBytes/fSavedBytes/fFlushedBytes i64, fWeight f64,
  fTimerInterval/fScanField/fUpdate/fDefaultEntryOffsetLen/
  fNClusterRange i32, fMaxEntries/fMaxEntryLoop/fMaxVirtualSize/
  fAutoSave/fAutoFlush/fEstimate i64, then fBranches and fLeaves.

None of `minroot`'s writer code touches these bytes. What the fixture
buys: the descriptor TStrings ("met/D", "pt[npt]/F", "npt/I") now sit
inside REAL framing — null-terminated class-name C-strings, 0x80xxxxxx
back-reference tags, i64/f64 fields — so the skim's byte-search
contract ("descriptor strings are present as plain TStrings") is
exercised against realistic surrounding bytes, including the
counter-name trap: "npt/I" contains the substring "pt/I", which the
word-boundary guard must not attribute to branch "pt".
"""

import struct

import pytest

from bambooanalysis_spark.sources import minroot
from tests.test_root_layout_spec import (
    _basket_header,
    _spec_key,
    _tstr,
)

KBYTECOUNT = 0x40000000
KNEWCLASS = 0xFFFFFFFF
KCLASSMASK = 0x80000000
KMAPOFFSET = 2


class _Buf:
    """Sequential object-buffer builder with byte-count back-patching
    and a first-use class registry for back-reference tags."""

    def __init__(self):
        self.b = bytearray()
        self._classes: dict[str, int] = {}

    # -- primitives -----------------------------------------------------
    def raw(self, data: bytes):
        self.b += data

    def pack(self, fmt: str, *vals):
        self.b += struct.pack(fmt, *vals)

    def tstr(self, s: str):
        self.b += _tstr(s)

    # -- framing ----------------------------------------------------------
    def begin_count(self) -> int:
        """Reserve the fByteCount slot; returns the patch position."""
        pos = len(self.b)
        self.b += b"\x00\x00\x00\x00"
        return pos

    def end_count(self, pos: int):
        n = len(self.b) - pos - 4  # bytes AFTER the count field
        self.b[pos:pos + 4] = struct.pack(">I", n | KBYTECOUNT)

    def class_tag(self, classname: str):
        """kNewClassTag + C-string on first use; back-reference after
        (the tag position + kMapOffset, with kClassMask)."""
        if classname in self._classes:
            ref = self._classes[classname] + KMAPOFFSET
            self.pack(">I", ref | KCLASSMASK)
        else:
            self._classes[classname] = len(self.b)
            self.pack(">I", KNEWCLASS)
            self.raw(classname.encode() + b"\x00")

    # -- streamed bases ----------------------------------------------------
    def tobject(self):
        self.pack(">hII", 1, 0, 0x03000000)  # version, fUniqueID, fBits

    def tnamed(self, name: str, title: str):
        pos = self.begin_count()
        self.pack(">h", 1)  # TNamed version
        self.tobject()
        self.tstr(name)
        self.tstr(title)
        self.end_count(pos)

    def tatt_line(self):
        pos = self.begin_count()
        self.pack(">hhhh", 2, 602, 1, 1)  # v2, color, style, width
        self.end_count(pos)

    def tatt_fill(self):
        pos = self.begin_count()
        self.pack(">hhh", 2, 0, 1001)  # v2, color, style
        self.end_count(pos)

    def tatt_marker(self):
        pos = self.begin_count()
        self.pack(">hhhf", 2, 1, 1, 1.0)  # v2, color, style, size
        self.end_count(pos)


def _leaf(buf: _Buf, cls: str, name: str, descriptor: str, lentype: int,
          counter_ref: int | None, lo, hi, minmax_fmt: str) -> int:
    """One typed leaf via object-any framing; returns the buffer
    position where the OBJECT starts (its byte-count word) — the
    position an fLeafCount object back-reference points at."""
    obj_pos = len(buf.b)
    pos = buf.begin_count()
    buf.class_tag(cls)
    inner = buf.begin_count()
    buf.pack(">h", 1)  # TLeafF/D/I version
    base = buf.begin_count()
    buf.pack(">h", 2)  # TLeaf base version
    buf.tnamed(name, descriptor)  # title IS the leaflist descriptor
    buf.pack(
        ">iiiBB",
        1,        # fLen (elements per entry; 1 even for [ctr] leaves)
        lentype,  # fLenType: sizeof the element type
        0,        # fOffset
        0,        # fIsRange
        0,        # fIsUnsigned
    )
    if counter_ref is None:
        buf.pack(">I", 0)  # fLeafCount: null pointer
    else:
        # OBJECT back-reference to the counter TLeafI: the bare
        # position of the referenced object's start + kMapOffset —
        # no kClassMask, no byte-count prefix (a kClassMask tag would
        # mean "new object of a previously-seen class" instead;
        # self-review r10)
        buf.pack(">I", counter_ref + KMAPOFFSET)
    buf.end_count(base)
    buf.pack(minmax_fmt, lo, hi)  # typed fMinimum / fMaximum
    buf.end_count(inner)
    buf.end_count(pos)
    return obj_pos


def _tobjarray_open(buf: _Buf, n: int) -> int:
    pos = buf.begin_count()
    buf.pack(">h", 3)  # TObjArray version
    buf.tobject()
    buf.tstr("")       # fName
    buf.pack(">ii", n, 0)  # nObjects, fLowerBound
    return pos


def _branch(buf: _Buf, name: str, descriptor: str, n_entries: int,
            leaf_emit) -> None:
    """One TBranch via object-any framing; ``leaf_emit(buf)`` writes the
    single element of its fLeaves array."""
    pos = buf.begin_count()
    buf.class_tag("TBranch")
    inner = buf.begin_count()
    buf.pack(">h", 13)  # TBranch version
    buf.tnamed(name, descriptor)  # title = booked leaflist descriptor
    buf.tatt_fill()
    buf.pack(
        ">iiii", 101, 32000, 0, 1,
    )  # fCompress, fBasketSize, fEntryOffsetLen, fWriteBasket
    buf.pack(">q", n_entries)  # fEntryNumber
    buf.pack(">iii", 0, 10, 0)  # fOffset, fMaxBaskets, fSplitLevel
    buf.pack(">qqqq", n_entries, 0, 240, 180)
    # fEntries, fFirstEntry, fTotBytes, fZipBytes
    sub = _tobjarray_open(buf, 0)  # fBranches: empty (flat ntuple)
    buf.end_count(sub)
    leaves = _tobjarray_open(buf, 1)  # fLeaves: the one typed leaf
    leaf_emit(buf)
    buf.end_count(leaves)
    baskets = _tobjarray_open(buf, 0)  # fBaskets: none in-metadata
    buf.end_count(baskets)
    # speed-bumped bookkeeping arrays (u8 1 then fMaxBaskets values)
    buf.pack(">B10i", 1, *([0] * 10))   # fBasketBytes
    buf.pack(">B10q", 1, *([0] * 10))   # fBasketEntry
    buf.pack(">B10q", 1, *([0] * 10))   # fBasketSeek
    buf.tstr("")  # fFileName (same file)
    buf.end_count(inner)
    buf.end_count(pos)


N_ENTRIES = 3


def _streamed_ttree_blob() -> bytes:
    """TTree 't' with a counter branch npt (npt/I), a jagged branch pt
    (pt[npt]/F) and a scalar branch met (met/D), streamed per the
    public layout documented in the module docstring."""
    buf = _Buf()
    top = buf.begin_count()
    buf.pack(">h", 20)  # TTree version
    buf.tnamed("t", "spec-authored streamed tree")
    buf.tatt_line()
    buf.tatt_fill()
    buf.tatt_marker()
    buf.pack(">qqqqq", N_ENTRIES, 480, 300, 0, 0)
    # fEntries, fTotBytes, fZipBytes, fSavedBytes, fFlushedBytes
    buf.pack(">d", 1.0)  # fWeight
    buf.pack(">iiiii", 0, 25, 0, 1000, 0)
    # fTimerInterval, fScanField, fUpdate, fDefaultEntryOffsetLen,
    # fNClusterRange
    buf.pack(">qqqqqq", 1000000, 1000000, 0, -300000000, -30000000, 1000000)
    # fMaxEntries, fMaxEntryLoop, fMaxVirtualSize, fAutoSave,
    # fAutoFlush, fEstimate

    counter_tag: list[int] = []

    def emit_npt(b: _Buf):
        counter_tag.append(
            _leaf(b, "TLeafI", "npt", "npt/I", 4, None, 0, 2, ">ii")
        )

    def emit_pt(b: _Buf):
        _leaf(b, "TLeafF", "pt", "pt[npt]/F", 4, counter_tag[0],
              0.0, 99.5, ">ff")

    def emit_met(b: _Buf):
        _leaf(b, "TLeafD", "met", "met/D", 8, None, 0.0, 200.25, ">dd")

    branches = _tobjarray_open(buf, 3)
    _branch(buf, "npt", "npt/I", N_ENTRIES, emit_npt)
    _branch(buf, "pt", "pt[npt]/F", N_ENTRIES, emit_pt)
    _branch(buf, "met", "met/D", N_ENTRIES, emit_met)
    buf.end_count(branches)

    # fLeaves: real files repeat the leaves by BACK-REFERENCE — pure
    # 0x80xxxxxx tags, no descriptor TStrings appear a second time
    leaves = _tobjarray_open(buf, 0)
    buf.end_count(leaves)
    # trailing pointer members (fAliases, fIndexValues TArrayD,
    # fIndex TArrayI, fTreeIndex, fFriends, fUserInfo, fBranchRef):
    # null pointer / empty array forms
    buf.pack(">I", 0)   # fAliases = null
    buf.pack(">i", 0)   # fIndexValues: TArrayD n=0
    buf.pack(">i", 0)   # fIndex: TArrayI n=0
    buf.pack(">I", 0)   # fTreeIndex = null
    buf.pack(">I", 0)   # fFriends = null
    buf.pack(">I", 0)   # fUserInfo = null
    buf.pack(">I", 0)   # fBranchRef = null
    buf.end_count(top)
    return bytes(buf.b)


MET = [12.5, 0.0, -3.75]
PT = [[10.5, 7.0], [], [31.25]]
NPT = [2, 0, 1]


def _spec_streamered_file() -> bytes:
    """Full small-layout file around the streamer blob: header +
    TFile key + streamed-TTree metadata key + real-shape baskets
    (branch name as key NAME, tree as TITLE, basket header in the key
    extension) + StreamerInfo — container fields per the
    test_root_layout_spec tables, metadata bytes per this module."""
    records = []
    offsets = {}
    pos = 100

    def add(classname, name, title, data, basket_header=b""):
        nonlocal pos
        rec = _spec_key(pos, classname, name, title, data,
                        basket_header=basket_header)
        offsets[name] = pos
        records.append(rec)
        pos += len(rec)

    add("TFile", "strm.root", "", _tstr("strm.root") + _tstr("") + bytes(30))
    add("TTree", "t", "spec-authored streamed tree", _streamed_ttree_blob())

    def basket(bname, fmt, flat, lengths=None):
        vals = struct.pack(f">{len(flat)}{fmt}", *flat)
        strings = _tstr("TBasket") + _tstr(bname) + _tstr("t")
        keylen = 18 + 8 + len(strings) + 19
        if lengths is None:
            payload, jagged = vals, False
        else:
            width = struct.calcsize(fmt)
            offs, p = [], keylen
            for ln in lengths:
                offs.append(p)
                p += ln * width
            payload = vals + struct.pack(f">i{len(offs)}i", len(offs), *offs)
            jagged = True
        add("TBasket", bname, "t", payload,
            basket_header=_basket_header(len(vals), N_ENTRIES, keylen,
                                         jagged))

    basket("npt", "i", NPT)
    basket("pt", "f", [v for row in PT for v in row],
           lengths=[len(r) for r in PT])
    basket("met", "d", MET)
    add("TList", "StreamerInfo", "Doubly linked list", bytes(24))

    body = b"".join(records)
    header = (
        b"root"
        + struct.pack(">i", 62400)                  # fVersion
        + struct.pack(">i", 100)                    # fBEGIN
        + struct.pack(">i", 100 + len(body))        # fEND
        + struct.pack(">i", 0) + struct.pack(">i", 0)
        + struct.pack(">i", 1) + struct.pack(">i", 54)
        + struct.pack(">B", 4)                      # fUnits
        + struct.pack(">i", 0)                      # fCompress
        + struct.pack(">i", offsets["StreamerInfo"])
        + struct.pack(">i", 24)
        + bytes(18)
    )
    return header + bytes(100 - len(header)) + body


def test_skim_finds_descriptors_in_real_streamer_framing():
    blob = _streamed_ttree_blob()
    got = minroot._skim_leaflists(blob, ["met", "pt", "npt"])
    assert got == {"met": "met/D", "pt": "pt[npt]/F", "npt": "npt/I"}
    # realistic framing is actually present: null-terminated class-name
    # C-strings and 0x80xxxxxx back-reference tags
    for cname in (b"TBranch\x00", b"TLeafF\x00", b"TLeafD\x00",
                  b"TLeafI\x00"):
        assert cname in blob
    assert blob.count(b"TBranch\x00") == 1  # 2nd/3rd use back-refs


def test_skim_counter_name_does_not_leak_into_prefix_branch():
    """'npt/I' contains the substring 'pt/I': the word-boundary guard
    must keep it from being read as branch pt's descriptor. Probe with
    a blob that has ONLY the counter's descriptor."""
    blob = _streamed_ttree_blob()
    # cut everything from the pt descriptor onward out of the search
    cut = blob[: blob.index(b"pt[npt]/F") - 1]
    got = minroot._skim_leaflists(cut, ["pt", "npt"])
    assert got == {"npt": "npt/I"}  # no false 'pt' hit


def test_read_flat_tree_on_spec_streamered_file(tmp_path):
    """End-to-end: container per the r9 spec tables, metadata per the
    real streamer framing — no writer code involved anywhere."""
    p = tmp_path / "strm.root"
    p.write_bytes(_spec_streamered_file())
    got = minroot.read_flat_tree(str(p), "t")
    assert got == {"met": MET, "pt": PT, "npt": NPT}
    info = minroot.sniff_file(str(p))
    assert info["trees"] == {"t": N_ENTRIES}
    assert info["branches"]["t"] == ["met", "npt", "pt"]


def test_writer_blob_agrees_with_spec_blob_at_skim_level(tmp_path):
    """The repo's own writer must yield the SAME skim verdicts as the
    spec-authored streamer bytes (decoded-level equivalence, the
    test_root_layout_spec discipline applied one layer up)."""
    p = tmp_path / "w.root"
    minroot.write_streamered_tree(
        str(p), "t", {"met": ("D", MET), "pt": ("F", PT),
                      "npt": ("I", NPT)},
    )
    assert minroot.read_flat_tree(str(p), "t") == {
        "met": MET, "pt": PT, "npt": NPT,
    }
