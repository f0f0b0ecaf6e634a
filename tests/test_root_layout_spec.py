"""Hand-authored ROOT container fixtures from the PUBLIC format spec
(VERDICT r8 #5 — the zstd cross-validation lesson one layer up): every
streamered-layout test so far read files produced by this repo's OWN
writer, so a container-layout misunderstanding mirrored into writer AND
reader would be invisible to self-roundtrips. The fixtures here are
assembled field-by-field from the on-disk format tables in ROOT's public
documentation (the TFile class reference, "The file header" /
"The record" tables — https://root.cern/doc/master/classTFile.html —
and the TBasket public data members), with every offset annotated.
No ``minroot`` writer code touches these bytes.

Spec tables transcribed (1-based byte positions, as the docs print them):

File header — small (< 2 GB) layout        64-bit ("large") layout
  1->4   "root"                              same
  5->8   fVersion (i32)                      fVersion + 1000000
  9->12  fBEGIN (i32) = 100                  same
  13->16 fEND (i32)                          13->20 fEND (i64)
  17->20 fSeekFree (i32)                     21->28 fSeekFree (i64)
  21->24 fNbytesFree (i32)                   29->32
  25->28 nfree (i32)                         33->36
  29->32 fNbytesName (i32)                   37->40
  33     fUnits (u8) = 4                     41     fUnits (u8) = 8
  34->37 fCompress (i32)                     42->45
  38->41 fSeekInfo (i32)                     46->53 fSeekInfo (i64)
  42->45 fNbytesInfo (i32)                   54->57
  46->63 fUUID (18 bytes)                    58->75
  (rest of the 100-byte fBEGIN block is unused)

Record (TKey) layout
  1->4   Nbytes   (i32)  total record length, key header + data
  5->6   Version  (i16)  key version; > 1000 marks 64-bit seeks below
  7->10  ObjLen   (i32)  UNCOMPRESSED data length
  11->14 Datime   (u32)  packed write date/time
  15->16 KeyLen   (i16)  length of the key header itself
  17->18 Cycle    (i16)
  19->22 SeekKey  (i32; i64 when Version > 1000) = record's own offset
  23->26 SeekPdir (i32; i64 when Version > 1000) = owning dir's offset
  then three TStrings (1 length byte + that many bytes):
         ClassName, ObjectName, Title
  (TBasket keys carry the basket header between Title and KeyLen:
   fVersion i16, fBufferSize i32, fNevBufSize i32, fNevBuf i32,
   fLast i32, fHeaderOnly u8 — the public TBasket data members)

Data payload (what this reader consumes):
  - scalar branch basket: big-endian values back to back; the value
    region ends at fLast - fKeyLen
  - jagged branch basket: values, then TArray framing — i32 count,
    then `count` i32 fEntryOffset values, each ABSOLUTE within the
    basket buffer (i.e. including fKeyLen)
"""

import random
import struct
import zlib

import pytest

from bambooanalysis_spark.sources import minroot


# --- spec-table assemblers (independent of minroot's writer) ------------------


def _tstr(s: str) -> bytes:
    return bytes([len(s)]) + s.encode()


def _zl_frames(data: bytes, split: int | None = None) -> bytes:
    """ROOT compression frame sequence, assembled per the PUBLIC RZip
    layout (ROOT's io docs / RZip.cxx header comment): each frame is a
    9-byte header — 2-byte algorithm tag ("ZL" = zlib), 1 method byte
    (deflate = 8), 3-byte LITTLE-endian compressed size, 3-byte
    little-endian uncompressed size — followed by the compressed block.
    Independent of minroot's _compress_frames: zlib is the stdlib's.
    ``split`` cuts the data into two frames to exercise the multi-frame
    walk (ROOT splits every 16 MB in real files)."""
    chunks = [data] if split is None else [data[:split], data[split:]]
    out = b""
    for chunk in chunks:
        comp = zlib.compress(chunk, 6)
        out += (
            b"ZL" + bytes([8])
            + len(comp).to_bytes(3, "little")
            + len(chunk).to_bytes(3, "little")
            + comp
        )
    return out


def _spec_key(
    seek: int,
    classname: str,
    name: str,
    title: str,
    data: bytes,
    cycle: int = 1,
    basket_header: bytes = b"",
    big: bool = False,
    compress: bool = False,
) -> bytes:
    """One record, laid out per the TKey table above. ``compress`` stores
    the data as a ZL frame sequence: ObjLen keeps the UNCOMPRESSED
    length while Nbytes covers the stored (compressed) bytes — exactly
    how a reader detects compression (stored size != ObjLen)."""
    strings = _tstr(classname) + _tstr(name) + _tstr(title)
    seek_w = 16 if big else 8
    keylen = 18 + seek_w + len(strings) + len(basket_header)
    stored = (
        _zl_frames(data, split=max(1, len(data) // 2)) if compress else data
    )
    nbytes = keylen + len(stored)
    hdr = struct.pack(
        ">ihiIhh",
        nbytes,              # 1->4   Nbytes (key header + STORED data)
        1004 if big else 4,  # 5->6   Version (>1000 = 64-bit seeks)
        len(data),           # 7->10  ObjLen (always the uncompressed size)
        1389683462,          # 11->14 Datime (arbitrary valid packing)
        keylen,              # 15->16 KeyLen
        cycle,               # 17->18 Cycle
    )
    seeks = (
        struct.pack(">qq", seek, 100) if big  # 19->26/34 SeekKey, SeekPdir
        else struct.pack(">ii", seek, 100)
    )
    return hdr + seeks + strings + basket_header + stored


def _basket_header(n_values_bytes: int, nevbuf: int, keylen: int,
                   jagged: bool) -> bytes:
    """TBasket public members, packed in declaration order."""
    return struct.pack(
        ">hiiiiB",
        3,                               # fVersion
        keylen + n_values_bytes + 64,    # fBufferSize (capacity; >= used)
        4 if jagged else 0,              # fNevBufSize (bytes/entry offset)
        nevbuf,                          # fNevBuf (entries in this basket)
        keylen + n_values_bytes,         # fLast: end of the value region
        0,                               # fHeaderOnly
    )


def _spec_file(big: bool, compress: bool = False) -> bytes:
    """A complete flat-ntuple file: tree 't' with scalar branch x (/D)
    and jagged branch v (v[n]/I), three entries; ``compress`` stores the
    TTree blob and both basket payloads as spec-authored ZL frame
    sequences (two frames each)."""
    X = [1.5, -2.25, 3.0]
    V = [[7, -8], [9], []]

    records = []
    offsets = {}
    pos = 100  # fBEGIN: the header block reserves bytes 0..99

    def add(classname, name, title, data, basket_header=b"", cycle=1,
            comp=False):
        nonlocal pos
        rec = _spec_key(pos, classname, name, title, data,
                        cycle=cycle, basket_header=basket_header, big=big,
                        compress=comp)
        offsets[name] = pos
        records.append(rec)
        pos += len(rec)

    # 1) the file's own directory key, as TFile writes at fBEGIN: class
    #    TFile, data = name+title again plus the (opaque here) TDirectory
    add("TFile", "hand.root", "", _tstr("hand.root") + _tstr("") + bytes(30))

    # 2) the streamed-TTree metadata key. Only the leaflist descriptor
    #    TStrings matter to a streamer-less reader (TTree::Branch books
    #    them verbatim); the rest of a real streamed TTree is opaque.
    ttree_blob = (
        bytes([0x40, 0x00, 0x01, 0x02])  # fake byte-count prefix
        + _tstr("t") + _tstr("hand-authored tree")
        + bytes(8)
        + _tstr("x") + _tstr("x/D")      # TLeafD: name + leaflist title
        + bytes(4)
        + _tstr("v") + _tstr("v[n]/I")   # TLeafI with counter
        + bytes(12)
    )
    add("TTree", "t", "hand-authored tree", ttree_blob, comp=compress)

    # 3) basket for x: three f64 values; real layout puts the branch name
    #    in the key NAME and the tree name in the TITLE
    xvals = struct.pack(">3d", *X)
    strings_x = _tstr("TBasket") + _tstr("x") + _tstr("t")
    keylen_x = 18 + (16 if big else 8) + len(strings_x) + 19
    add("TBasket", "x", "t", xvals, comp=compress,
        basket_header=_basket_header(len(xvals), 3, keylen_x, False))

    # 4) basket for v: flat i32 values then TArray framing — count=3,
    #    then absolute fEntryOffset per entry (buffer offsets INCLUDING
    #    fKeyLen): entry 0 at keylen+0, entry 1 at keylen+8, entry 2 at
    #    keylen+12 (zero-length)
    vflat = [x for row in V for x in row]
    vvals = struct.pack(f">{len(vflat)}i", *vflat)
    strings_v = _tstr("TBasket") + _tstr("v") + _tstr("t")
    keylen_v = 18 + (16 if big else 8) + len(strings_v) + 19
    ventry_offsets = [keylen_v, keylen_v + 8, keylen_v + 12]
    vdata = vvals + struct.pack(">i3i", 3, *ventry_offsets)
    add("TBasket", "v", "t", vdata, comp=compress,
        basket_header=_basket_header(len(vvals), 3, keylen_v, True))

    # 5) StreamerInfo list (opaque payload; header's fSeekInfo points here)
    add("TList", "StreamerInfo", "Doubly linked list", bytes(24))

    body = b"".join(records)
    fend = 100 + len(body)
    seek_info = offsets["StreamerInfo"]

    if big:
        header = (
            b"root"                                  # 1->4   magic
            + struct.pack(">i", 1000000 + 62400)     # 5->8   fVersion+1e6
            + struct.pack(">i", 100)                 # 9->12  fBEGIN
            + struct.pack(">q", fend)                # 13->20 fEND (i64)
            + struct.pack(">q", 0)                   # 21->28 fSeekFree
            + struct.pack(">i", 0)                   # 29->32 fNbytesFree
            + struct.pack(">i", 1)                   # 33->36 nfree
            + struct.pack(">i", 54)                  # 37->40 fNbytesName
            + struct.pack(">B", 8)                   # 41     fUnits = 8
            + struct.pack(">i", 101 if compress else 0)  # 42->45 fCompress
            + struct.pack(">q", seek_info)           # 46->53 fSeekInfo (i64)
            + struct.pack(">i", 24)                  # 54->57 fNbytesInfo
            + bytes(18)                              # 58->75 fUUID
        )
    else:
        header = (
            b"root"                                  # 1->4   magic
            + struct.pack(">i", 62400)               # 5->8   fVersion
            + struct.pack(">i", 100)                 # 9->12  fBEGIN
            + struct.pack(">i", fend)                # 13->16 fEND
            + struct.pack(">i", 0)                   # 17->20 fSeekFree
            + struct.pack(">i", 0)                   # 21->24 fNbytesFree
            + struct.pack(">i", 1)                   # 25->28 nfree
            + struct.pack(">i", 54)                  # 29->32 fNbytesName
            + struct.pack(">B", 4)                   # 33     fUnits = 4
            + struct.pack(">i", 101 if compress else 0)  # 34->37 fCompress
            + struct.pack(">i", seek_info)           # 38->41 fSeekInfo
            + struct.pack(">i", 24)                  # 42->45 fNbytesInfo
            + bytes(18)                              # 46->63 fUUID
        )
    assert len(header) <= 100
    return header + bytes(100 - len(header)) + body


EXPECT_X = [1.5, -2.25, 3.0]
EXPECT_V = [[7, -8], [9], []]


@pytest.mark.parametrize("big", [False, True], ids=["small", "large64"])
def test_spec_authored_file_decodes(tmp_path, big):
    p = tmp_path / ("spec_big.root" if big else "spec.root")
    p.write_bytes(_spec_file(big))

    keys = minroot.list_keys(str(p))
    assert [(c, n) for c, n, _t, _cyc in keys] == [
        ("TFile", "hand.root"), ("TTree", "t"), ("TBasket", "x"),
        ("TBasket", "v"), ("TList", "StreamerInfo"),
    ]

    got = minroot.read_flat_tree(str(p), "t")
    assert got == {"x": EXPECT_X, "v": EXPECT_V}

    info = minroot.sniff_file(str(p))
    assert info["large_file"] is big
    assert info["compression"] == 0
    assert info["trees"] == {"t": 3}  # counted from x's basket fNevBuf
    assert info["branches"]["t"] == ["v", "x"]


def test_spec_authored_vs_writer_equivalence(tmp_path):
    """The writer must agree with the spec-authored bytes at the decoded
    level (byte-identical files are NOT required — datime/padding/order
    differ — but the decoded tree must match exactly)."""
    p = tmp_path / "writer.root"
    minroot.write_streamered_tree(
        str(p), "t", {"x": ("D", EXPECT_X), "v": ("I", EXPECT_V)}
    )
    assert minroot.read_flat_tree(str(p), "t") == {
        "x": EXPECT_X, "v": EXPECT_V,
    }


def test_large64_header_and_chain_fuzz(tmp_path):
    """VERDICT r8 #5(b): fuzz the 64-bit path the way r8 fuzzed sniff —
    420 cases of mutated / truncated / garbage large-layout files. The
    readers must either succeed or raise the documented error types
    (ValueError / KeyError / NotImplementedError); struct.error,
    IndexError and hangs are bugs."""
    base = _spec_file(big=True)
    rnd = random.Random(1789)
    allowed = (ValueError, KeyError, NotImplementedError)
    for trial in range(420):
        blob = bytearray(base)
        kind = trial % 3
        if kind == 0:  # flip 1-8 random bytes anywhere
            for _ in range(rnd.randrange(1, 9)):
                blob[rnd.randrange(len(blob))] = rnd.randrange(256)
        elif kind == 1:  # truncate (incl. mid-header and mid-key)
            blob = blob[: rnd.randrange(4, len(blob))]
        else:  # valid large header, garbage chain
            blob = blob[:100] + bytes(
                rnd.randrange(256) for _ in range(rnd.randrange(0, 300))
            )
            # keep fEND consistent-ish half the time, lie otherwise
            if rnd.random() < 0.5:
                blob = bytearray(blob)
                blob[12:20] = struct.pack(">q", len(blob))
                blob = bytes(blob)
        p = tmp_path / f"fz{trial}.root"
        p.write_bytes(bytes(blob))
        try:
            minroot.sniff_file(str(p))
        except allowed:
            pass
        try:
            minroot.list_keys(str(p))
        except allowed:
            pass
        try:
            minroot.read_flat_tree(str(p), "t")
        except allowed:
            pass


@pytest.mark.parametrize("big", [False, True], ids=["small", "large64"])
def test_spec_authored_compressed_file_decodes(tmp_path, big):
    """Compressed variant: the TTree blob and both basket payloads are
    ZL frame sequences assembled by THIS test from the public RZip
    layout (stdlib zlib, two frames per key) — the frame layout is no
    longer validated only by writer/reader self-roundtrips."""
    p = tmp_path / "spec_zl.root"
    p.write_bytes(_spec_file(big, compress=True))
    assert minroot.read_flat_tree(str(p), "t") == {
        "x": EXPECT_X, "v": EXPECT_V,
    }
    info = minroot.sniff_file(str(p))
    assert info["compression"] == 101
    assert info["trees"] == {"t": 3}
