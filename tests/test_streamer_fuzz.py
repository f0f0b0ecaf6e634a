"""Framing fuzz over the spec-authored streamered fixtures (VERDICT r10
#5): with no independent ROOT producer reachable in this environment
(pip AND conda-forge re-failed 2026-08-16, PERFORMANCE §66), the next
strongest statement about minroot's robustness is negative — a bit flip
in any FRAMING byte (file header, key headers, byte counts, class tags,
back-reference tags, version shorts, offsets) must either raise or leave
the decoded result bit-identical (the flip landed in bytes the reader
legitimately ignores, e.g. title text or unread attribute members). It
must NEVER silently return different data.

Payload bytes are exempt by construction: the fuzz region stops before
the first basket record, and the descriptor/name STRING spans inside the
TTree metadata (whose corruption legitimately changes what a faithful
reader reports — ROOT metadata carries no checksum) are skipped.
"""

import pytest

from bambooanalysis_spark.sources import minroot

from tests.test_streamer_spec import (
    MET,
    NPT,
    PT,
    _spec_streamered_file,
    _streamed_ttree_blob,
)

EXPECT = {"met": MET, "pt": PT, "npt": NPT}

# ASCII payload strings inside the TTree metadata record whose bytes are
# VALUES, not framing: flipping them changes what a faithful reader
# should report, so they are excluded from the must-raise-or-match sweep.
_PAYLOAD_STRINGS = [
    b"npt/I", b"pt[npt]/F", b"met/D",          # leaf descriptors
    b"npt\x00", b"pt\x00", b"met\x00",          # names inside C-strings
    b"spec-authored streamed tree",              # title text
    b"TBranch", b"TLeafI", b"TLeafF", b"TLeafD", b"TTree",
    b"strm.root",
]


def _payload_spans(data: bytes, lo: int, hi: int) -> set:
    spans = set()
    for s in _PAYLOAD_STRINGS:
        start = lo
        while True:
            i = data.find(s, start, hi)
            if i < 0:
                break
            spans.update(range(i, i + len(s)))
            start = i + 1
    # short names also appear as TNamed payloads ("npt" etc. without a
    # trailing NUL when length-prefixed): cover every 'npt'/'met'/'pt'
    for s in (b"npt", b"met", b"pt"):
        start = lo
        while True:
            i = data.find(s, start, hi)
            if i < 0:
                break
            spans.update(range(i, i + len(s)))
            start = i + 1
    return spans


def _fuzz_positions(data: bytes, lo: int, hi: int, step: int):
    skip = _payload_spans(data, lo, hi)
    for pos in range(lo, hi, step):
        if pos not in skip:
            yield pos


# sniff_file fields that are faithful VALUE reports of header/key bytes
# (fVersion, fCompress, the key-string triples): a flip there must show
# up verbatim in the report — that's detection, not mis-decode. The
# STRUCTURAL fields (trees/branches/cycles/fend/large_file) must never
# silently change.
_SNIFF_VALUE_FIELDS = {"version", "compression", "keys"}


def _read(path: str):
    got = minroot.read_flat_tree(path, "t")
    info = minroot.sniff_file(path)
    structural = {
        k: v for k, v in info.items() if k not in _SNIFF_VALUE_FIELDS
    }
    return got, structural


def test_file_framing_bit_flips_raise_or_decode_identically(tmp_path):
    data = _spec_streamered_file()
    blob = _streamed_ttree_blob()
    meta_end = data.index(blob) + len(blob)  # baskets start after this
    p = tmp_path / "fuzz.root"
    p.write_bytes(data)
    baseline = _read(str(p))
    assert baseline[0] == EXPECT

    flipped_silent_diff = []
    n_raised = n_equal = 0
    # every header byte, then every 3rd byte of the TFile/TTree records
    positions = list(_fuzz_positions(data, 0, 100, 1)) + list(
        _fuzz_positions(data, 100, meta_end, 3)
    )
    assert len(positions) > 300  # the sweep is real, not vacuous
    for pos in positions:
        bit = 1 << (pos % 8)
        mutated = bytearray(data)
        mutated[pos] ^= bit
        p.write_bytes(bytes(mutated))
        try:
            got = _read(str(p))
        except Exception:
            n_raised += 1
            continue
        if got == baseline:
            n_equal += 1
        else:
            flipped_silent_diff.append((pos, hex(data[pos])))
    assert not flipped_silent_diff, (
        "framing bit flips silently changed the decoded result at "
        f"positions {flipped_silent_diff[:10]} (of "
        f"{len(flipped_silent_diff)})"
    )
    # sanity on the split: both outcomes occur — some flips bite the
    # framing walk (raise), most land in bytes the skim-based reader
    # legitimately ignores (equal). 27 raising / ~600 equal measured at
    # authoring time; the bounds only pin that the sweep is not vacuous.
    assert n_raised >= 20, n_raised
    assert n_equal > 300, n_equal


def test_skim_framing_bit_flips_never_invent_descriptors():
    """_skim_leaflists is a tolerant scan: under framing corruption it
    may raise or MISS branches (read_flat_tree then fails loudly on the
    missing branch), but any descriptor it does return must be one of
    the true ones — a half-matched corrupted string must never come
    back attributed to a branch."""
    blob = _streamed_ttree_blob()
    truth = {"met": "met/D", "pt": "pt[npt]/F", "npt": "npt/I"}
    skip = _payload_spans(blob, 0, len(blob))
    checked = 0
    for pos in range(0, len(blob), 2):
        if pos in skip:
            continue
        mutated = bytearray(blob)
        mutated[pos] ^= 1 << (pos % 8)
        try:
            got = minroot._skim_leaflists(bytes(mutated), ["met", "pt", "npt"])
        except Exception:
            continue
        checked += 1
        for name, desc in got.items():
            assert truth[name] == desc, (pos, name, desc)
    assert checked > 100  # the sweep exercised real parses


def test_truncation_at_every_framing_boundary_raises_or_matches(tmp_path):
    """Prefix truncations of the file (every 64 bytes plus the exact
    record boundaries) must never silently return WRONG data."""
    data = _spec_streamered_file()
    p = tmp_path / "trunc.root"
    for cut in list(range(0, len(data), 64)) + [len(data) - 1]:
        p.write_bytes(data[:cut])
        try:
            got = minroot.read_flat_tree(str(p), "t")
        except Exception:
            continue
        assert got == EXPECT, f"truncation at {cut} mis-decoded"


@pytest.mark.parametrize("field_off,name", [(4, "fVersion"), (8, "fBEGIN"),
                                            (12, "fEND")])
def test_header_field_garbage_raises(tmp_path, field_off, name):
    """Whole-field garbage in the three load-bearing header ints —
    stronger than a single bit — must raise, not seek into nonsense."""
    data = bytearray(_spec_streamered_file())
    data[field_off:field_off + 4] = b"\x7f\xff\xff\xfe"
    p = tmp_path / "hdr.root"
    p.write_bytes(bytes(data))
    with pytest.raises(Exception):
        _read(str(p))
