"""ROOT TTree -> Parquet ingest — the engine's answer to the reference's
TTree scan (SURVEY.md §2.1: 'ROOT ingest = one-time uproot -> Arrow ->
Parquet conversion step outside the engine').

The reference reads flat ntuples (one branch per attribute: elec_pt[],
elec_eta[], ...) from a TTree named e.g. 'myana/mytree'
(/root/reference/jet_test.yml:1, phaseII-analysis.py:27). This module:

1. reads those branches with uproot (pure-python ROOT I/O) as awkward/
   numpy arrays, file by file — streaming in entry-range chunks so a
   multi-GB tree never materializes at once,
2. groups the flat per-attribute arrays into the engine's nested event
   model (array<struct> per collection — the 'decorator' analog,
   SURVEY.md §1.6) via Arrow,
3. writes Parquet the engine scans natively (column pruning + predicate
   pushdown apply from then on).

uproot/awkward are NOT in this container (no network; `pip install uproot`
fails with a DNS error — recorded 2026-08-14), so the uproot shim is gated
behind import and the ingest falls back to the vendored pure-stdlib
``minroot`` reader, which struct-unpacks ROOT-format TKey/TBasket chains
including zlib/lzma per-key compression frames AND (round-7) the
real-ROOT layout: streamer-carrying files with streamed-TTree metadata
keys, ``name;cycle`` backup cycles, and branch-named basket keys, as
long as the branches are flat leaflist-booked (the reference's ntuples
are — jet_test.yml:10-11). Object-model branches and lz4/zstd
compression still need uproot and raise with that pointer.
``minroot.sniff_file`` inventories any real file's key chain
(trees/branches/entries/cycles) header-only for config validation.

At 100 TB: ingest parallelizes per file (driver distributes file lists to
executors via `spark.createDataFrame(files).mapInPandas`), and the output
is partitioned/sorted so the pT-descending invariant (SURVEY.md §2.8) holds
at write time.
"""

from __future__ import annotations


import pyarrow as pa

# Flat-branch layout of the CMS Phase-2 ntuple surface the reference uses
# (fields per collection: SURVEY.md §1.1 table).
COLLECTION_BRANCHES: dict[str, list[str]] = {
    "elec": ["pt", "eta", "phi", "mass", "charge", "isopass", "idpass"],
    "muon": ["pt", "eta", "phi", "mass", "charge", "isopass", "idpass"],
    "jetpuppi": ["pt", "eta", "phi", "mass", "btag"],
}
SCALAR_BRANCHES: dict[str, list[str]] = {"metpuppi": ["pt", "phi"]}


def have_uproot() -> bool:
    try:
        import uproot  # noqa: F401

        return True
    except ImportError:
        return False


def flat_chunk_to_arrow(chunk: dict[str, list]) -> pa.Table:
    """Build the nested event table from one chunk of flat branches.

    ``chunk`` maps branch name -> per-event data:
      - ``{coll}_{field}`` -> list of lists (variable-length per event)
      - ``{scalar}_{field}`` -> flat list
      - ``event_id`` -> flat list
    The per-collection lists are zipped into list<struct> columns, sorted
    pT-descending with the same deterministic tie-break as
    operators.collections.sort_by_pt.
    """
    n = len(chunk["event_id"])
    cols: dict[str, object] = {"event_id": pa.array(chunk["event_id"], pa.int64())}
    cols["weight"] = pa.array([1.0] * n, pa.float64())
    for coll, fields in COLLECTION_BRANCHES.items():
        per_event = []
        field_data = [chunk[f"{coll}_{f}"] for f in fields]
        for i in range(n):
            objs = [
                dict(zip(fields, vals))
                for vals in zip(*(fd[i] for fd in field_data))
            ]
            objs.sort(
                key=lambda o: (
                    -o["pt"],
                    o["phi"],
                    o["eta"],
                    o.get("mass", 0.0),
                )
            )
            per_event.append(objs)
        struct_type = pa.struct(
            [
                (f, pa.float64() if f in ("pt", "eta", "phi", "mass") else pa.int32())
                for f in fields
            ]
        )
        cols[coll] = pa.array(per_event, pa.list_(struct_type))
    for scalar, fields in SCALAR_BRANCHES.items():
        rows = [
            {f: chunk[f"{scalar}_{f}"][i] for f in fields} for i in range(n)
        ]
        cols[scalar] = pa.array(rows, pa.struct([(f, pa.float64()) for f in fields]))
    return pa.table(cols)


def _ntuple_branches() -> list[str]:
    return [
        f"{c}_{fld}" for c, flds in COLLECTION_BRANCHES.items() for fld in flds
    ] + [f"{s}_{fld}" for s, flds in SCALAR_BRANCHES.items() for fld in flds]


def _iter_file_chunks(path: str, tree: str, chunk_events: int):
    """Yield (n_entries_in_chunk, flat-branch dict) chunks from one ROOT
    file. uproot when available (handles streamer-based real files,
    streaming entry ranges); otherwise the vendored minroot reader
    (flat-tree subset incl. zlib-compressed baskets, whole file then
    sliced)."""
    branches = _ntuple_branches()
    if have_uproot():
        import uproot

        with uproot.open(path) as f:
            t = f[tree]
            n_entries = t.num_entries
            for start in range(0, n_entries, chunk_events):
                stop = min(start + chunk_events, n_entries)
                arrs = t.arrays(
                    branches, entry_start=start, entry_stop=stop, library="np"
                )
                yield stop - start, {
                    k: [list(x) for x in v] if v.dtype == object else list(v)
                    for k, v in arrs.items()
                }
        return
    from . import minroot

    data = minroot.read_flat_tree(path, tree)
    missing = [b for b in branches if b not in data]
    if missing:
        raise KeyError(f"{path}: tree {tree!r} lacks branches {missing}")
    n_entries = len(data[branches[0]])
    for start in range(0, n_entries, chunk_events):
        stop = min(start + chunk_events, n_entries)
        yield stop - start, {b: data[b][start:stop] for b in branches}


def ingest_root_files(
    files: list[str],
    tree: str,
    out_dir: str,
    chunk_events: int = 100_000,
) -> dict[str, float]:
    """Convert ROOT files to the engine's Parquet event model; returns the
    merged counters (mergeCounters analog, phaseII-analysis.py:21-32).

    Branch naming: '{collection}_{field}' flat arrays, as in the CMS
    Phase-2 flat ntuples the reference consumes. Reads with uproot when
    installed; flat trees, raw or zlib-compressed (the vendored minroot
    subset), work stdlib-only.
    """
    import pyarrow.parquet as pq

    n_total = 0
    writer = None
    try:
        event_offset = 0
        for path in files:
            for n_chunk, chunk in _iter_file_chunks(path, tree, chunk_events):
                chunk["event_id"] = list(
                    range(event_offset, event_offset + n_chunk)
                )
                event_offset += n_chunk
                n_total += n_chunk
                table = flat_chunk_to_arrow(chunk)
                if writer is None:
                    writer = pq.ParquetWriter(
                        f"{out_dir}/events.parquet", table.schema
                    )
                writer.write_table(table)
    finally:
        if writer is not None:
            writer.close()
    return {"nEvents": float(n_total), "genEvents": float(n_total)}
