#!/usr/bin/env python
"""Scale-rehearsal data builder (round-4 Next #2).

The driver's generator is not shipped, so sfN is built from the largest
driver fixture (sf0.1, seed 42) by N-fold replication with key remapping —
a standard scale-out rehearsal shape that preserves the fixture's
distributions where it matters for plan behavior:

- fact/doc/event tables: N copies, every entity key offset by
  copy * (max_key + 1) with FKs remapped consistently (orders->customer,
  lineitem->orders/part/supplier, so join fan-outs and group sizes are
  unchanged; only the number of groups grows Nx).
- dimensions (region, nation): unchanged, as in TPC-H.
- events: same time span, Nx users -> Nx density per time bucket.
- documents: a copy-tagged extra token is appended so the exact-duplicate
  rate isn't inflated Nx by the replication itself (the 31-token core
  vocabulary — and hence the corpus's intrinsic pair density — is
  preserved).
- embeddings: each copy's vectors are cyclically rotated by the copy
  index (norm-preserving, declones the copies without changing per-dim
  distributions).

Pure DuckDB -> parquet; deterministic. Usage:
    python scripts/make_scale_data.py [N] [out_dir]
defaults: N=10, out_dir=.scale/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else ".scale/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        )
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range({n})) AS copy")

    # precomputed offsets: a correlated MAX subquery inside the
    # replicated SELECT confuses the binder (it hoists the aggregate)
    maxes = {
        (key, table): con.execute(f"SELECT MAX({key}) + 1 FROM {table}").fetchone()[0]
        for key, table in [
            ("c_custkey", "customer"), ("s_suppkey", "supplier"),
            ("p_partkey", "part"), ("o_orderkey", "orders"),
            ("event_id", "events"), ("user_id", "events"),
            ("doc_id", "documents"), ("vec_id", "embeddings"),
        ]
    }

    def off(key: str, table: str) -> str:
        base = {"o_custkey": "c_custkey", "l_orderkey": "o_orderkey",
                "l_partkey": "p_partkey", "l_suppkey": "s_suppkey"}.get(key, key)
        return f"{key} + copy * {maxes[(base, table)]}"

    sql = {
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "customer": f"""
            SELECT {off('c_custkey', 'customer')} AS c_custkey,
                   c_name || '#' || copy AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM customer, copies""",
        "supplier": f"""
            SELECT {off('s_suppkey', 'supplier')} AS s_suppkey,
                   s_name || '#' || copy AS s_name, s_nationkey, s_acctbal
            FROM supplier, copies""",
        "part": f"""
            SELECT {off('p_partkey', 'part')} AS p_partkey,
                   p_name || '#' || copy AS p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM part, copies""",
        "orders": f"""
            SELECT {off('o_orderkey', 'orders')} AS o_orderkey,
                   {off('o_custkey', 'customer')} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM orders, copies""",
        "lineitem": f"""
            SELECT {off('l_orderkey', 'orders')} AS l_orderkey,
                   {off('l_partkey', 'part')} AS l_partkey,
                   {off('l_suppkey', 'supplier')} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem, copies""",
        "events": f"""
            SELECT {off('event_id', 'events')} AS event_id, ts,
                   {off('user_id', 'events')} AS user_id,
                   event_type, value, props
            FROM events, copies""",
        "documents": f"""
            SELECT {off('doc_id', 'documents')} AS doc_id,
                   CASE WHEN copy = 0 THEN text
                        ELSE text || ' copytok' || copy END AS text,
                   lang, source,
                   CASE WHEN copy = 0 THEN n_chars
                        ELSE n_chars + 8 + CAST(LENGTH(CAST(copy AS VARCHAR)) AS BIGINT)
                   END AS n_chars
            FROM documents, copies""",
        "embeddings": f"""
            SELECT {off('vec_id', 'embeddings')} AS vec_id,
                   CASE WHEN copy = 0 THEN embedding
                        ELSE list_concat(embedding[copy % len(embedding) + 1:],
                                         embedding[1:copy % len(embedding)])
                   END AS embedding,
                   label
            FROM embeddings, copies""",
    }
    for t, q in sql.items():
        con.execute(
            f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET, CODEC 'SNAPPY')"
        )
        rows = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {rows} rows")


if __name__ == "__main__":
    main()
