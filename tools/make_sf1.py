#!/usr/bin/env python3
"""Derive an sf1-scale probe corpus (10x sf0.1) for the bench probe.

Replicates every sf0.1 fact table 10 times with key columns shifted by a
replica offset so join relationships (customer->orders->lineitem,
part/supplier->lineitem, events.user_id, documents.doc_id) are preserved
and cardinalities scale 10x without creating artificial hot keys.
Dimension tables (region, nation) stay fixed, as in real TPC-H scaling.

Dev tooling only (driver-side python) - NOT part of the shipped library.
The derived data lives outside the repo and is never committed; only the
probe's timing JSON is.

Usage: python3 tools/make_sf1.py [outDir=/tmp/graft_sf1]
"""
import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = 100_000_000  # far above any sf0.1 key

# table -> columns shifted by replica*OFF (replica 0 = original rows)
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def main():
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")
    for t, keys in SHIFTS.items():
        desc = con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
        cols = [r[0] for r in desc]
        sel = ", ".join(
            f"{c} + r.replica * {OFF} AS {c}" if c in keys else c for c in cols)
        con.execute(f"""
            COPY (
              SELECT {sel}
              FROM '{SRC}/{t}.parquet', (SELECT unnest(range(10)) AS replica) r
            ) TO '{out}/{t}.parquet' (FORMAT PARQUET)""")
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
