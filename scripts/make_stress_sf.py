"""Build a 10x scale-stress dataset (sf1-equivalent) from the driver's
sf0.1 parquet by unioning shifted copies — VERDICT r1 item 3.

This is NOT a replacement for the driver's testdata (gates still run on
/root/testdata); it exists to stress plans at 10x density: per-window
event counts, dedup candidate growth (document copies are byte-identical
→ worst-case posting skew), ANN corpus size, and TPC-H join cardinality
(FK chains re-keyed per copy so joins stay consistent).

Usage: python scripts/make_stress_sf.py [out_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.stress/sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

# per-table id shifts; FK columns shift together so joins stay consistent
SHIFTS = {
    "events": {"event_id": 100_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 100_000},
    "embeddings": {"vec_id": 10_000},
    "customer": {"c_custkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000},
    # dimension tables stay single-copy: nation/region/part/supplier keys
    # are referenced by shifted facts only through unshifted columns
}
SINGLE = ["region", "nation", "part", "supplier"]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in SINGLE:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied 1x")
    for t, shifts in SHIFTS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        selects = []
        for i in range(COPIES):
            proj = ", ".join(
                f"{c} + {i * s}::BIGINT AS {c}" if (s := shifts.get(c)) else c
                for c in cols
            )
            selects.append(f"SELECT {proj} FROM read_parquet('{SRC}/{t}.parquet')")
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
        print(t, f"scaled {COPIES}x ->", n)


if __name__ == "__main__":
    main()
