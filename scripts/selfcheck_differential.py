"""Engine-vs-engine differential digest check (no DuckDB needed).

Runs each gate TWICE under deliberately different physical execution —
run A: AQE on, spark.sql.shuffle.partitions=32 (the normal config);
run B: AQE off, spark.sql.shuffle.partitions=7 — and compares order-free
multiset digests of the two results.  Different shuffle fan-outs change
partition assignment and within-partition row order at every exchange,
so any order- or partitioning-dependent accumulation in a gate (the class
the repo's fixed-point-sum discipline exists to prevent) produces a
digest divergence here.

Purpose (VERDICT r6 next-round #3): close the sf10 verification ceiling
for gates whose DuckDB oracles cannot complete at that scale (pagerank
family: 40 GB CTE spill; q_edit_distance: single-threaded levenshtein;
q_ewma).  Those gates are sf1-EXACT against DuckDB; this differential
extends the order-free-exactness guarantee to sf10 without an oracle.

Usage: python scripts/selfcheck_differential.py [sf_dir] gate [gate ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
GATES = sys.argv[2:]
if not GATES:
    print("usage: selfcheck_differential.py sf_dir gate [gate ...]")
    sys.exit(2)

os.environ.setdefault("JANUS_DRIVER_MEM", "24g")
os.environ.setdefault("JANUS_MAX_RESULT_SIZE", "8g")

import __spark_entry__ as entry_mod  # noqa: E402
from janus_spark.digest import spark_multiset_digest  # noqa: E402
from janus_spark.session import get_spark  # noqa: E402

CONFIGS = [
    ("A(aqe,32)", {"spark.sql.adaptive.enabled": "true",
                   "spark.sql.shuffle.partitions": "32"}),
    ("B(noaqe,7)", {"spark.sql.adaptive.enabled": "false",
                    "spark.sql.shuffle.partitions": "7"}),
]


def main() -> int:
    spark = get_spark("selfcheck-differential")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    failures = 0
    for name in GATES:
        if name not in queries:
            print(f"?? {name}: not in registry")
            failures += 1
            continue
        digests = []
        for label, conf in CONFIGS:
            for k, v in conf.items():
                spark.conf.set(k, v)
            t0 = time.time()
            try:
                from pyspark import StorageLevel

                sdf = queries[name](spark, SF_DIR)
                persisted = sdf.persist(StorageLevel.DISK_ONLY)
                n, dig = spark_multiset_digest(persisted)
                persisted.unpersist()
            except Exception as e:  # noqa: BLE001 - report, keep sweeping
                print(f"FAIL {name} {label}: ERROR {e}")
                digests = None
                break
            digests.append((label, n, dig, time.time() - t0))
        # restore the normal config before the next gate
        for k, v in CONFIGS[0][1].items():
            spark.conf.set(k, v)
        if digests is None:
            failures += 1
            continue
        (la, na, da, ta), (lb, nb, db, tb) = digests
        if na == nb and da == db:
            print(f"OK   {name}: {na} rows, digests match "
                  f"({la} {ta:.1f}s, {lb} {tb:.1f}s)", flush=True)
        else:
            print(f"FAIL {name}: {la}=({na} rows, {da}) "
                  f"{lb}=({nb} rows, {db})", flush=True)
            failures += 1
    print(f"\n{len(GATES)} gates, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
