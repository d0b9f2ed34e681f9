"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a full materialization (count of the collected
plan) so the number covers scan + shuffle + aggregation, mirroring the
reference's end-to-end bench shapes (BASELINE.md: ingest rate, range scan,
sliding sweep, live injection)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "q_bgp_scan",
    "q_bgp_join",
    "q_agg_group",
    "q_join_bind_concat",
    "q_hist_fixed",
    "q_hist_sliding",
    "q_comparator_stats",
    "q_baseline_aggregate",
]


def main() -> None:
    from janus_spark.session import get_spark
    from janus_spark.queries import QUERIES

    spark = get_spark("janus_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/session warm-up on a trivial job so the first query isn't charged
    # for executor spin-up
    spark.range(1000).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_query_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else SF_DIR,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
