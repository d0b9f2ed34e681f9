"""Time named gates with the noop sink under optional extra Spark confs —
for config-level A/B (guide §1.2 order-3: config only after algorithm and
per-task work).  Confs are a comma-separated k=v list in JANUS_AB_CONF;
each arm must run in its OWN process (Spark session confs are fixed at
startup), so the caller interleaves invocations:

  for i in 1 2 3; do
    python scripts/ab_conf.py q_x q_y
    JANUS_AB_CONF=spark.sql.join.preferSortMergeJoin=false \
      python scripts/ab_conf.py q_x q_y
  done

Prints one line per gate: name, per-rep seconds, min.  Warm-up mirrors
bench.py (first rep pays codegen; min over later reps is steady-state).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    reps = int(os.environ.get("JANUS_AB_REPS", "3"))
    conf = os.environ.get("JANUS_AB_CONF", "")

    from pyspark.sql import SparkSession

    if conf:
        b = SparkSession.builder
        for kv in conf.split(","):
            k, v = kv.split("=", 1)
            b = b.config(k, v)
        b.getOrCreate()

    from janus_spark.queries import QUERIES
    from janus_spark.session import get_spark

    spark = get_spark("ab_conf")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    from janus_spark.sources.melt import read_events

    read_events(spark, SF_DIR).count()

    tag = conf or "baseline"
    for name in names:
        runs = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"ab[{tag}]: {name}")
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{tag} {name}: min={min(runs[1:] or runs):.3f}s "
            f"runs={[round(t, 3) for t in runs]} loadavg={os.getloadavg()[0]:.1f}"
        )


if __name__ == "__main__":
    main()
