"""Per-stage profile of one or more gates: run each named query with the
noop sink (guide §1.4) on a UI-enabled session, then read the UI REST API
for job/stage wall-clock and shuffle bytes so the expensive stage is
identified empirically (guide §1.1/§7.1) instead of guessed.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/profile_gate.py q_x [q_y ...]
Prints, per query: build time (eager prefix work — localCheckpoints,
model collects) vs noop-sink execution time, then the top stages by
duration with input/shuffle bytes.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_json(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[1:]
    from pyspark.sql import SparkSession

    from janus_spark.session import get_spark

    # same settings as the engine session, but with the UI on so stage
    # metrics are readable; built BEFORE get_spark so getOrCreate adopts it
    # this builder launches the JVM, so driver memory must be set HERE —
    # get_spark's config would be ignored ("only runtime SQL configurations
    # take effect" on an existing session) and the heap would stay at the
    # 1g default, OOMing the memory-heavy gates
    (
        SparkSession.builder.config("spark.ui.enabled", "true")
        .config("spark.driver.memory", os.environ.get("JANUS_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark = get_spark("janus_profile")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    from janus_spark.queries import QUERIES

    # warm-up (mirror bench.py)
    spark.range(1000).count()
    from janus_spark.sources.melt import read_events

    read_events(spark, SF_DIR).count()

    for name in names:
        jobs_before = {j["jobId"] for j in get_json(f"{ui}/api/v1/applications/{app_id}/jobs")}
        spark.sparkContext.setJobDescription(f"build: {name}")
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        t_build = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(f"exec: {name}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_exec = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)

        jobs = [
            j
            for j in get_json(f"{ui}/api/v1/applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        n_build = sum(1 for j in jobs if (j.get("description") or "").startswith("build:"))
        print(
            f"\n=== {name}: build {t_build:.2f}s ({n_build} jobs) + "
            f"exec {t_exec:.2f}s ({len(jobs) - n_build} jobs), "
            f"{len(jobs)} jobs total"
        )
        stages = get_json(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
        stage_ids = {s for j in jobs for s in j["stageIds"]}
        mine = [s for s in stages if s["stageId"] in stage_ids]
        mine.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        for s in mine[:12]:
            dur = (s.get("executorRunTime") or 0) / 1000.0
            print(
                f"  stage {s['stageId']:>4} exRun {dur:7.2f}s tasks {s['numCompleteTasks']:>4} "
                f"in {s.get('inputBytes', 0)>>20:>5}MB sh_r {s.get('shuffleReadBytes', 0)>>20:>5}MB "
                f"sh_w {s.get('shuffleWriteBytes', 0)>>20:>5}MB  {s['name'].splitlines()[0][:70]}"
            )


if __name__ == "__main__":
    main()
