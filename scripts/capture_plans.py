"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <round_dir> <suffix> [query ...]
e.g.   python scripts/capture_plans.py r10 before q_curation_full q_bgp_join

Writes plans/<round_dir>/<query>_<suffix>.txt.  Building a gate's
DataFrame may execute eager prefix work (localCheckpoint / model
collects); the captured plan is the final declared segment — the same
thing the bench times from the checkpoint cuts onward.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    round_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        round_dir,
    )
    os.makedirs(out_dir, exist_ok=True)

    from janus_spark.queries import QUERIES
    from janus_spark.session import get_spark

    spark = get_spark("janus_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spark.sparkContext.setJobDescription(f"plan: {name}")
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exchange = plan.count("Exchange")
        print(f"# {name}: {len(plan)} bytes, {n_exchange} Exchange -> {path}")


if __name__ == "__main__":
    main()
