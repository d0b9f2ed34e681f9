"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship Janus-QL hybrid-historical query at sf0.001.
``queries()``   — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()``— DuckDB-equivalent SQL per query (same column names).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: historical fixed-window Janus-QL query over melted events
    (the reference's canonical query shape,
    tests/janus_api_integration_test.rs:142-152)."""
    from janus_spark.queries import q_hist_fixed

    return q_hist_fixed(spark, DEFAULT_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from janus_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from janus_spark.queries import (
        ORACLES,
        oracle_for_hist_fixed,
        oracle_for_hist_sliding,
        oracle_for_hist_sliding_star,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    out = dict(ORACLES)
    out["q_hist_fixed"] = oracle_for_hist_fixed(sf_dir)
    out["q_hist_sliding"] = oracle_for_hist_sliding(sf_dir)
    out["q_hist_sliding_star"] = oracle_for_hist_sliding_star(sf_dir)
    return out
