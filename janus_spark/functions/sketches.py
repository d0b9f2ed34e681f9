"""Approximate / mergeable sketch aggregates — the 100 TB scale path for
cardinality and quantile questions where exact answers need a full
shuffle of all distinct values.

Everything here is a thin, typed wrapper over Spark's built-in sketch
aggregates (Datasketches HLL, count-min, T-digest-style quantiles), so
the heavy lifting stays JVM-side and partial aggregates merge map-side.
The point of wrapping: a stable engine API plus *persistable* sketch
columns — `hll_by_key` materializes per-key sketches you can store in
parquet and re-union later (incremental daily rollups without rescanning
history; the pattern the exact path cannot express).

Accuracy contract (pinned by tests/test_sketches.py): HLL relative error
< 3% at lgK=14 on the test corpus; percentile_approx within the value
spread of the exact interpolated percentile at accuracy 10k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_distinct(df: DataFrame, value_col: str, by: list[str], lgk: int = 14) -> DataFrame:
    """Approximate distinct count of ``value_col`` per group (HLL).
    One narrow aggregation: each executor builds partial sketches, the
    merge is a tiny shuffle of ~2^lgk-byte binaries, never of values."""
    return df.groupBy(*by).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(value_col, F.lit(lgk))).alias("approx_distinct")
    )


def hll_by_key(df: DataFrame, value_col: str, by: list[str], lgk: int = 14) -> DataFrame:
    """Per-key HLL sketches as a binary column — store these, then roll up
    later with :func:`hll_merge` instead of rescanning raw history."""
    return df.groupBy(*by).agg(F.hll_sketch_agg(value_col, F.lit(lgk)).alias("hll"))


def hll_merge(df: DataFrame, by: list[str]) -> DataFrame:
    """Union stored sketches to a coarser grouping and estimate."""
    return df.groupBy(*by).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("approx_distinct")
    )


def approx_quantiles(
    df: DataFrame, value_col: str, by: list[str], probs: list[float], accuracy: int = 10000
) -> DataFrame:
    """Mergeable approximate percentiles (Greenwald-Khanna).  Returns one
    array column ``q`` aligned with ``probs``."""
    return df.groupBy(*by).agg(
        F.percentile_approx(value_col, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)).alias("q")
    )
