"""Stateful comparator — operator W9 (anomaly detection over aggregates).

Reference (src/stream/comparator.rs:1-237): keeps the last K (default 10)
(timestamp, value) points for a live and a historical series; per update
computes WindowStats {mean, population std-dev, least-squares slope,
count} on each side and emits six anomaly kinds.

Spark-first: the per-point loop becomes SQL window functions over the
last-K-rows frame (``rowsBetween(-K+1, 0)``) — mean ≙ avg, population
std-dev ≙ stddev_pop, least-squares slope ≙ regr_slope(value, ts); the
six rules are Column predicates.  Batch-distributed per key; the
streaming variant runs the same expressions inside foreachBatch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class ComparatorConfig:
    """Defaults mirror the reference (comparator.rs:80-92)."""

    abs_threshold: float = 1.0
    rel_threshold: float = 0.1
    catchup_trigger: float = 2.0
    slope_epsilon: float = 0.01
    volatility_buffer: float = 0.5
    window_size: int = 10
    outlier_z_threshold: float = 3.0


def window_stats(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    window_size: int = 10,
    prefix: str = "",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Rolling WindowStats over the last `window_size` rows per key.

    Matches comparator.rs:23-57: mean, POPULATION std-dev, least-squares
    slope over (ts, value) with the zero-denominator → 0.0 guard, count.
    ``order_cols``: tie-breaking sort keys (default [ts_col]); pass a
    unique key to make rolling frames deterministic under equal ts.
    """
    w = (
        Window.partitionBy(*(key_cols or []))
        .orderBy(*[F.col(c) for c in (order_cols or [ts_col])])
        .rowsBetween(-(window_size - 1), 0)
    )
    v = F.col(value_col).cast("double")
    t = F.col(ts_col).cast("double")
    slope = F.coalesce(F.regr_slope(v, t).over(w), F.lit(0.0))
    return (
        df.withColumn(f"{prefix}mean", F.avg(v).over(w))
        .withColumn(f"{prefix}std_dev", F.coalesce(F.stddev_pop(v).over(w), F.lit(0.0)))
        .withColumn(f"{prefix}slope", slope)
        .withColumn(f"{prefix}count", F.count(v).over(w))
    )


def detect_anomalies(
    df: DataFrame,
    live_col: str,
    hist_col: str,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    config: ComparatorConfig | None = None,
) -> DataFrame:
    """update_and_compare over a frame of (ts, live_val, hist_val) rows.

    Emits one row per input row with an ``anomalies`` array column listing
    the triggered kinds, replicating compare_stats (comparator.rs:185-236):

    - AbsoluteThresholdExceeded: |live.mean - hist.mean| > abs_threshold
    - RelativeDropDetected: (live.mean-hist.mean)/hist.mean > rel_threshold
      (guarded on |hist.mean| > eps)
    - CatchUpTriggered: hist.mean - live.mean > catchup_trigger
    - TrendDivergence: slopes of opposite sign, both |slope| > epsilon
    - VolatilityIncrease: live.std > hist.std + buffer
    - LiveOutlierDetected: |(latest_live - hist.mean)/hist.std| > z
    """
    cfg = config or ComparatorConfig()
    keys = key_cols or []
    df = window_stats(df, live_col, ts_col, keys, cfg.window_size, "live_")
    df = window_stats(df, hist_col, ts_col, keys, cfg.window_size, "hist_")

    eps = 2.220446049250313e-16  # f64::EPSILON, as in the reference guards
    lm, hm = F.col("live_mean"), F.col("hist_mean")
    ls, hs = F.col("live_slope"), F.col("hist_slope")
    lsd, hsd = F.col("live_std_dev"), F.col("hist_std_dev")
    latest = F.col(live_col).cast("double")
    z = (latest - hm) / hsd

    checks = [
        ("AbsoluteThresholdExceeded", F.abs(lm - hm) > cfg.abs_threshold),
        (
            "RelativeDropDetected",
            (F.abs(hm) > eps) & (((lm - hm) / hm) > cfg.rel_threshold),
        ),
        ("CatchUpTriggered", (hm - lm) > cfg.catchup_trigger),
        (
            "TrendDivergence",
            (ls * hs < 0) & (F.abs(ls) > cfg.slope_epsilon) & (F.abs(hs) > cfg.slope_epsilon),
        ),
        ("VolatilityIncrease", lsd > hsd + cfg.volatility_buffer),
        ("LiveOutlierDetected", (hsd > eps) & (F.abs(z) > cfg.outlier_z_threshold)),
    ]
    arr = F.array_compact(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in checks])
    )
    return df.withColumn("anomalies", arr).withColumn("z_score", F.when(hsd > eps, z))
