"""The nine Janus anomaly extension functions (F1-F9) as native Column
expressions — no Python UDFs, fully inside whole-stage codegen.

Reference semantics: src/extensions/math.rs (abs_diff, relative_change,
zscore) and src/extensions/rules.rs (the six boolean rules).  Error
semantics: the reference raises an evaluation error for non-numeric args
or non-finite results, which drops the row in FILTER
(src/extensions/query_options.rs:13-19).  Here every operand is cast to
double (null if non-numeric) and nulls propagate — a null predicate is
treated as false by DataFrame.filter, reproducing row-dropping exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SIGMA_EPS = 1e-10


def _num(c: Column) -> Column:
    # try_cast: non-numeric -> null -> row dropped in FILTER, even under
    # Spark 4's default ANSI mode (plain cast would throw)
    return c.try_cast("double")


def abs_diff(live: Column, hist: Column) -> Column:
    """|live - hist| (math.rs:4-6)."""
    return F.abs(_num(live) - _num(hist))


def relative_change(live: Column, hist: Column) -> Column:
    """(live-hist)/hist; null (row-dropping) when hist == 0, matching the
    reference's non-finite -> error behavior (math.rs:11-13,
    query_options.rs:64-77)."""
    l, h = _num(live), _num(hist)
    return F.when(h != 0, (l - h) / h)


def zscore(value: Column, mean: Column, sigma: Column) -> Column:
    """(v-mean)/sigma with the sigma≈0 -> 0.0 special case (math.rs:18-24)."""
    v, m, s = _num(value), _num(mean), _num(sigma)
    return F.when(
        v.isNull() | m.isNull() | s.isNull(), F.lit(None).cast("double")
    ).otherwise(F.when(F.abs(s) < SIGMA_EPS, F.lit(0.0)).otherwise((v - m) / s))


def absolute_threshold_exceeded(live: Column, hist: Column, threshold: Column) -> Column:
    """|live-hist| > t (rules.rs:44-52)."""
    return abs_diff(live, hist) > _num(threshold)


def relative_threshold_exceeded(live: Column, hist: Column, threshold: Column) -> Column:
    """(live-hist)/hist > t (rules.rs:54-62)."""
    return relative_change(live, hist) > _num(threshold)


def catch_up(hist: Column, live: Column, threshold: Column) -> Column:
    """(hist-live) > t (rules.rs:64-72)."""
    return (_num(hist) - _num(live)) > _num(threshold)


def volatility_increase(live_sigma: Column, hist_sigma: Column, buffer: Column) -> Column:
    """live_sigma > hist_sigma + buffer (rules.rs:74-82)."""
    return _num(live_sigma) > (_num(hist_sigma) + _num(buffer))


def is_outlier(value: Column, mean: Column, sigma: Column, z_threshold: Column) -> Column:
    """|zscore(v,mean,sigma)| > z; sigma=0 => zscore 0 => false (rules.rs:84-92)."""
    return F.abs(zscore(value, mean, sigma)) > _num(z_threshold)


def trend_divergent(live_slope: Column, hist_slope: Column, epsilon: Column) -> Column:
    """|live_slope - hist_slope| > eps (rules.rs:94-102)."""
    return F.abs(_num(live_slope) - _num(hist_slope)) > _num(epsilon)
