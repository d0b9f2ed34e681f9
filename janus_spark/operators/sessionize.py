"""Sessionization: group an event stream into per-key activity sessions
separated by inactivity gaps.

Spark-native via ``F.session_window`` — works identically over batch
DataFrames and Structured Streaming (with a watermark, state is evicted
as sessions close), so one operator covers both the historical and live
paths.  Semantics (verified empirically, pinned by tests):

- merge rule is INCLUSIVE: an event at exactly ``prev_ts + gap`` still
  joins the previous session (equivalent island condition:
  ``ts - lag(ts) > gap`` starts a new session);
- ``session_end = last_event_ts + gap`` (the window Spark reports is
  [first_ts, last_ts + gap)).

Scale: one shuffle on the session keys; per-key session assembly is
streaming-friendly state (Spark merges windows incrementally).  Skewed
keys (one user with millions of events) are bounded by the gap — a key's
state is proportional to its OPEN sessions, not its history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Collapse events into sessions per key with the given inactivity
    gap.  Returns one row per session: key columns, ``session_start`` /
    ``session_end`` (epoch ms), ``n_events``, plus any extra ``aggs``
    (name → aggregate Column over the session's events)."""
    extra = aggs or {}
    # a TIMESTAMP column passes through bare: wrapping it in a (no-op)
    # cast would hide the watermark attribute from streaming aggregation
    # validation and break append mode.  NTZ/long/etc still cast.
    from pyspark.sql.types import TimestampType

    ts = F.col(ts_col)
    if not isinstance(df.schema[ts_col].dataType, TimestampType):
        ts = ts.cast("timestamp")
    out = (
        df.groupBy(F.session_window(ts, gap), *key_cols)
        .agg(F.count("*").alias("n_events"), *[c.alias(n) for n, c in extra.items()])
    )
    return out.select(
        *key_cols,
        F.unix_millis(F.col("session_window.start")).alias("session_start"),
        F.unix_millis(F.col("session_window.end")).alias("session_end"),
        "n_events",
        *extra.keys(),
    )
