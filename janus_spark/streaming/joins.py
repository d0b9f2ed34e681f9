"""Stream-stream event-time interval join.

The reference joins live windows only via its S2R window operators
(src/stream/live_stream_processing.rs); Structured Streaming can join two
unbounded streams directly when the join predicate bounds how far the
event times may drift apart — the classic attribution shape (purchase
within N seconds of a click).  The time-range condition is what makes
the join *feasible*: it lets Spark evict buffered rows once the
watermark passes ``upper``, so state is O(rate × interval), not O(stream).

Scale: the join is an equi-join on the key columns with the range
condition applied inside each key bucket — one shuffle per side keyed on
the join key, state-store lookups per micro-batch, no cross product.
Inner joins emit eagerly on match; only outer joins wait for the
watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_ms: int,
    upper_ms: int,
    watermark: str = "2 seconds",
) -> DataFrame:
    """Join two streaming DataFrames on ``on`` where
    ``left_ts + lower_ms <= right_ts <= left_ts + upper_ms`` (event-time
    columns are TimestampType).  Both sides get the same watermark; the
    range condition gives Spark the state-eviction bound."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = None
    for c in on:
        eq = l[c] == r[c]
        cond = eq if cond is None else (cond & eq)
    lo = l[left_ts] + F.expr(f"INTERVAL {lower_ms} MILLISECONDS")
    hi = l[left_ts] + F.expr(f"INTERVAL {upper_ms} MILLISECONDS")
    cond = cond & (r[right_ts] >= lo) & (r[right_ts] <= hi)
    joined = l.join(r, cond, "inner")
    # drop the duplicate key columns from the right side
    for c in on:
        joined = joined.drop(r[c])
    return joined
