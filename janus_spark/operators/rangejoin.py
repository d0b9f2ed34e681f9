"""Interval (range) join: match point rows to interval rows when
``start <= ts <= end`` per key — sensor readings → maintenance windows,
events → incidents, trades → halts.  The reference has no such operator
(SURVEY §2.6: "No as-of/interval/theta joins"); Spark's naive form
(an inequality join condition) falls back to BroadcastNestedLoopJoin /
CartesianProduct, which is O(|points| x |intervals|) and unusable at
100 TB.

Implementation: **bucketed equi-join**.  Time is split into fixed-width
buckets; each point hashes to exactly one bucket, each interval is
exploded to the buckets it overlaps (``sequence(floor(start/w),
floor(end/w))`` — an interval of length L costs ceil(L/w)+1 rows), and
the join becomes a plain hash equi-join on (key..., bucket) followed by
the exact BETWEEN refinement.  Because a point lives in exactly one
bucket, each qualifying (point, interval) pair is produced exactly once
— no post-join dedup.

Scale properties:
- One hash shuffle per side on (key, bucket) — the same cost as any
  equi-join; never a nested-loop candidate space.
- ``bucket_ms`` should be near the typical interval length: too small
  inflates the interval side (L/w copies), too large inflates the
  refinement fan-in (many non-overlapping candidates per bucket).  With
  w = median(L) the expected explode factor is ~2.
- Hot keys behave like any skewed equi-join (AQE skew split applies);
  the bucket component of the join key additionally spreads a hot key's
  candidates over time.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: Sequence[str] = (),
    bucket_ms: int = 3_600_000,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row (same ``by`` key) whose
    ``[start_col, end_col]`` range contains ``ts_col`` (inclusive both
    ends).  Returns all point columns plus all interval columns.

    ``how='inner'`` keeps only matched pairs; ``how='left'`` keeps
    unmatched points with null interval columns (implemented as an
    equi-join on the bucket plus post-filter, so the null-extension is
    still shuffle-only).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    b = F.lit(int(bucket_ms))
    pt = points.withColumn("__bucket", F.floor(F.col(ts_col) / b))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / b), F.floor(F.col(end_col) / b)
            )
        ),
    )
    keys = [*by, "__bucket"]
    within = F.col(ts_col).between(F.col(start_col), F.col(end_col))
    if how == "inner":
        return pt.join(iv, keys, "inner").where(within).drop("__bucket")
    # left: only matched rows carry interval columns; a point with no
    # containing interval survives exactly once with nulls.  Done as
    # inner-match + anti-complement union so the refinement predicate
    # never has to run inside an outer join's null semantics.
    matched = pt.join(iv, keys, "inner").where(within)
    iv_cols = [c for c in iv.columns if c not in keys]
    unmatched = pt.join(
        matched.select(*pt.columns).distinct(), pt.columns, "left_anti"
    ).select("*", *[F.lit(None).alias(c) for c in iv_cols])
    return matched.drop("__bucket").unionByName(unmatched.drop("__bucket"))
