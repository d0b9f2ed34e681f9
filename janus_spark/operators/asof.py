"""As-of (point-in-time) join: attach to each left row the most recent
right row at-or-before its timestamp, per key — the canonical timeseries
enrichment (trades→quotes, events→latest-checkpoint) that Spark has no
native operator for.

Implementation is a single-shuffle union + window scan, NOT a range
join: both sides are tagged and unioned, then one window pass per key in
(ts, side) order carries the last-seen right values forward onto left
rows.  At 100 TB this costs exactly one shuffle on the key (the same one
any per-key operator pays) and never builds the |left|×|right| candidate
space a range join would.  Equal timestamps match (right sorts before
left at the same ts), mirroring DuckDB/pandas ASOF semantics — pinned by
the q_asof_join oracle, which uses DuckDB's native ASOF LEFT JOIN.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: Sequence[str] = ("user_id",),
    value_cols: Sequence[str] = ("value",),
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of-backward join.  Returns all left columns plus
    ``<value_col><suffix>`` for each requested right column (null when no
    right row at-or-before exists for the key).  A right row whose value
    is null is treated as no observation (carried past, not matched)."""
    out_cols = [f"{c}{suffix}" for c in value_cols]
    rt = right.select(
        *by, ts_col, *[F.col(c).alias(o) for c, o in zip(value_cols, out_cols)]
    ).withColumn("__is_left", F.lit(0))
    lt = left.withColumn("__is_left", F.lit(1))
    both = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for o in out_cols:
        both = both.withColumn(o, F.last(o, ignorenulls=True).over(w))
    return both.where(F.col("__is_left") == 1).drop("__is_left")
