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
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join.  Returns all left columns plus
    ``<value_col><suffix>`` for each requested right column (null when no
    matching right row exists for the key).  A right row whose value
    is null is treated as no observation (carried past, not matched).

    ``direction``:
      * ``"backward"`` (default) — most recent right row at-or-before.
      * ``"forward"`` — first right row at-or-after.
      * ``"nearest"`` — the closer of the two by |Δts|, ties → backward.

    All three are the same ONE-shuffle union+window plan (forward adds a
    mirrored window over the same sort — Catalyst reuses the exchange
    and sort, still a single shuffle); equal timestamps match in every
    direction (right sorts inside the frame at the same instant).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    out_cols = [f"{c}{suffix}" for c in value_cols]
    rt = right.select(
        *by,
        ts_col,
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_cols)],
    ).withColumn("__is_left", F.lit(0))
    lt = left.withColumn("__is_left", F.lit(1))
    both = lt.unionByName(rt, allowMissingColumns=True)
    order = [F.col(ts_col).asc(), F.col("__is_left").asc()]
    back = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward must see right rows AT the same instant, which sort before
    # the left row — a RANGE frame on ts defines "at-or-after" by value,
    # not row position
    fwd = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).cast("long"))
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    )
    rts = F.when(F.col("__is_left") == 0, F.col(ts_col))
    if direction in ("backward", "nearest"):
        both = both.withColumn("__bts", F.last(rts, ignorenulls=True).over(back))
        for o in out_cols:
            both = both.withColumn(f"__b_{o}", F.last(o, ignorenulls=True).over(back))
    if direction in ("forward", "nearest"):
        both = both.withColumn("__fts", F.first(rts, ignorenulls=True).over(fwd))
        for o in out_cols:
            both = both.withColumn(f"__f_{o}", F.first(o, ignorenulls=True).over(fwd))
    if direction == "backward":
        picks = {o: F.col(f"__b_{o}") for o in out_cols}
    elif direction == "forward":
        picks = {o: F.col(f"__f_{o}") for o in out_cols}
    else:
        d_b = F.col(ts_col) - F.col("__bts")
        d_f = F.col("__fts") - F.col(ts_col)
        use_b = F.col("__fts").isNull() | (F.col("__bts").isNotNull() & (d_b <= d_f))
        picks = {o: F.when(use_b, F.col(f"__b_{o}")).otherwise(F.col(f"__f_{o}")) for o in out_cols}
    out = both.where(F.col("__is_left") == 1)
    for o, c in picks.items():
        out = out.withColumn(o, c)
    helper = ["__is_left", "__bts", "__fts"]
    helper += [f"__b_{o}" for o in out_cols] + [f"__f_{o}" for o in out_cols]
    return out.drop(*[c for c in helper if c in out.columns])
