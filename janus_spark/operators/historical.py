"""Historical window executors — operators W1 (fixed) and W2 (sliding).

Reference behavior:

- W1 fixed (`src/execution/historical_executor.rs:75-96`): one storage
  query over [start, end] INCLUSIVE, one evaluation, one batch with
  ``timestamp = end``.
- W2 sliding (`historical_executor.rs:120-147,424-460`): anchored at
  wall-clock "now"; hop ``cur`` from ``now - offset`` in steps of
  ``step``; each window is ``[cur, min(cur + range, now)]`` inclusive;
  one evaluation per hop; iteration ends when ``cur > now``.

Spark-first design: instead of the reference's per-window loop (one
evaluation per hop), events are assigned to every window they fall in via
a broadcast range-join against the tiny window-bounds table, and the
compiled plan runs ONCE over all windows with ``__window_id`` threaded as
an implicit key (see compiler.compile partition_cols).  At 100 TB this is
one shuffle instead of N sequential jobs; windows with zero matching
events simply produce no rows, matching the reference (empty windows emit
empty batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from janus_spark.compiler.ast import SelectQuery
from janus_spark.compiler.compile import compile_sparql

WINDOW_ID = "__window_id"
WINDOW_START = "window_start"
WINDOW_END = "window_end"


def run_historical_fixed(
    query: SelectQuery,
    quads: DataFrame,
    start_ts: int,
    end_ts: int,
    registry: dict | None = None,
    static_quads: DataFrame | None = None,
    property_tables: dict | None = None,
) -> DataFrame:
    """W1: evaluate over quads with ts in [start, end] inclusive.

    ``property_tables`` (star-join elimination) are re-derived with the
    same ts slice so the wide scans see exactly the window's quads."""
    window = quads.where(F.col("ts").between(F.lit(start_ts), F.lit(end_ts)))
    pts = None
    if property_tables:
        sliced = {id(pt): pt.time_filtered(start_ts, end_ts) for pt in set(property_tables.values())}
        pts = {pred: sliced[id(pt)] for pred, pt in property_tables.items()}
    return compile_sparql(
        query, window, registry=registry, static_quads=static_quads, property_tables=pts
    )


def sliding_window_bounds(now: int, offset_ms: int, range_ms: int, step_ms: int) -> list[tuple[int, int, int]]:
    """(window_id, start, end) hops, replicating the reference's iteration
    exactly (historical_executor.rs:424-460): cur from now-offset while
    cur <= now; end clamped to now; bounds inclusive."""
    out = []
    cur = now - offset_ms
    wid = 0
    while cur <= now:
        out.append((wid, cur, min(cur + range_ms, now)))
        wid += 1
        cur += step_ms
    return out


def assign_sliding_windows(quads: DataFrame, bounds: list[tuple[int, int, int]]) -> DataFrame:
    """Tag each quad with every window it belongs to via a broadcast
    range-join (window table is tiny — tens of rows)."""
    spark = quads.sparkSession
    bdf = spark.createDataFrame(bounds, schema=f"{WINDOW_ID} long, {WINDOW_START} long, {WINDOW_END} long")
    lo = min(b[1] for b in bounds)
    hi = max(b[2] for b in bounds)
    pruned = quads.where(F.col("ts").between(F.lit(lo), F.lit(hi)))
    return pruned.join(
        F.broadcast(bdf),
        on=(F.col("ts") >= F.col(WINDOW_START)) & (F.col("ts") <= F.col(WINDOW_END)),
        how="inner",
    )


def assign_sliding_windows_regular(
    quads: DataFrame, now: int, offset_ms: int, range_ms: int, step_ms: int
) -> DataFrame:
    """Arithmetic window-id assignment for regular hops — NO join at all.

    A quad at ts belongs to window k iff
    ``base + k*step <= ts <= base + k*step + range`` with
    ``base = now - offset``; the valid k interval is computed per row and
    exploded map-side.  At 100 TB this replaces a broadcast nested-loop
    range join with a pure narrow transformation.
    """
    return tag_window_ids(quads, F.col("ts"), now, offset_ms, range_ms, step_ms)


def tag_window_ids(
    df: DataFrame, ts_col, now: int, offset_ms: int, range_ms: int, step_ms: int
) -> DataFrame:
    """Explode rows into the sliding windows containing ``ts_col`` —
    map-side arithmetic, no join (see assign_sliding_windows_regular)."""
    base = now - offset_ms
    k_max = offset_ms // step_ms
    pruned = df.where(ts_col.between(F.lit(base), F.lit(now)))
    k_hi = F.floor((ts_col - F.lit(base)) / F.lit(step_ms)).cast("long")
    k_lo = F.ceil((ts_col - F.lit(base) - F.lit(range_ms)) / F.lit(step_ms)).cast("long")
    seq = F.sequence(F.greatest(k_lo, F.lit(0)), F.least(k_hi, F.lit(k_max)))
    return pruned.withColumn(WINDOW_ID, F.explode(seq))


def run_historical_sliding(
    query: SelectQuery,
    quads: DataFrame,
    now: int,
    offset_ms: int,
    range_ms: int,
    step_ms: int,
    registry: dict | None = None,
    static_quads: DataFrame | None = None,
    property_tables: dict | None = None,
) -> DataFrame:
    """W2 as ONE distributed plan over all hops.

    Result carries ``window_start``/``window_end`` columns (the reference
    emits one batch per hop with timestamp = window end; here the window id
    is data, which is the Spark-native shape).

    ``property_tables`` get the same window-id explode applied to their
    rows, so star-join elimination works across all hops at once (the
    star scan carries ``__window_id`` like any tagged quad).
    """
    bounds = sliding_window_bounds(now, offset_ms, range_ms, step_ms)
    tagged = assign_sliding_windows_regular(quads, now, offset_ms, range_ms, step_ms)
    pts = None
    if property_tables:
        from janus_spark.sources.melt import PropertyTable

        tagged_pts = {
            id(pt): PropertyTable(
                pt.name,
                tag_window_ids(pt.df, pt.ts, now, offset_ms, range_ms, step_ms),
                pt.subject,
                pt.values,
                pt.ts,
            )
            for pt in set(property_tables.values())
            if pt.ts is not None
        }
        pts = {
            pred: tagged_pts[id(pt)]
            for pred, pt in property_tables.items()
            if id(pt) in tagged_pts
        }
    result = compile_sparql(
        query,
        tagged,
        property_tables=pts,
        partition_cols=[WINDOW_ID],
        registry=registry,
        static_quads=static_quads,
    )
    spark = quads.sparkSession
    bdf = spark.createDataFrame(bounds, schema=f"{WINDOW_ID} long, {WINDOW_START} long, {WINDOW_END} long")
    return result.join(F.broadcast(bdf), on=WINDOW_ID, how="inner").drop(WINDOW_ID)


def tag_results(df: DataFrame, query_id: str, source: str, timestamp: int | None = None) -> DataFrame:
    """Result metadata shape (C5/S10): query_id, timestamp, source columns
    (reference QueryResult, src/api/janus_api.rs:33-47)."""
    out = df.withColumn("query_id", F.lit(query_id)).withColumn("source", F.lit(source))
    if timestamp is not None:
        out = out.withColumn("timestamp", F.lit(timestamp))
    elif WINDOW_END in df.columns:
        out = out.withColumn("timestamp", F.col(WINDOW_END))
    return out
