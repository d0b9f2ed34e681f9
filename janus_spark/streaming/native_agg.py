"""Native window-aggregate fast path for live queries — the pure
Structured Streaming alternative to the foreachBatch runtime.

When a live query is aggregate-shaped — ONE live window, ONE triple
pattern, aggregates over its variables — the RStream evaluation is
exactly Spark's built-in event-time window aggregation:

    stream.withWatermark(ts).groupBy(window(ts, range, step), keys).agg(...)

This path gets incremental state, watermark-driven cleanup, and
exactly-once sinks from the engine itself (no driver-side window
bookkeeping, no full re-evaluation per close) — at 100 TB/day this is
the mode you want for metrics-style continuous queries.  Queries that
need joins, OPTIONAL, or multi-window merge stay on LiveQueryRunner
(which trades those capabilities for generality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from janus_spark.compiler.ast import ECall, EVar, Filter, Group, TriplePattern, Var
from janus_spark.compiler.expressions import compile_aggregate, compile_expr
from janus_spark.parsing.janusql import JanusQuery


def native_window_agg_stream(
    parsed: JanusQuery,
    stream_quads: DataFrame,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Compile an aggregate-shaped live query to a native streaming
    window aggregation.  Raises ValueError (with the reason) when the
    query's shape needs the general foreachBatch runtime instead."""
    if len(parsed.live_windows) != 1:
        raise ValueError("native agg path needs exactly one live window")
    w = parsed.live_windows[0]
    body = parsed.window_bodies[w.name]
    patterns = [el for el in body.elements if isinstance(el, TriplePattern)]
    filters = [el for el in body.elements if isinstance(el, Filter)]
    if len(patterns) != 1 or len(patterns) + len(filters) != len(body.elements):
        raise ValueError("native agg path needs a single triple pattern (+ filters)")
    if parsed.non_window is not None and parsed.non_window.elements:
        raise ValueError("non-window patterns need the foreachBatch runtime")
    if parsed.projection is None or not any(
        isinstance(e, ECall) and e.is_aggregate() for e, _ in parsed.projection
    ):
        raise ValueError("native agg path needs an aggregate projection")

    tp = patterns[0]
    df = stream_quads
    proj: dict[str, str] = {}
    for pos, term in (("subject", tp.s), ("predicate", tp.p), ("object", tp.o)):
        if isinstance(term, Var):
            proj[term.name] = pos
        else:
            df = df.where(F.col(pos) == term.value if hasattr(term, "value") else term.lexical)
    sel: list[Column] = [F.timestamp_millis(F.col("ts")).alias("__event_time")]
    sel += [F.col(src).alias(var) for var, src in proj.items()]
    df = df.select(*sel)
    for f in filters:
        df = df.where(compile_expr(f.expr, "bool"))

    group_vars = [e.name for e, _ in parsed.group_by if isinstance(e, EVar)]
    spark_window = F.window(
        F.col("__event_time"), f"{w.range_ms} milliseconds", f"{w.step_ms} milliseconds"
    )
    aggs = [
        compile_aggregate(e).alias(name)
        for e, name in parsed.projection
        if isinstance(e, ECall) and e.is_aggregate()
    ]
    out = (
        df.withWatermark("__event_time", watermark)
        .groupBy(spark_window.alias("window"), *[F.col(v) for v in group_vars])
        .agg(*aggs)
    )
    return out.select(
        F.unix_millis(F.col("window.start")).alias("window_start"),
        F.unix_millis(F.col("window.end")).alias("window_end"),
        *[F.col(v) for v in group_vars],
        *[F.col(name) for e, name in parsed.projection if isinstance(e, ECall) and e.is_aggregate()],
    )
