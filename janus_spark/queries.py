"""Driver-contract query set: every implemented operator from SURVEY §2
gets a ``queries()`` entry (Spark, through the engine) and an
``oracle_sql()`` entry (equivalent ANSI SQL for DuckDB over the original
parquet tables).

Design note: engine queries run over MELTED quads (FIXTURES.md §3-4) so
they exercise the real SPARQL→DataFrame path; the oracle runs relational
SQL over the same source tables.  Final numeric outputs are cast to
DOUBLE on both sides so the string round-trip through the quad lexical
form cancels out (string formatting never reaches the compare).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from janus_spark.compiler import compile_sparql, parse_sparql
from janus_spark.engine import JanusEngine
from janus_spark.operators.comparator import window_stats
from janus_spark.operators.historical import sliding_window_bounds
from janus_spark.sources.melt import melt_events, melt_table, read_events


def _events_quads(spark: SparkSession, sf_dir: str) -> DataFrame:
    return melt_events(read_events(spark, sf_dir))


def _table_quads(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return melt_table(spark.read.parquet(f"{sf_dir}/{table}.parquet"), table)


def _run(quads: DataFrame, text: str) -> DataFrame:
    return compile_sparql(parse_sparql(text), quads)


# --------------------------------------------------------------- queries
def q_bgp_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: single triple-pattern scan with constant predicate."""
    q = """SELECT ?event (?v + 0 AS ?value) WHERE {
             ?event <urn:col:value> ?v . }"""
    return _run(_events_quads(spark, sf_dir), q).select(
        "event", F.col("value").cast("double").alias("value")
    )


def q_bgp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: BGP join on shared subject + numeric FILTER (Q4)."""
    q = """SELECT ?event ?type (?v + 0 AS ?value) WHERE {
             ?event <urn:col:event_type> ?type .
             ?event <urn:col:value> ?v .
             FILTER(?v > 90) }"""
    return _run(_events_quads(spark, sf_dir), q).select(
        "event", "type", F.col("value").cast("double").alias("value")
    )


def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: GROUP BY + COUNT/AVG/MIN/MAX aggregates."""
    q = """SELECT ?type (COUNT(?e) AS ?n) (AVG(?v) AS ?avg_value)
                  (MIN(?v + 0) AS ?min_value) (MAX(?v + 0) AS ?max_value)
           WHERE { ?e <urn:col:event_type> ?type .
                   ?e <urn:col:value> ?v . }
           GROUP BY ?type"""
    df = _run(_events_quads(spark, sf_dir), q)
    return df.select(
        "type",
        F.col("n").cast("long").alias("n"),
        F.col("avg_value").cast("double").alias("avg_value"),
        F.col("min_value").cast("double").alias("min_value"),
        F.col("max_value").cast("double").alias("max_value"),
    )


def q_join_bind_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2+Q11: cross-table join via BIND(CONCAT(...)) — orders→customer."""
    quads = _table_quads(spark, sf_dir, "orders").unionByName(
        _table_quads(spark, sf_dir, "customer")
    )
    q = """SELECT ?name (COUNT(?o) AS ?order_count) (SUM(?p) AS ?total)
           WHERE {
             ?o <urn:orders:o_custkey> ?ck .
             ?o <urn:orders:o_totalprice> ?p .
             BIND(CONCAT("urn:customer:", ?ck) AS ?c)
             ?c <urn:customer:c_name> ?name .
           } GROUP BY ?name"""
    df = _run(quads, q)
    return df.select(
        "name",
        F.col("order_count").cast("long").alias("order_count"),
        F.col("total").cast("double").alias("total"),
    )


def q_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 OPTIONAL: customers with their (optional) nation name melted in."""
    quads = _table_quads(spark, sf_dir, "customer").unionByName(
        _table_quads(spark, sf_dir, "nation")
    )
    q = """SELECT ?c ?name ?nname WHERE {
             ?c <urn:customer:c_name> ?name .
             ?c <urn:customer:c_nationkey> ?nk .
             BIND(CONCAT("urn:nation:", ?nk) AS ?n)
             OPTIONAL { ?n <urn:nation:n_name> ?nname . }
           }"""
    return _run(quads, q)


def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9/Q12 UNION of two pattern branches."""
    q = """SELECT ?e ?what WHERE {
             { ?e <urn:col:event_type> ?what . FILTER(?what = "click") }
             UNION
             { ?e <urn:col:event_type> ?what . FILTER(?what = "purchase") }
           }"""
    return _run(_events_quads(spark, sf_dir), q)


def q_minus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 MINUS: events that never have type 'click'."""
    q = """SELECT DISTINCT ?e WHERE {
             ?e <urn:col:user_id> ?u .
             MINUS { ?e <urn:col:event_type> "click" . }
           }"""
    return _run(_events_quads(spark, sf_dir), q)


def q_distinct_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: DISTINCT + ORDER BY + LIMIT (top-k)."""
    q = """SELECT DISTINCT ?type WHERE { ?e <urn:col:event_type> ?type . }
           ORDER BY ?type LIMIT 3"""
    return _run(_events_quads(spark, sf_dir), q)


def q_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 VALUES: inline data constrains a pattern variable."""
    q = """SELECT ?e ?type WHERE {
             ?e <urn:col:event_type> ?type .
             VALUES ?type { "signup" "view" }
           }"""
    return _run(_events_quads(spark, sf_dir), q)


def q_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 GRAPH pattern selects one table's quads from a union."""
    quads = _table_quads(spark, sf_dir, "region").unionByName(
        _table_quads(spark, sf_dir, "nation")
    )
    q = """SELECT ?s ?o WHERE {
             GRAPH <urn:table:region> { ?s <urn:region:r_name> ?o . }
           }"""
    return _run(quads, q)


def q_expr_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 expression projection + builtins (STRLEN/UCASE/IF)."""
    q = """SELECT ?e (STRLEN(?t) AS ?type_len) (UCASE(?t) AS ?type_uc)
                  (IF(?v > 50, "hi", "lo") AS ?bucket)
           WHERE { ?e <urn:col:event_type> ?t .
                   ?e <urn:col:value> ?v . }"""
    df = _run(_events_quads(spark, sf_dir), q)
    return df.select("e", F.col("type_len").cast("long").alias("type_len"), "type_uc", "bucket")


def q_ext_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 is_outlier + F3 zscore extension functions in FILTER/projection."""
    q = """PREFIX janus: <https://janus.rs/fn#>
           SELECT ?e (janus:zscore(?v, 50, 25) AS ?z) WHERE {
             ?e <urn:col:value> ?v .
             FILTER(janus:is_outlier(?v, 50, 25, 1.5))
           }"""
    return _run(_events_quads(spark, sf_dir), q)


def q_ext_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F4/F6 rule functions as projected expressions."""
    q = """PREFIX janus: <https://janus.rs/fn#>
           SELECT ?e (janus:abs_diff(?v, 50) AS ?ad)
                  (janus:relative_change(?v, 50) AS ?rc)
                  (janus:absolute_threshold_exceeded(?v, 50, 30) AS ?abs_exc)
                  (janus:catch_up(50, ?v, 10) AS ?cu)
           WHERE { ?e <urn:col:value> ?v . }"""
    return _run(_events_quads(spark, sf_dir), q)


def q_hist_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 historical fixed window through the full Janus-QL path."""
    quads = _events_quads(spark, sf_dir)
    lo, hi = _events_ts_bounds(spark, sf_dir)
    mid = lo + (hi - lo) // 2
    text = f"""
    REGISTER RStream <out> AS
    SELECT ?e ?v
    FROM NAMED WINDOW <urn:w:hist> ON LOG <urn:stream:events> [START {lo} END {mid}]
    WHERE {{ WINDOW <urn:w:hist> {{ ?e <urn:col:value> ?v . }} }}
    """
    eng = JanusEngine(spark, quads)
    qid = eng.register_query(text, query_id="q_hist_fixed")
    res = eng.start_historical(qid)["urn:w:hist"]
    return res.select("e", F.col("v").cast("double").alias("v"))


def q_hist_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 historical sliding window (fixed injected 'now'), one plan."""
    quads = _events_quads(spark, sf_dir)
    lo, hi = _events_ts_bounds(spark, sf_dir)
    offset = hi - lo
    rng = max((hi - lo) // 4, 1)
    step = max((hi - lo) // 8, 1)
    text = f"""
    REGISTER RStream <out> AS
    SELECT (COUNT(?e) AS ?n) (AVG(?v) AS ?avg_v)
    FROM NAMED WINDOW <urn:w:h> ON LOG <urn:stream:events> [OFFSET {offset} RANGE {rng} STEP {step}]
    WHERE {{ WINDOW <urn:w:h> {{ ?e <urn:col:value> ?v . }} }}
    """
    eng = JanusEngine(spark, quads)
    qid = eng.register_query(text, query_id="q_hist_sliding")
    res = eng.start_historical(qid, now=hi)["urn:w:h"]
    return res.select(
        "window_start",
        "window_end",
        F.col("n").cast("long").alias("n"),
        F.col("avg_v").cast("double").alias("avg_v"),
    )


def q_comparator_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9 rolling WindowStats per user over the events stream."""
    ev = read_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("tsm"),
        "value",
    )
    # rebase the regression x to seconds since the global min timestamp:
    # raw epoch-ms x-values (~1.7e12) make the slope numerically tiny and
    # its low bits engine-dependent; the rebase keeps it well-conditioned
    min_ts = ev.agg(F.min("tsm")).collect()[0][0]
    ev = ev.withColumn("x", (F.col("tsm") - F.lit(min_ts)) / F.lit(1000.0))
    out = window_stats(ev, "value", "x", key_cols=["user_id"], window_size=10, order_cols=["tsm", "event_id"])
    return out.select(
        "user_id",
        "event_id",
        F.round(F.col("mean"), 6).alias("mean"),
        F.round(F.col("std_dev"), 6).alias("std_dev"),
        F.round(F.col("slope"), 9).alias("slope"),
        F.col("count").cast("long").alias("count"),
    )


def q_baseline_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 baseline bootstrap (AGGREGATE) through the hybrid engine path."""
    quads = _events_quads(spark, sf_dir)
    lo, hi = _events_ts_bounds(spark, sf_dir)
    text = f"""
    REGISTER RStream <out> AS
    SELECT ?sensor ?v
    FROM NAMED WINDOW <urn:w:live> ON STREAM <urn:stream:events> [RANGE 1000 STEP 1000]
    FROM NAMED WINDOW <urn:w:hist> ON LOG <urn:stream:events> [START {lo} END {hi}]
    USING BASELINE <urn:w:hist> AGGREGATE
    WHERE {{
      WINDOW <urn:w:live> {{ ?sensor <urn:col:value> ?vl . }}
      WINDOW <urn:w:hist> {{ ?sensor <urn:col:value> ?v . }}
    }}
    """
    eng = JanusEngine(spark, quads)
    qid = eng.register_query(text, query_id="q_baseline_aggregate")
    static = eng.warm_baseline(qid)
    # baseline quads: subject anchor, predicate baseline#v, object mean value
    return static.select(
        F.col("subject").alias("anchor"),
        F.col("predicate").alias("var_iri"),
        F.col("object").try_cast("double").alias("value"),
    )


def _events_ts_bounds(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    r = (
        read_events(spark, sf_dir)
        .agg(
            F.unix_millis(F.min("ts").cast("timestamp")).alias("lo"),
            F.unix_millis(F.max("ts").cast("timestamp")).alias("hi"),
        )
        .collect()[0]
    )
    return r["lo"], r["hi"]


# ---------------------------------------------------------------- oracle
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_bgp_scan": q_bgp_scan,
    "q_bgp_join": q_bgp_join,
    "q_agg_group": q_agg_group,
    "q_join_bind_concat": q_join_bind_concat,
    "q_optional": q_optional,
    "q_union": q_union,
    "q_minus": q_minus,
    "q_distinct_order_limit": q_distinct_order_limit,
    "q_values": q_values,
    "q_graph": q_graph,
    "q_expr_functions": q_expr_functions,
    "q_ext_outlier": q_ext_outlier,
    "q_ext_rules": q_ext_rules,
    "q_hist_fixed": q_hist_fixed,
    "q_hist_sliding": q_hist_sliding,
    "q_comparator_stats": q_comparator_stats,
    "q_baseline_aggregate": q_baseline_aggregate,
}

_EV = "'urn:event:' || CAST(event_id AS VARCHAR)"
_TSM = "(epoch_ns(ts) // 1000000)"

ORACLES: dict[str, str] = {
    "q_bgp_scan": f"SELECT {_EV} AS event, value FROM events",
    "q_bgp_join": f"""SELECT {_EV} AS event, event_type AS type, value
                      FROM events WHERE value > 90""",
    "q_agg_group": """SELECT event_type AS type, COUNT(*) AS n, AVG(value) AS avg_value,
                             MIN(value) AS min_value, MAX(value) AS max_value
                      FROM events GROUP BY event_type""",
    "q_join_bind_concat": """SELECT c.c_name AS name, COUNT(*) AS order_count,
                                    SUM(o.o_totalprice) AS total
                             FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                             GROUP BY c.c_name""",
    "q_optional": """SELECT 'urn:customer:' || CAST(c.c_custkey AS VARCHAR) AS c,
                            c.c_name AS name, n.n_name AS nname
                     FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey""",
    "q_union": f"""SELECT {_EV} AS e, event_type AS what FROM events WHERE event_type = 'click'
                   UNION ALL
                   SELECT {_EV} AS e, event_type AS what FROM events WHERE event_type = 'purchase'""",
    "q_minus": f"""SELECT DISTINCT {_EV} AS e FROM events
                   WHERE event_id NOT IN (SELECT event_id FROM events WHERE event_type = 'click')""",
    "q_distinct_order_limit": "SELECT DISTINCT event_type AS type FROM events ORDER BY type LIMIT 3",
    "q_values": f"""SELECT {_EV} AS e, event_type AS type FROM events
                    WHERE event_type IN ('signup', 'view')""",
    "q_graph": """SELECT 'urn:region:' || CAST(r_regionkey AS VARCHAR) AS s, r_name AS o
                  FROM region""",
    "q_expr_functions": f"""SELECT {_EV} AS e, LENGTH(event_type) AS type_len,
                                   UPPER(event_type) AS type_uc,
                                   CASE WHEN value > 50 THEN 'hi' ELSE 'lo' END AS bucket
                            FROM events""",
    "q_ext_outlier": f"""SELECT {_EV} AS e, (value - 50) / 25 AS z FROM events
                         WHERE ABS((value - 50) / 25) > 1.5""",
    "q_ext_rules": f"""SELECT {_EV} AS e, ABS(value - 50) AS ad, (value - 50) / 50 AS rc,
                              ABS(value - 50) > 30 AS abs_exc, (50 - value) > 10 AS cu
                       FROM events""",
    "q_comparator_stats": f"""
        WITH e AS (
          SELECT user_id, event_id, {_TSM} AS tsm, value FROM events
        ), m AS (SELECT MIN(tsm) AS mn FROM e)
        SELECT user_id, event_id,
               ROUND(AVG(value) OVER w, 6) AS mean,
               ROUND(COALESCE(STDDEV_POP(value) OVER w, 0.0), 6) AS std_dev,
               ROUND(COALESCE(REGR_SLOPE(value, (tsm - mn) / 1000.0) OVER w, 0.0), 9) AS slope,
               COUNT(value) OVER w AS count
        FROM e, m
        WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id
                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)""",
    "q_baseline_aggregate": """
        SELECT 'urn:event:' || CAST(event_id AS VARCHAR) AS anchor,
               'https://janus.rs/baseline#v' AS var_iri,
               value AS value
        FROM events""",
}


def oracle_for_hist_fixed(sf_dir: str) -> str:
    import duckdb

    lo, hi = duckdb.sql(
        f"SELECT epoch_ns(MIN(ts)) // 1000000, epoch_ns(MAX(ts)) // 1000000 "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()
    mid = lo + (hi - lo) // 2
    return f"""SELECT {_EV} AS e, value AS v FROM events
               WHERE {_TSM} BETWEEN {lo} AND {mid}"""


def oracle_for_hist_sliding(sf_dir: str) -> str:
    import duckdb

    lo, hi = duckdb.sql(
        f"SELECT epoch_ns(MIN(ts)) // 1000000, epoch_ns(MAX(ts)) // 1000000 "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()
    offset = hi - lo
    rng = max((hi - lo) // 4, 1)
    step = max((hi - lo) // 8, 1)
    bounds = sliding_window_bounds(hi, offset, rng, step)
    values = ", ".join(f"({s}, {e})" for _, s, e in bounds)
    return f"""
        WITH w(window_start, window_end) AS (VALUES {values})
        SELECT w.window_start, w.window_end, COUNT(*) AS n, AVG(e.value) AS avg_v
        FROM w JOIN events e ON {_TSM.replace('ts', 'e.ts')} BETWEEN w.window_start AND w.window_end
        GROUP BY w.window_start, w.window_end"""
