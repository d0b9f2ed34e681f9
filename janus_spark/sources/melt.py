"""Relational → RDF quad melt.

The reference consumes RDF quads; the driver's testdata is relational
(TPC-H-ish).  FIXTURES.md §3-4 defines the deterministic melt: each row of
table ``T`` with key ``k`` becomes one quad per non-key column::

    (<urn:T:k> <urn:T:col> str(value) <urn:table:T>)   ts = k*1000

and for ``events``: subject ``urn:event:{id}``, predicates
``urn:col:{name}``, ts = epoch-millis of the event timestamp, graph
``urn:stream:events``.

Implementation note (scale): the melt is a single projection + ``stack``
(no shuffle, no UDF); at 100 TB it is a map-only job that Parquet scan
pipelining handles row-group by row-group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": None,  # composite; handled specially
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in (names or TABLE_NAMES)}


def ensure_utc(spark: SparkSession) -> None:
    """Pin the session timezone: NTZ→timestamp casts in the melt must be
    deterministic regardless of the caller's session configuration (the
    driver's correctness session is not ours)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table, tolerating parquet TIMESTAMP(NANOS) columns
    (Spark 4 rejects them unless nanosAsLong is set; the long nanos are
    then converted to a microsecond timestamp, ms-exact)."""
    ensure_utc(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def _value_str(df: DataFrame, col: str) -> F.Column:
    """Deterministic lexical form for a melted value.

    Timestamps melt to epoch millis (the engine's ts unit); everything else
    via CAST AS STRING.  Keep lexical forms oracle-reproducible: integral
    types print as integers, doubles in Spark's shortest form.
    """
    dt = dict(df.dtypes)[col]
    c = F.col(col)
    if dt.startswith("timestamp"):
        # parquet may load as TIMESTAMP_NTZ; session tz is pinned UTC so
        # the cast to TIMESTAMP is deterministic
        return F.unix_millis(c.cast("timestamp")).cast("string")
    return c.cast("string")


def melt_table(
    df: DataFrame,
    table: str,
    key_col: str | None = None,
    value_cols: list[str] | None = None,
    ts_col: F.Column | None = None,
    fk: dict[str, str] | None = None,
) -> DataFrame:
    """Melt a relational table into the 5-column quads frame.

    ``fk``: foreign-key columns melted as IRI objects instead of literals
    — ``{"n_regionkey": "region"}`` emits
    ``(<urn:nation:k> <urn:nation:ref_region> <urn:region:rk>)``, giving
    the graph real node→node edges (property-path traversal needs IRI
    objects; plain literals don't link).
    """
    if key_col is None:
        key_col = TABLE_KEYS.get(table)
    if key_col is None:
        raise ValueError(f"melt_table needs key_col for {table}")
    if value_cols is None:
        value_cols = [c for c in df.columns if c != key_col]
    subject = F.concat(F.lit(f"urn:{table}:"), F.col(key_col).cast("string"))
    ts = ts_col if ts_col is not None else (F.col(key_col).cast("long") * F.lit(1000))
    # one UNION branch per melted column (NOT explode): Catalyst constant-
    # folds a pattern's predicate filter against each branch's literal,
    # prunes the non-matching branches entirely, and column-prunes each
    # surviving scan to (key, value) — a constant-predicate triple scan
    # reads exactly two parquet columns instead of exploding all of them
    parts = []
    for c in value_cols:
        parts.append(
            df.select(
                ts.alias("ts"),
                subject.alias("subject"),
                F.lit(f"urn:{table}:{c}").alias("predicate"),
                _value_str(df, c).alias("object"),
                F.lit(f"urn:table:{table}").alias("graph"),
            ).where(F.col("object").isNotNull())
        )
    for col, target in (fk or {}).items():
        parts.append(
            df.select(
                ts.alias("ts"),
                subject.alias("subject"),
                F.lit(f"urn:{table}:ref_{target}").alias("predicate"),
                F.concat(F.lit(f"urn:{target}:"), F.col(col).cast("string")).alias("object"),
                F.lit(f"urn:table:{table}").alias("graph"),
            ).where(F.col(col).isNotNull())
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def melt_events(df: DataFrame) -> DataFrame:
    """Melt the driver's ``events`` stream table (FIXTURES.md §3).

    Union-of-projections form (see melt_table): pattern scans with a
    constant predicate collapse to a single pruned parquet scan.
    """
    value_cols = [c for c in df.columns if c not in ("event_id", "ts")]
    parts = []
    for c in value_cols:
        parts.append(
            df.select(
                F.unix_millis(F.col("ts").cast("timestamp")).alias("ts"),
                F.concat(F.lit("urn:event:"), F.col("event_id").cast("string")).alias("subject"),
                F.lit(f"urn:col:{c}").alias("predicate"),
                _value_str(df, c).alias("object"),
                F.lit("urn:stream:events").alias("graph"),
            ).where(F.col("object").isNotNull())
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def melt_sensor_fixture(spark: SparkSession, n: int = 100) -> DataFrame:
    """Reference-shaped deterministic sensor fixture (FIXTURES.md §1):
    ts=i*100, subject=sensor{i%5}, predicate=temperature, object=20+(i%10).

    Mirrors tests/janus_api_integration_test.rs:38-47 (cited for parity,
    not copied).  Generated distributed via ``spark.range`` — no driver loop.
    """
    return spark.range(1, n + 1).select(
        (F.col("id") * 100).alias("ts"),
        F.concat(F.lit("http://example.org/sensor"), (F.col("id") % 5).cast("string")).alias("subject"),
        F.lit("http://example.org/temperature").alias("predicate"),
        (F.lit(20) + (F.col("id") % 10)).cast("string").alias("object"),
        F.lit("http://example.org/graph1").alias("graph"),
    )


# ------------------------------------------------------- property tables
class PropertyTable:
    """Wide-table view of a melted table, for star-join elimination.

    A BGP star — several constant-predicate patterns sharing one subject
    variable — over a melted table is semantically a single row of the
    original wide table, but compiles naively to an N-way self-join
    (N-1 shuffles of the full table).  The classic property-table rewrite
    (Wilkinson, "Jena property tables"; Abadi et al. VLDB'07 discuss the
    trade-off vs vertical partitioning) turns the star back into ONE
    column-pruned scan.  At 100 TB that removes the dominant shuffles
    from every analytics query over melted relational data.

    Validity requires each (subject, predicate) to hold at most one quad,
    which the melt guarantees when ``key_col`` is row-unique — the same
    precondition ``melt_table`` callers already maintain (surrogate ids
    for lineitem).  Value expressions reuse the melt's exact lexical
    forms, so a rewritten plan is value-identical to the self-join plan.
    """

    def __init__(self, name: str, df: DataFrame, subject, values: dict, ts=None):
        self.name = name
        self.df = df
        self.subject = subject  # Column: the melt's subject IRI
        self.values = values  # predicate IRI -> lexical value Column
        self.ts = ts  # Column: the melt's quad timestamp (ms), if any

    def time_filtered(self, start_ts: int, end_ts: int) -> "PropertyTable":
        """The same table restricted to quads with ts in [start, end]
        inclusive — matches run_historical_fixed's window slice, so the
        star rewrite stays valid inside fixed historical windows."""
        if self.ts is None:
            raise ValueError(f"property table {self.name} has no ts column")
        return PropertyTable(
            self.name,
            self.df.where(self.ts.between(F.lit(start_ts), F.lit(end_ts))),
            self.subject,
            self.values,
            self.ts,
        )


def property_table(
    df: DataFrame,
    table: str,
    key_col: str | None = None,
    value_cols: list[str] | None = None,
    fk: dict[str, str] | None = None,
    ts_col=None,
) -> PropertyTable:
    """Build the PropertyTable matching ``melt_table(df, table, ...)``
    (same subject synthesis, same lexical value forms)."""
    if key_col is None:
        key_col = TABLE_KEYS.get(table)
    if key_col is None:
        raise ValueError(f"property_table needs key_col for {table}")
    if value_cols is None:
        value_cols = [c for c in df.columns if c != key_col]
    subject = F.concat(F.lit(f"urn:{table}:"), F.col(key_col).cast("string"))
    values = {f"urn:{table}:{c}": _value_str(df, c) for c in value_cols}
    for col, target in (fk or {}).items():
        values[f"urn:{table}:ref_{target}"] = F.concat(
            F.lit(f"urn:{target}:"), F.col(col).cast("string")
        )
    ts = ts_col if ts_col is not None else F.col(key_col).cast("long") * F.lit(1000)
    return PropertyTable(table, df, subject, values, ts)


def events_property_table(df: DataFrame) -> PropertyTable:
    """PropertyTable matching ``melt_events`` (urn:col:* predicates)."""
    value_cols = [c for c in df.columns if c not in ("event_id", "ts")]
    subject = F.concat(F.lit("urn:event:"), F.col("event_id").cast("string"))
    values = {f"urn:col:{c}": _value_str(df, c) for c in value_cols}
    return PropertyTable(
        "events", df, subject, values, F.unix_millis(F.col("ts").cast("timestamp"))
    )


def property_registry(*tables: PropertyTable) -> dict:
    """predicate IRI -> PropertyTable map, for compile_sparql's
    ``property_tables`` argument."""
    reg: dict = {}
    for pt in tables:
        for pred in pt.values:
            reg[pred] = pt
    return reg
