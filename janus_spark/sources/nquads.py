"""N-Quads / N-Triples line parsing and formatting — operator S1.

Reference semantics (``src/parsing/rdf_parser.rs:6-168``):

- optional leading integer token = event timestamp in ms (absent ⇒ ingest
  time);
- terms: ``<iri>``, ``"literal"``, ``"literal"^^<datatype>``,
  ``"literal"@lang``, or a bare token;
- datatype and language annotations are STRIPPED — only the lexical value
  is stored (rdf_parser.rs:130-161);
- optional 4th term = graph IRI; optional trailing ``.``.

Spark-first: the whole parse is a handful of regexp Column expressions on
``spark.read.text`` — JVM-side, whole-stage-codegen, no Python UDF.  At
100 TB this is a map-only scan job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# One RDF term: IRI | quoted literal (with optional ^^<dt> or @lang) | bare token.
_TERM = r'(?:<[^>]*>|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[A-Za-z0-9-]+)?|[^<"\s][^\s]*)'

# graph labels are IRIs or blank nodes in N-Quads — a bare-token graph
# would swallow the trailing "." terminator
_GRAPH_TERM = r"(?:<[^>]*>|_:[^\s]+)"

_LINE = (
    r"^\s*(?:(\d+)\s+)?"  # 1: optional timestamp
    rf"({_TERM})\s+"  # 2: subject
    rf"({_TERM})\s+"  # 3: predicate
    rf"({_TERM})"  # 4: object
    rf"(?:\s+({_GRAPH_TERM}))?"  # 5: optional graph
    r"\s*(?:\.\s*)?$"
)


def _clean_term(c: Column) -> Column:
    """IRI brackets off, literal quotes off, datatype/lang stripped,
    escape sequences for ``\\"`` and ``\\\\`` unescaped."""
    lit = F.regexp_extract(c, r'^"((?:[^"\\]|\\.)*)"(?:\^\^<[^>]*>|@[A-Za-z0-9-]+)?$', 1)
    unescaped = F.regexp_replace(F.regexp_replace(lit, r'\\"', '"'), r"\\\\", r"\\")
    iri = F.regexp_extract(c, r"^<([^>]*)>$", 1)
    return (
        F.when(c.rlike(r'^".*'), unescaped)
        .when(c.rlike(r"^<.*>$"), iri)
        .otherwise(c)
    )


def parse_nquads_lines(
    lines: DataFrame,
    line_col: str = "value",
    default_ts: Column | None = None,
    add_timestamps: bool = True,
) -> DataFrame:
    """Parse a DataFrame of N-Quads text lines into the quads schema.

    ``default_ts``: timestamp for lines without a leading timestamp token
    (reference uses now(); pass ``F.lit(0)`` for determinism in tests).
    Malformed / comment / empty lines are dropped (reference returns parse
    errors per line; the stream path skips them).
    """
    if default_ts is None:
        default_ts = (F.unix_micros(F.current_timestamp()) / 1000).cast("long")
    c = F.col(line_col)
    # default_ts may reference other columns of `lines` (e.g. a Kafka
    # record timestamp) — evaluate it inside this projection, before
    # those columns are pruned away
    parsed = lines.where(~c.rlike(r"^\s*(#.*)?$")).select(
        F.regexp_extract(c, _LINE, 1).alias("_ts_raw"),
        _clean_term(F.regexp_extract(c, _LINE, 2)).alias("subject"),
        _clean_term(F.regexp_extract(c, _LINE, 3)).alias("predicate"),
        _clean_term(F.regexp_extract(c, _LINE, 4)).alias("object"),
        _clean_term(F.regexp_extract(c, _LINE, 5)).alias("graph"),
        F.regexp_extract(c, _LINE, 2).alias("_s_raw"),
        (default_ts if add_timestamps else F.lit(0)).cast("long").alias("_dts"),
    )
    ts = F.when(F.col("_ts_raw") != "", F.col("_ts_raw").cast("long")).otherwise(
        F.col("_dts")
    )
    return (
        parsed.where(F.col("_s_raw") != "")  # regexp failed ⇒ malformed line
        .select(
            ts.alias("ts"),
            "subject",
            "predicate",
            "object",
            F.col("graph").alias("graph"),
        )
    )


def read_nquads(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """Read an N-Quads file (optionally timestamp-prefixed) into quads."""
    return parse_nquads_lines(spark.read.text(path), **kwargs)


def format_nquads(quads: DataFrame, with_timestamps: bool = True) -> DataFrame:
    """Inverse of the parser: quads → one N-Quads text line per row
    (the shape the reference's stream bus publishes, stream_bus.rs:279-298)."""

    def term(col: str) -> Column:
        c = F.col(col)
        return F.when(
            c.startswith("http://") | c.startswith("https://") | c.startswith("urn:"),
            F.concat(F.lit("<"), c, F.lit(">")),
        ).otherwise(
            F.concat(F.lit('"'), F.regexp_replace(F.regexp_replace(c, r"\\", r"\\\\"), '"', r'\\"'), F.lit('"'))
        )

    parts = [term("subject"), F.lit(" "), term("predicate"), F.lit(" "), term("object")]
    graph = F.when(
        F.col("graph").isNotNull() & (F.col("graph") != ""),
        F.concat(F.lit(" <"), F.col("graph"), F.lit(">")),
    ).otherwise(F.lit(""))
    line = F.concat(*parts, graph, F.lit(" ."))
    if with_timestamps:
        line = F.concat(F.col("ts").cast("string"), F.lit(" "), line)
    return quads.select(line.alias("value"))
