"""Declarative data-quality validation — the dbt-test / Great-Expectations
shape: a rule list compiles to ONE pass over the table (conditional
aggregates), plus one tiny aggregate per uniqueness/foreign-key rule.

Rules (all return (rule, column, n_violations, passed)):
- ``("not_null", col)``              — null count
- ``("unique", col)``                — rows beyond the first per value
- ``("in_range", col, lo, hi)``      — values outside [lo, hi] (nulls pass;
                                        pair with not_null to reject them)
- ``("in_set", col, values)``        — values outside the allowed set
- ``("matches", col, regex)``        — values not fully matching the regex
- ``("foreign_key", col, other_df, other_col)`` — values with no parent
                                        (left-anti against DISTINCT keys)

Scale: the row-level rules (not_null/in_range/in_set/matches) share a
single conditional-aggregate scan regardless of rule count.  ``unique``
is a groupBy on the column (map-side combinable).  ``foreign_key``
de-dupes the parent side first, then a left-anti join — broadcast when
the parent key set is dimension-sized, shuffle otherwise; either way the
child table is scanned once per FK rule, never self-joined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROW_RULES = {"not_null", "in_range", "in_set", "matches"}


def validate(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Run ``rules`` against ``df``; returns one row per rule:
    (rule, column, n_violations, passed) — deterministic order-free
    counts, so the report is engine-exact."""
    spark = df.sparkSession
    row_aggs, row_meta = [], []
    results = []
    for i, rule in enumerate(rules):
        kind, col = rule[0], rule[1]
        if kind == "not_null":
            cond = F.col(col).isNull()
        elif kind == "in_range":
            lo, hi = rule[2], rule[3]
            cond = F.col(col).isNotNull() & ~F.col(col).between(F.lit(lo), F.lit(hi))
        elif kind == "in_set":
            cond = F.col(col).isNotNull() & ~F.col(col).isin(list(rule[2]))
        elif kind == "matches":
            cond = F.col(col).isNotNull() & ~F.col(col).rlike(rule[2])
        elif kind == "unique":
            n = (
                df.where(F.col(col).isNotNull())
                .groupBy(col)
                .agg(F.count(F.lit(1)).alias("c"))
                .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("v"))
                .collect()[0]["v"]
            )
            results.append((kind, col, int(n)))
            continue
        elif kind == "foreign_key":
            other, other_col = rule[2], rule[3]
            parents = other.select(F.col(other_col).alias(col)).distinct()
            n = (
                df.where(F.col(col).isNotNull())
                .select(col)
                .join(parents, col, "left_anti")
                .count()
            )
            results.append((kind, col, int(n)))
            continue
        else:
            raise ValueError(f"unknown rule kind {kind!r}")
        row_aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"__r{i}"))
        row_meta.append((i, kind, col))
    if row_aggs:
        row = df.agg(*row_aggs).collect()[0]
        for i, kind, col in row_meta:
            results.append((kind, col, int(row[f"__r{i}"] or 0)))
    return spark.createDataFrame(
        [(k, c, n, n == 0) for k, c, n in results],
        "rule string, column string, n_violations bigint, passed boolean",
    )


def profile_table(df, numeric_cols: list[str] | None = None):
    """Column profile in ONE scan — the data-quality summary every
    ingest job logs before a table enters the pipeline: per column the
    row count, null count, exact distinct count, and (for the declared
    numeric columns) min/max.

    Plan: a single wide aggregate computes every statistic map-side
    (count/count-null are plain partial aggs; COUNT(DISTINCT col) per
    column expands via Spark's expand-operator, still one scan), then a
    stack() melt turns the one-row result into one row per column —
    no per-column jobs, no driver loop over columns.

    Returns (column, n, n_null, n_distinct, min_v, max_v) with min/max
    null for non-numeric columns.
    """
    from pyspark.sql import functions as F

    # column names are data here, not trusted SQL: backtick-quote every
    # identifier (escaping embedded backticks) and single-quote-escape
    # the name literal, so a column named "a b", "x'y" or "z`w"
    # profiles instead of breaking (or injecting into) the stack() expr.
    # F.col() parses backticks too, so access goes through _ident as well.
    def _ident(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    def _lit(name: str) -> str:
        return "'" + name.replace("'", "''") + "'"

    numeric_cols = numeric_cols or []
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in df.columns:
        col = F.col(_ident(c))
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__null_{c}"))
        aggs.append(F.count_distinct(col).alias(f"__nd_{c}"))
        if c in numeric_cols:
            aggs.append(F.min(col).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(col).cast("double").alias(f"__max_{c}"))
    one = df.agg(*aggs)

    parts = []
    for c in df.columns:
        mn = _ident(f"__min_{c}") if c in numeric_cols else "NULL"
        mx = _ident(f"__max_{c}") if c in numeric_cols else "NULL"
        parts += [
            _lit(c), "__n", _ident(f"__null_{c}"), _ident(f"__nd_{c}"),
            f"CAST({mn} AS DOUBLE)", f"CAST({mx} AS DOUBLE)",
        ]
    stacked = ", ".join(parts)
    return one.selectExpr(
        f"stack({len(df.columns)}, {stacked}) AS (column, n, n_null, n_distinct, min_v, max_v)"
    ).selectExpr(
        "column",
        "CAST(n AS BIGINT) AS n",
        "CAST(n_null AS BIGINT) AS n_null",
        "CAST(n_distinct AS BIGINT) AS n_distinct",
        "min_v", "max_v",
    )
