"""Cached SQL-text Column construction for the datapipe's heavy
expression trees.

Why this exists: every ``F.<fn>()`` call is a Py4J round-trip, and the
datapipe's higher-order trees (shingles, in-array run-length scans,
MinHash signatures, Gopher statistics) are hundreds of nodes deep —
constructing one costs 0.2–2 s of pure DRIVER time, and a caller (or the
bench, which rebuilds each query per rep) pays it on every invocation.
Building the same tree as ONE SQL string handed to ``F.expr`` is a
single round-trip plus a fast JVM parse, and caching the parsed Column
makes repeat constructions free.

Safety (the ``queries._FRAME_CACHE`` precedent): a Column is an
immutable, LAZY, unresolved expression tree.  Caching it caches no data
and no results — every plan that embeds it is analyzed fresh and every
action recomputes from the inputs.  The SQL string is the cache key, so
two semantically different expressions can never collide.

Equivalence discipline: each ``*_sql`` builder in the datapipe modules
mirrors its former Column-API form token for token (same functions, same
literal types, same casts), and the gates that consume them are pinned
EXACT against their DuckDB oracles — the conversion is a construction-
cost change, not a semantic one.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["cached_expr", "qident", "sql_str"]


@lru_cache(maxsize=4096)
def cached_expr(sql: str) -> Column:
    """Parse ``sql`` into a Column once per process and reuse it."""
    return F.expr(sql)


def qident(name: str) -> str:
    """Backtick-quote an identifier for safe embedding in SQL text."""
    return "`" + name.replace("`", "``") + "`"


def sql_str(s: str) -> str:
    """Single-quoted SQL string literal with backslash/quote escaping
    (default Spark parser semantics: backslash is an escape character)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
