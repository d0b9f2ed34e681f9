"""PII scrubbing for training-data curation: regex-based redaction of
emails, IPv4 addresses and phone-shaped numbers.

Map-only ``regexp_replace`` chains — no UDFs, no shuffle; at 100 TB this
runs at scan speed inside whole-stage codegen.  Patterns deliberately use
only the regex subset with identical semantics in Java (Spark) and RE2
(DuckDB): no lookaround, no backreferences — which keeps the operator
oracle-checkable engine-to-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# order matters: scrub emails before phones so the digits in
# "user123@..." are judged as part of the address, not a number
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}


def redact_pii(col: Column, kinds: tuple[str, ...] = ("email", "ipv4", "phone")) -> Column:
    """Replace each PII match with a typed placeholder (``<EMAIL>`` …)."""
    out = col
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind match counts (audit signal for curation dashboards)."""
    return {
        f"n_{kind}": F.size(F.regexp_extract_all(col, F.lit(pat), 0))
        for kind, pat in PII_PATTERNS.items()
    }


def scrub_documents(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, scrubbed text, per-kind counts) for every document."""
    counts = pii_counts(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        redact_pii(F.col(text_col)).alias("clean_text"),
        *[c.cast("long").alias(n) for n, c in counts.items()],
    )
