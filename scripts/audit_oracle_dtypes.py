"""Dtype-family sweep: Spark plan schema vs DuckDB DESCRIBE for every oracle.

The driver's correctness hash is computed on pandas-rendered values and is
type/repr-sensitive: DuckDB widens SUM(int) to HUGEINT, pandas renders that
float64, and ``1`` vs ``1.0`` hash-diverge even when every value is equal
(CORRECTNESS_r05 q_feature_hashing / q_profile).  This sweep catches the
class statically: it compares the *pandas dtype family* each side will
materialize, per column, without executing either side (DuckDB ``DESCRIBE``
is plan-only; the Spark DataFrame is built but never collected).

Families are derived from how each engine's pandas conversion actually
behaves (probed, not guessed):

DuckDB type            -> pandas        family
  TINYINT..BIGINT      -> intN          int
  HUGEINT              -> float64       float   <- the r05 bug class
  FLOAT/DOUBLE         -> floatN        float
  DECIMAL(p,s)         -> float64       float
  VARCHAR              -> object(str)   str
  BOOLEAN              -> bool          bool
  DATE                 -> datetime64    datetime
  TIMESTAMP*           -> datetime64    datetime
  BLOB                 -> object(bytes) bytes
  T[] / LIST           -> object(list)  list

Spark type             -> pandas        family
  Byte/Short/Int/Long  -> intN          int
  Float/Double         -> floatN        float
  Decimal(p,s)         -> object(Decimal) decimal
  String               -> object(str)   str
  Boolean              -> bool          bool
  Date                 -> object(date)  datetime (driver-normalized; see
                          ALLOWED below for the empirically-green pairs)
  Timestamp            -> datetime64    datetime
  Binary               -> object(bytes) bytes
  Array                -> object(list)  list

A (spark_family, duck_family) pair is a finding unless listed in
``ALLOWED`` — pairs proven benign by gates that passed a real driver
hash_match in CORRECTNESS_r0{4,5}.json.  int/float is the proven-FAILING
pair and is never allowed.

Usage: python scripts/audit_oracle_dtypes.py [sf_dir] [query ...]
Also importable: ``sweep(spark, con, names)`` returns the findings dict —
tests/test_oracle_dtypes.py runs it over every oracle in the green suite.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# (spark_family, duck_family) pairs that real driver hash_match runs have
# proven benign.  Each entry cites a gate that was green in a driver window
# with that exact pair.  int/float (the r05 failure class) must never be
# added here.
ALLOWED = {
    ("int", "int"),
    ("float", "float"),
    ("str", "str"),
    ("bool", "bool"),
    ("datetime", "datetime"),
    ("bytes", "bytes"),
    ("list", "list"),
    ("decimal", "decimal"),
    # q_link_prediction r5: Spark DECIMAL(38,0) vs DuckDB DECIMAL(38,0)
    # hash-matched, and Spark DECIMAL vs DuckDB HUGEINT/DECIMAL renders
    # the same digits; pairs below are only admitted when a driver-green
    # gate exhibits them -- currently none beyond identity, so keep tight.
}


def duck_family(t: str) -> str:
    t = t.upper()
    if t.endswith("[]") or t.startswith("LIST") or t.startswith("ARRAY"):
        return "list"
    if t.startswith("STRUCT") or t.startswith("MAP"):
        return "struct"
    if t.startswith("DECIMAL"):
        # pandas (.df(), the driver's path) renders DECIMAL as float64,
        # but fetchall (the repr-strict local comparator) yields Decimal
        # objects — keep DECIMAL its own family so a double-vs-DECIMAL
        # oracle is a finding (r6 sweep caught 4: q_time_weighted_avg,
        # q_sliding_percentile, q_live_percentile, q_live_ohlc — all
        # from DuckDB's decimal literals like 0.0/20.0 propagating).
        return "decimal"
    if t in ("HUGEINT", "UHUGEINT"):
        # pandas renders these as float64 (the r05 failure class vs int)
        return "float"
    if t in (
        "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
    ):
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t in ("VARCHAR", "TEXT", "STRING", "UUID"):
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE" or t.startswith("TIMESTAMP") or t.startswith("TIME"):
        return "datetime"
    if t in ("BLOB", "BYTEA"):
        return "bytes"
    return f"other:{t}"


def spark_family(t) -> str:
    from pyspark.sql import types as T

    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(t, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(t, T.DecimalType):
        return "decimal"
    if isinstance(t, T.StringType):
        return "str"
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return "datetime"
    if isinstance(t, T.BinaryType):
        return "bytes"
    if isinstance(t, T.ArrayType):
        return "list"
    if isinstance(t, (T.StructType, T.MapType)):
        return "struct"
    return f"other:{t.simpleString()}"


def connect_duck(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def sweep(spark, con, sf_dir: str, names=None):
    """Return {gate: [(col, spark_family, duck_family, duck_type), ...]}
    for every oracle whose pandas dtype families diverge outside ALLOWED.
    Builds the Spark plan (lazy) and DESCRIBEs the oracle -- no execution.
    Gates whose Spark build itself executes work (streaming fixtures)
    still run; that is the price of reading the real output schema."""
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    findings: dict[str, list] = {}
    errors: dict[str, str] = {}
    for name, sql in oracles.items():
        if names and name not in names:
            continue
        if name not in queries:
            continue
        try:
            sdf = queries[name](spark, sf_dir)
            sfields = {f.name: spark_family(f.dataType) for f in sdf.schema.fields}
        except Exception as e:  # pragma: no cover - surfaced to caller
            errors[name] = f"spark build: {e}"
            continue
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # pragma: no cover
            errors[name] = f"duckdb describe: {e}"
            continue
        bad = []
        for col, dtype, *_ in desc:
            sf = sfields.get(col)
            if sf is None:
                bad.append((col, "<missing in spark>", duck_family(dtype), dtype))
                continue
            df_ = duck_family(dtype)
            if (sf, df_) not in ALLOWED:
                bad.append((col, sf, df_, dtype))
        if bad:
            findings[name] = bad
    return findings, errors


SNAPSHOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "oracle_schema_snapshot.json",
)


def write_snapshot(spark, sf_dir: str, path: str = SNAPSHOT):
    """Pin {gate: {col: spark_family}} for every queries() entry so the
    dtype-family pytest can DESCRIBE oracles against it without a live
    Spark build (streaming gates execute real work on build — too slow
    for the suite).  Regenerate with
    ``python scripts/audit_oracle_dtypes.py --write-snapshot`` whenever a
    gate's output schema changes; check_correctness.py compares the LIVE
    Spark schema against this snapshot on every run and fails on drift."""
    import json

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    snap: dict[str, dict[str, str]] = {}
    errors: dict[str, str] = {}
    for name, fn in queries.items():
        try:
            sdf = fn(spark, sf_dir)
            snap[name] = {f.name: spark_family(f.dataType) for f in sdf.schema.fields}
        except Exception as e:  # pragma: no cover
            errors[name] = str(e)
    with open(path, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    return snap, errors


def main():
    argv = [a for a in sys.argv[1:] if a != "--write-snapshot"]
    snap_mode = "--write-snapshot" in sys.argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:]) or None
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    from janus_spark.session import get_spark

    spark = get_spark("dtype-audit")
    spark.sparkContext.setLogLevel("ERROR")
    if snap_mode:
        snap, errors = write_snapshot(spark, sf_dir)
        for name, err in sorted(errors.items()):
            print(f"ERROR    {name:<32} {err[:160]}")
        print(f"snapshot: {len(snap)} gates -> {SNAPSHOT}, {len(errors)} errors")
        return 1 if errors else 0
    con = connect_duck(sf_dir)
    findings, errors = sweep(spark, con, sf_dir, only)
    for name, bad in sorted(findings.items()):
        for col, sf, df_, dtype in bad:
            print(f"MISMATCH {name:<32} {col:<24} spark={sf:<8} duck={df_:<8} ({dtype})")
    for name, err in sorted(errors.items()):
        print(f"ERROR    {name:<32} {err[:160]}")
    print(f"\n{len(findings)} gates with dtype-family mismatches, {len(errors)} errors")
    return 1 if findings or errors else 0


if __name__ == "__main__":
    sys.exit(main())
