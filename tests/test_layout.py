"""Z-order layout: row-group stats must be tight in BOTH dimensions,
unlike a single-column sort (tight in one, smeared in the other)."""

import glob

import duckdb
from pyspark.sql import functions as F

from janus_spark.sources.layout import write_zordered, zorder_key


def _spreads(root, col, lo, hi):
    """Per-row-group normalized (max-min)/range for ``col`` across files."""
    con = duckdb.connect()
    out = []
    for f in glob.glob(f"{root}/*.parquet"):
        for _, mn, mx in con.execute(
            "SELECT row_group_id, stats_min_value, stats_max_value "
            "FROM parquet_metadata(?) WHERE path_in_schema = ?",
            [f, col],
        ).fetchall():
            out.append((float(mx) - float(mn)) / (hi - lo))
    return out


def _fixture(spark, n=120_000):
    return spark.range(n).select(
        F.col("id").alias("ts"),
        (F.xxhash64("id") % 100_000).alias("user_id"),
        F.col("id").cast("double").alias("v"),
    )


def test_zorder_tight_in_both_dims(spark, tmp_path):
    df = _fixture(spark)
    hc = spark._jsc.hadoopConfiguration()
    old_bs = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 64 * 1024)
    try:
        write_zordered(df, str(tmp_path / "z"), ["ts", "user_id"], bits=12, partitions=4)
        df.repartitionByRange(4, "ts").sortWithinPartitions("ts").write.mode(
            "overwrite"
        ).parquet(str(tmp_path / "t"))
    finally:
        if old_bs is None:
            hc.unset("parquet.block.size")
        else:
            hc.set("parquet.block.size", old_bs)
    ulo, uhi = -100_000.0, 100_000.0
    z_ts = _spreads(tmp_path / "z", "ts", 0, 120_000)
    z_u = _spreads(tmp_path / "z", "user_id", ulo, uhi)
    t_ts = _spreads(tmp_path / "t", "ts", 0, 120_000)
    t_u = _spreads(tmp_path / "t", "user_id", ulo, uhi)
    avg = lambda xs: sum(xs) / len(xs)  # noqa: E731
    # ts-sorted: ts tight, user_id smeared across ~full domain
    assert avg(t_ts) < 0.1 and avg(t_u) > 0.8
    # z-ordered: BOTH dimensions bounded well below the smeared one —
    # a user_id-range predicate now prunes row groups too (it prunes
    # nothing under ts-sort), at the cost of coarser-but-bounded ts
    # stats.  (The area product is ~1/n_rowgroups for ANY layout; the
    # curve's win is balancing it across dims, so assert the max.)
    assert avg(z_ts) < 0.35 and avg(z_u) < 0.35
    assert max(avg(z_ts), avg(z_u)) < 0.5 * avg(t_u)


def test_zorder_key_handles_strings_nulls_constants(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 5.0), (3, None, 5.0)], ["n", "s", "const"]
    )
    d, z = zorder_key(df, ["n", "s", "const"], bits=8)
    vals = [r[0] for r in d.select(z).collect()]
    assert len(vals) == 3 and all(v is not None and v >= 0 for v in vals)


def test_zorder_width_guard(spark):
    df = spark.range(10).select(F.col("id").alias("a"), F.col("id").alias("b"))
    import pytest

    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b"], bits=32)
