"""Multi-dimensional file clustering: Z-order (Morton) layout.

A single-column sort gives parquet row-group min/max stats that prune
scans on THAT column only; any second predicate column is uniformly
smeared across every row group and prunes nothing.  Interleaving the
bits of several columns' quantized values (the Morton curve) trades a
little per-column locality for locality in ALL of them — the layout
behind Delta/Iceberg `OPTIMIZE ZORDER BY`, built here from plain Spark
bit arithmetic (no UDFs, no vendor format):

  1. one scalar agg for per-column min/max,
  2. map-side linear quantization to ``bits``-bit grid cells,
  3. bit interleave via a fixed shift/or expression tree,
  4. ``repartitionByRange`` + ``sortWithinPartitions`` on the z-value so
     row groups become Morton-curve runs — compact hyper-rectangles in
     value space whose footer stats are tight in EVERY z-dimension.

At 100 TB this is the difference between "time-range scans are fast OR
point lookups are fast, pick one" and both pruning from the same copy:
a two-column z-layout bounds each row group's spread in both columns to
roughly range/2^(bits_used/2) of the domain.

Reference anchor: the reference's segment index prunes on ts only
(src/storage/segmented_storage.rs, sparse ts index per segment);
`QuadStore.write(cluster=...)` covers ts- and predicate-major layouts,
and this module adds the multi-dimensional option for mixed workloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
) -> tuple[DataFrame, Column]:
    """Return (df, z) where ``z`` is the Morton code of ``cols``.

    Numeric columns are linearly quantized between their observed
    min/max (one tiny scalar aggregate, collected once — the only
    driver-side step); string columns are hashed first (xxhash64) so
    they interleave as uniform bits.  NULL quantizes to cell 0.
    Total z-width = ``bits × len(cols)`` ≤ 63 bits is enforced.
    """
    if bits * len(cols) > 63:
        raise ValueError(f"z-key would need {bits * len(cols)} bits (max 63)")
    numeric = {
        f.name: f.dataType.simpleString() not in ("string", "binary")
        for f in df.schema.fields
        if f.name in cols
    }
    aggs = []
    for c in cols:
        src = F.col(c).cast("double") if numeric[c] else F.xxhash64(F.col(c)).cast("double")
        aggs += [F.min(src).alias(f"__lo_{c}"), F.max(src).alias(f"__hi_{c}")]
    bounds = df.agg(*aggs).collect()[0]
    m = (1 << bits) - 1
    cells = []
    for c in cols:
        lo, hi = bounds[f"__lo_{c}"], bounds[f"__hi_{c}"]
        src = F.col(c).cast("double") if numeric[c] else F.xxhash64(F.col(c)).cast("double")
        if lo is None or hi is None or hi <= lo:
            cells.append(F.lit(0).cast("long"))
            continue
        q = F.floor((src - F.lit(float(lo))) / F.lit(float(hi - lo)) * (m + 1))
        cells.append(F.coalesce(F.least(F.lit(m), F.greatest(F.lit(0), q)), F.lit(0)).cast("long"))
    z = F.lit(0).cast("long")
    k = len(cols)
    for b in range(bits):
        for i, cell in enumerate(cells):
            bit = F.shiftright(cell, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * k + i)
    return df, z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` to parquet clustered on the Morton curve of ``cols``.

    ``repartitionByRange`` on the z-value makes files curve runs (range
    partitioner samples the z distribution, so skew in one column does
    not unbalance files); the within-partition sort makes ROW GROUPS
    curve runs, which is where footer-stats pruning actually happens.
    """
    d, z = zorder_key(df, cols, bits)
    d = d.withColumn("__z", z)
    n = partitions or d.sparkSession.sparkContext.defaultParallelism
    (
        d.repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
