"""Bloom-filter join pruning — map-side semi-join for the dim-too-big-
to-broadcast-but-its-BLOOM-fits case.

At 100 TB the common pain: a fact table must join a dim of ~10^7 keys.
Broadcasting the dim blows the driver; a shuffle join shuffles the whole
fact.  A Bloom filter of the dim keys is a few hundred KB at 1% fp — it
broadcasts as a plan literal, the fact side is pruned MAP-SIDE before
the shuffle, and only surviving rows (matches + ~fp%) pay shuffle cost.
Spark's own runtime bloom filters (InjectRuntimeFilter) cover the same
idea inside AQE but only fire on selective equi-joins it can prove; this
operator is the explicit form, usable on any key expression, and its
result is EXACT — false positives are eliminated by the real join that
follows, the bloom only cuts shuffle volume.

The filter is built with the shared md5 hash family
(datapipe/dedup.shared_hash64), k independent salts, one bit each, in a
``m_bits``-wide bitmap stored as ``m_bits/64`` bigint words.  The build
is one distinct-positions aggregation over the dim (bounded by m_bits
rows collected); the probe test is pure JVM-side bit arithmetic
(element_at + shiftleft + &), whole-stage-codegen friendly.

Reference behavior anchor: the reference engine's static-data join
broadcasts the static side outright (live_stream_processing.rs); this
operator is the scale path it lacks.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from janus_spark.datapipe.dedup import shared_hash64


def _bit_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    return [
        shared_hash64(F.concat(key.cast("string"), F.lit(f":bf{i}"))) % m_bits
        for i in range(k)
    ]


def build_bloom(build: DataFrame, build_key: Column, m_bits: int = 1 << 16, k: int = 3) -> list[int]:
    """Aggregate the dim side into a bitmap (list of ``m_bits/64`` signed
    64-bit words).  One narrow aggregation; the collect is of DISTINCT
    bit positions, bounded by ``m_bits`` rows regardless of dim size."""
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    pos = (
        build.select(F.explode(F.array(*_bit_positions(build_key, m_bits, k))).alias("pos"))
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in pos:
        words[r["pos"] // 64] |= 1 << (r["pos"] % 64)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_prune(
    probe: DataFrame, probe_key: Column, words: list[int], m_bits: int, k: int = 3
) -> DataFrame:
    """Filter the fact side map-side through the bitmap: keep a row iff
    all k of its bits are set (no false negatives; fp rate ≈
    (1−e^{−kn/m})^k).  Pure narrow bit arithmetic inside whole-stage
    codegen — the bitmap rides along as an array literal in the plan."""
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    df = probe.withColumn("__bf_words", arr)
    tests = []
    for i, p in enumerate(_bit_positions(probe_key, m_bits, k)):
        df = df.withColumn(f"__bf_p{i}", p)
        tests.append(
            F.expr(
                f"(shiftrightunsigned(element_at(__bf_words, cast(__bf_p{i} / 64 as int) + 1),"
                f" cast(__bf_p{i} % 64 as int)) & 1) = 1"
            )
        )
    out = df.where(functools.reduce(operator.and_, tests))
    return out.drop("__bf_words", *[f"__bf_p{i}" for i in range(k)])


def bloom_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    how: str = "inner",
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Exact equi-join with Bloom pre-pruning of the probe side: the
    bloom removes the vast majority of non-matching fact rows BEFORE the
    shuffle; the join then removes false positives, so the result equals
    ``probe.join(build, on, how)`` exactly."""
    words = build_bloom(build, F.col(on), m_bits, k)
    pruned = bloom_prune(probe, F.col(on), words, m_bits, k)
    return pruned.join(build, on=on, how=how)
