"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk``: brute-force top-k — the exactness baseline.  The query
  side is collected/broadcast (query sets are small); the corpus side
  streams through one scan, so the cost is O(|corpus| * |queries|) FLOPs
  with NO shuffle except the final per-query top-k (TakeOrdered-style).
- ``lsh_topk``: random-hyperplane LSH — sign-bit signatures bucketed into
  bands; candidates only join within matching buckets.  The scale path:
  at 100 TB the corpus never self-joins, it equi-joins on (band, bucket).

Dot products use higher-order array functions (zip_with + aggregate) —
JVM-side, no Python/Arrow round trip.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: zero-norm vectors yield null similarity (ranked last)
    # instead of an ANSI division-by-zero error
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Returns (query_id, vec_id, rank, sim).  The join is a broadcast
    nested-loop (queries broadcast), then one shuffle for the per-query
    top-k window.  Deterministic: ties break by vec_id.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    joined = c.crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.where(F.col("vec_id") != F.col("query_id"))
    sims = joined.select(
        "query_id",
        "vec_id",
        cosine(F.col("qv"), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "sim")
    )


def hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature as an int per plane-group caller composes."""
    bits = []
    for p in planes:
        arr = F.array(*[F.lit(x) for x in p])
        bits.append(F.when(_dot(vec, arr) >= 0, F.lit(1)).otherwise(F.lit(0)))
    sig = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        sig = sig + (b.cast("long") * F.lit(1 << i).cast("long"))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits_per_band: int = 8,
    bands: int = 4,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share >= 1 LSH band bucket with the
    query, then exact cosine rank within candidates."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(dim, bits_per_band * bands, seed)

    def banded(df: DataFrame, idc: str, vc: str, out_id: str, out_vec: str) -> DataFrame:
        sig_cols = []
        for b in range(bands):
            ps = planes[b * bits_per_band : (b + 1) * bits_per_band]
            sig_cols.append(F.struct(F.lit(b).alias("band"), lsh_signature(F.col(vc), ps).alias("bh")))
        return df.select(
            F.col(idc).alias(out_id),
            F.col(vc).alias(out_vec),
            F.explode(F.array(*sig_cols)).alias("bb"),
        ).select(out_id, out_vec, "bb.band", "bb.bh")

    cb = banded(corpus, id_col, vec_col, "vec_id", "cv")
    qb = banded(queries, id_col, vec_col, "query_id", "qv")
    cand = (
        cb.join(F.broadcast(qb), on=["band", "bh"])
        .where(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    sims = cand.select("query_id", "vec_id", cosine(F.col("qv"), F.col("cv")).alias("sim"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "sim")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_threshold: float = 0.95,
    bits_per_band: int = 8,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, sim >= threshold) via
    self-LSH bucketing — the embedding leg of the dedup suite."""
    dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, bits_per_band * bands, seed)
    sig_cols = []
    for b in range(bands):
        ps = planes[b * bits_per_band : (b + 1) * bits_per_band]
        sig_cols.append(F.struct(F.lit(b).alias("band"), lsh_signature(F.col(vec_col), ps).alias("bh")))
    banded = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.explode(F.array(*sig_cols)).alias("bb"),
    ).select("id", "v", "bb.band", "bb.bh")
    cand = (
        banded.alias("l")
        .join(banded.alias("r"), on=["band", "bh"])
        .where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"), F.col("l.v").alias("va"), F.col("r.v").alias("vb"))
        .dropDuplicates(["a", "b"])
    )
    return (
        cand.select("a", "b", cosine(F.col("va"), F.col("vb")).alias("sim"))
        .where(F.col("sim") >= sim_threshold)
    )
