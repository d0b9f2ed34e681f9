"""Distributed PageRank over an edge DataFrame — link-graph quality
weighting for corpus curation (rank web domains / documents by citation
structure before sampling).  The reference has no graph operators at
all; this is part of the training-data pipeline suite.

Implementation notes (scale-first):
- Pure DataFrame joins + aggregations: rank contributions flow
  ``ranks ⋈ edges`` on src, then aggregate on dst — two hash shuffles
  per iteration, both on node id, so AQE coalesces them and a hot page
  (skewed in-degree) is handled by skew-join splitting.
- Out-degrees are computed once and reused every iteration.
- Dangling nodes (no out-links) would leak rank mass; their total mass
  is a scalar per iteration (tiny driver-side aggregate, not a
  collect of rows) redistributed uniformly — the standard treatment.
- Each iteration ends in ``localCheckpoint(eager=False)`` semantics via
  plan reuse: we deliberately keep the loop short (default 3-10
  iterations); for deep iteration counts callers should checkpoint —
  lineage doubles per round otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Iterate PageRank on a directed graph given as an edge list.
    Returns ``(id, rank)`` with ranks summing to 1.  Duplicate edges are
    collapsed (an edge's multiplicity does not multiply its vote)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    for i in range(iterations):
        contrib = (
            ranks.join(deg, ranks.id == deg.src, "inner")
            .join(e, "src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        # rank mass sitting on dangling nodes this round (scalar)
        dangling = (
            ranks.join(deg, ranks.id == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks
