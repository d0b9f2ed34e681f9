"""Skew-mitigation utilities: explicit salting for hot join keys and
hot-group aggregates.

AQE's skew-join split (spark.sql.adaptive.skewJoin) handles sort-merge
joins at runtime, but it cannot help (a) streaming joins, (b) hash
aggregates with a mega-key, or (c) cases where the skew is known ahead
of time and the extra sort-merge pass is unwanted.  These operators are
the planned-ahead form: results are provably identical to the unsalted
operator (pinned by tests and the q_skew_join oracle gate); only the
partitioning changes.

Cost model: ``salted_join`` replicates the *small* side ``salt`` times
(size × salt) and spreads each hot left key over ``salt`` partitions.
Pick salt ≈ (hot-key rows / average-key rows) capped by cluster
parallelism; 8-32 covers most real skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``salt``
    sub-partitions and the right side replicated to every sub-partition.
    Supports 'inner' and 'left' (the replicated side must be the
    lookup/dimension side).  Output equals ``left.join(right, on, how)``.

    The left salt is random-per-row (seeded, so one run is internally
    consistent) — correctness never depends on which sub-partition a row
    lands in, only the spread does."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    sl = left.withColumn("__salt", (F.rand(42) * salt).cast("int"))
    sr = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return sl.join(sr, [*on, "__salt"], how).drop("__salt")


def skew_safe_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    alias: str = "n_distinct",
) -> DataFrame:
    """COUNT(DISTINCT col) per key without funnelling a hot key's whole
    value set through one task: stage 1 dedups on (keys, col) — the
    shuffle spreads by value, so a mega-key fans out — stage 2 counts
    per key (map-side combinable).  Equals groupBy(keys).countDistinct."""
    return (
        df.select(*keys, col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(alias))
    )


def skew_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    top: int = 10,
) -> DataFrame:
    """Shuffle-planning diagnosis: the ``top`` hottest keys with their
    row count, share of the table, skew factor (count ÷ mean count per
    key), and the salt factor that would level each down to the mean —
    the number you feed straight into ``salted_join``.  Run this BEFORE
    shipping a join/groupBy on an unknown key at scale; a skew factor in
    the hundreds means AQE split points or planned salting.

    One map-side-combined aggregation over the scan plus a 2-row
    broadcast of the totals; the top-N cut is TakeOrdered (per-task
    heap), no global sort.
    """
    keys = [F.col(k) for k in key_cols]
    counts = df.groupBy(*keys).agg(F.count("*").alias("n"))
    tot = counts.agg(
        F.sum("n").alias("__total"), F.count("*").alias("__nkeys")
    )
    skew = F.col("n") * F.col("__nkeys") / F.col("__total")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            *key_cols,
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("__total"), 6).alias("share"),
            F.round(skew, 6).alias("skew_factor"),
            F.ceil(skew).cast("long").alias("suggested_salt"),
        )
        .orderBy(F.desc("n"), *key_cols)
        .limit(top)
    )


def auto_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    skew_threshold: float = 8.0,
    salt_cap: int = 64,
    stats: DataFrame | None = None,
    decision: dict | None = None,
) -> DataFrame:
    """Stats-driven join dispatch: diagnose the left side's key
    distribution (``skew_stats``), then pick the physical strategy —
    ``salted_join`` when the hottest key's skew factor (count ÷ mean
    count per key) reaches ``skew_threshold``, the plain equi-join
    otherwise.  Output is identical either way (salting is a pure
    partitioning change); only the shuffle shape differs.

    This closes the diagnose→mitigate loop: ``skew_stats`` already
    names the hot keys and the salt that would level them — this
    feeds that straight into the planner instead of leaving salting
    opt-in.  The salt is ``min(ceil(top skew factor), salt_cap)`` so a
    mega-key spreads to its own level, bounded by the replication the
    small side can afford.

    Cost: ONE map-side-combined count-per-key aggregate over the left
    keys plus a 1-row collect — narrow rows, cheap next to the join's
    own shuffle.  Amortize it by passing a precomputed/maintained
    ``stats`` frame (any frame with a ``skew_factor`` column ordered
    hottest-first, e.g. a persisted ``skew_stats`` output).

    Pass a dict as ``decision`` to observe the dispatch
    ({"strategy", "salt", "top_skew"}) — used by the plan-guard tests.
    """
    top = (stats if stats is not None else skew_stats(left, on, top=1)).select(
        "skew_factor"
    ).limit(1).collect()
    top_skew = float(top[0]["skew_factor"]) if top else 0.0
    if top_skew >= skew_threshold and how in ("inner", "left"):
        salt = max(2, min(salt_cap, int(-(-top_skew // 1))))
        out = salted_join(left, right, on, salt=salt, how=how)
        info = {"strategy": "salted", "salt": salt, "top_skew": top_skew}
    else:
        out = left.join(right, list(on), how)
        info = {"strategy": "plain", "salt": 0, "top_skew": top_skew}
    if decision is not None:
        decision.update(info)
    return out
