"""ML feature engineering over tabular logs — the feature-prep leg of
the training-data pipeline (alongside dedup/sampling/text): categorical
target encoding without label leakage.

Reference parity: the reference has no feature-engineering surface; this
is part of the "operations a large-scale training-data pipeline needs"
suite.

Scale notes:
- Target encoding is ONE groupBy on the category key (partial-agg
  combines map-side) + one broadcastable join of the per-category stats
  back to the rows — no window, no self-join, no per-row state.  At
  100 TB the stats frame is |categories| rows; broadcast when small,
  shuffle-join on the same key otherwise (AQE decides).
- Exactness: target sums are integer cents in DECIMAL(38,0); every
  emitted statistic is a single division (or one fixed cross-multiplied
  rational) of exact integer operands, so any engine reproduces the
  doubles bit-for-bit — the property that makes feature parity checks
  between the offline pipeline and a serving recompute trustworthy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"


def target_encode(
    df: DataFrame,
    cat_cols: list[str],
    target_col: str = "value",
    smoothing: int = 0,
) -> DataFrame:
    """Leave-one-out target encoding of ``cat_cols`` against a numeric
    target (exact at 2 decimals): each row gets the mean target of the
    OTHER rows in its category — the standard leakage-free encoding for
    high-cardinality categoricals (a row never sees its own label).

    With ``smoothing`` m > 0, the encoding is shrunk toward the global
    mean by m pseudo-observations (empirical-Bayes form)::

        loo_smoothed = (sum_cat − y + m·mean_global) / (n_cat − 1 + m)

    computed as ONE division of exact integers via cross-multiplication
    by the global count, so the result is engine-exact despite the
    rational prior.  Rows whose target is null, and singleton categories
    under m = 0 (denominator 0), encode as null.

    Returns the input columns plus ``loo_mean``.
    """
    if smoothing < 0:
        raise ValueError("smoothing must be >= 0")
    y = (F.col(target_col).cast("decimal(18,2)") * 100).cast(_D38)
    staged = df.withColumn("__y", y)
    stats = (
        staged.where(F.col("__y").isNotNull())
        .groupBy(*cat_cols)
        .agg(
            F.count(F.lit(1)).cast(_D38).alias("__n"),
            F.sum("__y").alias("__s"),
        )
    )
    out = staged.join(stats, cat_cols, "left")
    if smoothing == 0:
        enc = F.when(
            F.col("__y").isNotNull() & (F.col("__n") > 1),
            ((F.col("__s") - F.col("__y")).cast("double") / (F.col("__n") - 1).cast("double"))
            / 100.0,
        )
    else:
        g = staged.where(F.col("__y").isNotNull()).agg(
            F.count(F.lit(1)).cast(_D38).alias("__gn"),
            F.sum("__y").alias("__gs"),
        )
        out = out.crossJoin(F.broadcast(g))
        m = F.lit(smoothing).cast(_D38)
        num = (F.col("__s") - F.col("__y")) * F.col("__gn") + m * F.col("__gs")
        den = (F.col("__n") - 1 + m) * F.col("__gn")
        enc = F.when(
            F.col("__y").isNotNull(),
            (num.cast("double") / den.cast("double")) / 100.0,
        )
    drop = ["__y", "__n", "__s"] + (["__gn", "__gs"] if smoothing else [])
    return out.withColumn("loo_mean", enc).drop(*drop)
