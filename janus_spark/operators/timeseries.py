"""Timeseries analytics operators: time-weighted averages and pane-based
sliding-window aggregation.

Both are batch operators over an event frame with an epoch-millis ``ts``
column, complementing the historical sliding executor
(`operators/historical.py`) and OHLC resampling (`queries.py`):

* ``time_weighted_avg`` — the irregular-sampling mean: each observation is
  weighted by how long it was current (until the next observation of the
  same key).  The plain AVG over irregularly-spaced sensor readings
  over-weights bursts; TWA is the standard fix (and what the reference's
  per-window AVG silently gets wrong for irregular streams).

* ``pane_sliding_agg`` — sliding-window aggregation via **panes** (Li et
  al., "No pane, no gain", SIGMOD Record 2005): partial-aggregate each
  non-overlapping step-sized pane once, then roll panes up into the
  overlapping windows.  The naive plan replicates every *event* into
  ``range/step`` windows before the shuffle; the pane plan replicates
  per-key-per-pane *partials* instead — at 100 TB with range/step = 24
  this cuts shuffle volume by the per-pane event count (often 10³-10⁶×),
  and the pane partial-agg itself is map-side combinable.

Reference parity note: the reference re-runs each sliding hop's SPARQL
from scratch over re-materialized window contents
(src/execution/historical_executor.rs:120-147); panes are the Spark-first
answer for the aggregate-shaped subset of those queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-key time-weighted average under last-observation-carried-forward
    weighting: observation i holds from ts_i to ts_{i+1}, so its weight is
    the gap to the successor; the final observation has no successor and
    contributes no weight (standard right-open TWA).

    One window pass (single shuffle on the key) + one grouped aggregation
    that reuses the same partitioning — Catalyst plans the groupBy after
    the window without a second exchange.

    ``order_tiebreak``: extra column making the per-key ordering total when
    timestamps can tie (nondeterministic lead() otherwise).
    """
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    dt = (F.lead(ts_col).over(w) - F.col(ts_col)).cast("double")
    keep = [*key_cols, ts_col, value_col] + ([order_tiebreak] if order_tiebreak else [])
    with_dt = df.select(*keep).withColumn("dt", dt)
    twa = F.sum(F.col(value_col) * F.col("dt")) / F.sum("dt")
    return (
        with_dt.where(F.col("dt").isNotNull())
        .groupBy(*key_cols)
        .agg(
            F.count("*").alias("n_intervals"),
            F.round(F.sum("dt"), 6).alias("span_ms"),
            F.round(twa, 6).alias("twa"),
        )
    )


def interp_resample(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    step_ms: int = 3_600_000,
) -> DataFrame:
    """Regularize an irregular series by LINEAR INTERPOLATION onto a
    per-key ``step_ms`` grid — the smooth counterpart of LOCF resampling
    (sensor fusion / feature alignment want interpolation; state
    semantics want LOCF).  Grid slots span [first obs, last obs] per
    key, so both bracketing observations always exist; a slot landing
    exactly on an observation returns that value.

    Plan: grid rows are unioned with observations and BOTH brackets are
    found in one window pass — ``last(value, ignorenulls)`` looking back
    and ``first(value, ignorenulls)`` looking forward share the same
    partitioning and sort, so Catalyst plans ONE shuffle + ONE sort for
    the whole operator.  No range join, no per-slot probe: this is the
    union+window trick of ``asof_join`` applied in both directions at
    once, and it survives 100 TB because state per key is a sort run,
    not a cross product.

    Observations at the same (key, ts) must be pre-deduplicated by the
    caller (as-of semantics need one value per instant).
    """
    obs = df.select(
        *key_cols,
        F.col(ts_col).cast("long").alias("__ts"),
        F.col(value_col).cast("double").alias("__v"),
        F.lit(1).alias("__is_obs"),
    )
    lo = F.expr(f"(mn + {step_ms - 1}) DIV {step_ms}")
    hi = F.expr(f"mx DIV {step_ms}")
    slots = F.when(lo <= hi, F.sequence(lo, hi)).otherwise(F.array().cast("array<bigint>"))
    grid = (
        obs.groupBy(*key_cols)
        .agg(F.min("__ts").alias("mn"), F.max("__ts").alias("mx"))
        .select(*key_cols, F.explode(slots).alias("__slot"))
        .select(
            *key_cols,
            (F.col("__slot") * step_ms).cast("long").alias("__ts"),
            F.lit(None).cast("double").alias("__v"),
            F.lit(0).alias("__is_obs"),
        )
    )
    u = obs.unionByName(grid)
    # obs sorts before grid at an equal instant so the backward bracket
    # sees an observation sitting exactly on the slot
    w = Window.partitionBy(*key_cols).orderBy(F.col("__ts"), F.col("__is_obs").desc())
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    marked = (
        u.withColumn("__pv", F.last(F.when(F.col("__is_obs") == 1, F.col("__v")), ignorenulls=True).over(back))
        .withColumn("__pt", F.last(F.when(F.col("__is_obs") == 1, F.col("__ts")), ignorenulls=True).over(back))
        .withColumn("__nv", F.first(F.when(F.col("__is_obs") == 1, F.col("__v")), ignorenulls=True).over(fwd))
        .withColumn("__nt", F.first(F.when(F.col("__is_obs") == 1, F.col("__ts")), ignorenulls=True).over(fwd))
    )
    frac = (F.col("__ts") - F.col("__pt")) / (F.col("__nt") - F.col("__pt"))
    interp = F.when(F.col("__nt") > F.col("__pt"), F.col("__pv") + (F.col("__nv") - F.col("__pv")) * frac).otherwise(
        F.col("__pv")
    )
    return marked.where(F.col("__is_obs") == 0).select(
        *key_cols,
        F.col("__ts").alias(ts_col),
        F.round(interp, 6).alias("value_interp"),
    )


def ewma(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    alpha: float = 0.2,
    max_lag: int = 8,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Exponentially-weighted moving average per key, bounded-lag form:
    ``y_i = Σ_{l<L} (1−α)^l·x_{i−l} / Σ_{l<L} (1−α)^l`` over the lags
    that exist and are non-null.  The unbounded recursion ``y_i = α·x_i
    + (1−α)·y_{i−1}`` is inherently sequential (and its closed form
    overflows ``(1−α)^{−i}``); truncating at ``max_lag`` bounds the
    omitted mass at ``(1−α)^L`` (0.17 for the defaults) while keeping
    the operator ONE window pass — ``max_lag`` lag() columns over a
    single partition sort, no self-join, no recursion, trivially
    distributed.

    Weights are Python-float literals baked into the plan, so an oracle
    embedding the same literals reproduces the arithmetic exactly.
    Null values contribute to neither numerator nor denominator; a row
    whose trailing window is all-null yields NULL (try_divide).
    """
    weights = [(1.0 - alpha) ** l for l in range(max_lag)]
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    v = F.col(value_col).cast("double")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for l, wt in enumerate(weights):
        x = F.lag(v, l).over(w)
        num = num + F.lit(wt) * F.coalesce(x, F.lit(0.0))
        den = den + F.when(x.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    keep = [*key_cols, ts_col, value_col] + ([order_tiebreak] if order_tiebreak else [])
    return df.select(*keep).withColumn("ewma", F.round(F.try_divide(num, den), 6))


def winsorize(
    df: DataFrame,
    key_cols: list[str],
    value_col: str = "value",
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Clip a numeric column at per-group exact interpolated quantiles —
    the robust-scaling step that keeps a fat-tailed feature from
    dominating training statistics, without dropping the rows the way a
    filter would.

    Plan: ONE grouped exact-percentile aggregate (rows per group:
    exactly one) broadcast back onto the data — the big side is touched
    map-only, no shuffle of the corpus.  At 100 TB swap
    ``F.percentile`` for ``percentile_approx`` if the per-group sort
    memory bites; the operator shape is unchanged.

    Adds ``value_winsorized`` and a ``clipped`` flag; NULL values pass
    through unclipped with ``clipped = false``.
    """
    v = F.col(value_col).cast("double")
    # bounds rounded to 1e-6 (the operator's own output precision): the
    # quantile interpolation differs across engines in the final ulp at
    # ~1e5 rows per group, which otherwise flips boundary rows' clipping
    bounds = df.groupBy(*key_cols).agg(
        F.round(F.percentile(v, lower), 6).alias("__lo"),
        F.round(F.percentile(v, upper), 6).alias("__hi"),
    )
    out = df.join(F.broadcast(bounds), key_cols)
    # greatest/least IGNORE nulls (a null value would collapse to the
    # lower bound) — gate the clip on non-null explicitly
    clipped_v = F.when(
        v.isNotNull(), F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    )
    return out.select(
        *df.columns,
        F.round(clipped_v, 6).alias("value_winsorized"),
        F.coalesce((v < F.col("__lo")) | (v > F.col("__hi")), F.lit(False)).alias("clipped"),
    )


def pane_sliding_distinct(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    range_ms: int = 6 * 3_600_000,
    step_ms: int = 3_600_000,
    lgk: int = 14,
) -> DataFrame:
    """Approximate sliding-window DISTINCT count via pane HLL sketches.

    COUNT(DISTINCT) does not pane-merge exactly (`sliding_pane_spec`
    rightly refuses it), but HLL sketches union losslessly — so the pane
    pattern applies to the *sketch*: one ~2^lgk-byte sketch per
    (key, pane), replicated into ``range/step`` windows and unioned.
    Versus the exact plan (every event replicated into every window it
    touches, then a full distinct shuffle per window), the shuffle
    carries only sketch binaries.  Error follows the HLL contract
    (~0.8% at lgK=14; pinned loosely in tests against the exact gate).
    """
    if range_ms % step_ms != 0:
        raise ValueError("range_ms must be a multiple of step_ms (pane = step)")
    n_panes = range_ms // step_ms
    pane = F.floor(F.col(ts_col) / F.lit(step_ms)).cast("long")
    partials = (
        df.select(*key_cols, ts_col, value_col)
        .withColumn("pane", pane)
        .groupBy(*key_cols, "pane")
        .agg(F.hll_sketch_agg(value_col, F.lit(lgk)).alias("hll"))
    )
    win = F.explode(F.sequence(F.col("pane") - F.lit(n_panes - 1), F.col("pane"))).alias("w")
    return (
        partials.select(*key_cols, win, "hll")
        .groupBy(*key_cols, "w")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("approx_distinct"))
        .withColumn("window_start", (F.col("w") * F.lit(step_ms)).cast("long"))
        .drop("w")
    )


def pane_sliding_distinct_det(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    range_ms: int = 6 * 3_600_000,
    step_ms: int = 3_600_000,
    p: int = 12,
) -> DataFrame:
    """:func:`pane_sliding_distinct` over the deterministic md5-HLL
    (functions/sketches.hll_det_*) instead of Datasketches binaries.

    Same pane pattern — sketch per (key, pane), replicated into the
    ``range/step`` windows, merged — but the sketch state is plain
    (register, max_rank) rows, so the merge is ``max(rank)`` per
    register and the whole computation (estimate included) is
    reproducible in ANSI SQL: the gate is oracle-EXACT, and the pane
    partials are portable (any engine can roll them up from parquet).
    Shuffle bound: ≤ 2^p register rows per (key, pane) — heavier than a
    2^lgK-byte binary by a small constant, same asymptotics.
    """
    from janus_spark.functions.sketches import hll_det_estimate, hll_det_partials

    if range_ms % step_ms != 0:
        raise ValueError("range_ms must be a multiple of step_ms (pane = step)")
    n_panes = range_ms // step_ms
    pane = F.floor(F.col(ts_col) / F.lit(step_ms)).cast("long")
    tagged = df.select(*key_cols, F.col(value_col).alias("__v"), pane.alias("pane"))
    partials = hll_det_partials(tagged, "__v", [*key_cols, "pane"], p)
    win = F.explode(F.sequence(F.col("pane") - F.lit(n_panes - 1), F.col("pane"))).alias("w")
    merged = (
        partials.select(*key_cols, win, "reg", "max_rank")
        .groupBy(*key_cols, "w", "reg")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    out = hll_det_estimate(merged, [*key_cols, "w"], p)
    return out.withColumn("window_start", (F.col("w") * F.lit(step_ms)).cast("long")).drop("w")


def pane_sliding_percentile(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    range_ms: int = 6 * 3_600_000,
    step_ms: int = 3_600_000,
    probs: tuple[float, ...] = (0.5, 0.95, 0.99),
    vmin: float = 0.0,
    vmax: float = 600.0,
    n_bins: int = 600,
) -> DataFrame:
    """Sliding-window percentiles via mergeable fixed-width HISTOGRAM
    sketches — the pane path for the one aggregate family
    ``sliding_pane_spec`` rightly refuses (quantiles don't two-level
    merge, and Spark does not expose percentile_approx's partial digest
    as a storable column the way it does HLL sketches).

    A fixed-bin histogram IS a mergeable quantile sketch: pane partials
    are (bin, count) rows, the pane→window rollup is a counts sum, and
    the p-quantile is read off the window CDF.  Error is bounded by the
    bin width ((vmax−vmin)/n_bins, the returned value is the bin
    midpoint); values outside [vmin, vmax] clamp into the edge bins.
    Versus the exact plan the shuffle carries at most ``n_bins`` rows
    per (key, pane) instead of every event — and unlike T-digest the
    arithmetic is deterministic integer counting, so the gate is
    oracle-EXACT in DuckDB, not merely error-bound-tested.

    Windows are ``[w*step, w*step + range)`` per key, emitted iff
    non-empty; returns one row per (key, window) with ``n_events`` and
    one ``p{NN}`` column per requested quantile (rank ``ceil(p*N)`` of
    the CDF, the standard lower-quantile definition).
    """
    if range_ms % step_ms != 0:
        raise ValueError("range_ms must be a multiple of step_ms (pane = step)")
    n_panes = range_ms // step_ms
    width = (vmax - vmin) / n_bins
    pane = F.floor(F.col(ts_col) / F.lit(step_ms)).cast("long")
    bin_ = F.least(
        F.greatest(F.floor((F.col(value_col) - F.lit(vmin)) / F.lit(width)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("long")
    partials = (
        df.select(*key_cols, ts_col, value_col)
        .where(F.col(value_col).isNotNull())
        .withColumn("pane", pane)
        .withColumn("bin", bin_)
        .groupBy(*key_cols, "pane", "bin")
        .agg(F.count("*").alias("cnt"))
    )
    win = F.explode(F.sequence(F.col("pane") - F.lit(n_panes - 1), F.col("pane"))).alias("w")
    hist = (
        partials.select(*key_cols, win, "bin", "cnt")
        .groupBy(*key_cols, "w", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return (
        quantiles_from_binned(hist, [*key_cols, "w"], probs, vmin, width)
        .withColumn("window_start", (F.col("w") * F.lit(step_ms)).cast("long"))
        .drop("w")
    )


def quantiles_from_binned(
    hist: DataFrame,
    part_cols: list[str],
    probs: tuple[float, ...],
    vmin: float,
    width: float,
) -> DataFrame:
    """Quantiles off a binned histogram frame ``(part_cols…, bin, cnt)``:
    CDF per partition, rank ``ceil(p·N)`` (standard lower quantile),
    value = bin midpoint.  Shared finisher for the batch pane path and
    the streaming histogram sink — deterministic integer counting, so
    both are oracle-EXACT."""
    w_cum = (
        Window.partitionBy(*part_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*part_cols)
    cdf = hist.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "total", F.sum("cnt").over(w_all)
    )
    aggs = [F.max("total").cast("long").alias("n_events")]
    for p in probs:
        rank = F.ceil(F.lit(p) * F.col("total"))
        b = F.min(F.when(F.col("cum") >= rank, F.col("bin")))
        aggs.append(
            F.round(F.lit(vmin) + (b + 0.5) * F.lit(width), 6).alias(f"p{round(p * 100)}")
        )
    return cdf.groupBy(*part_cols).agg(*aggs)


def pane_sliding_agg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    range_ms: int = 6 * 3_600_000,
    step_ms: int = 3_600_000,
) -> DataFrame:
    """Sliding-window COUNT/SUM/MIN/MAX/AVG per key via pane partials.

    Windows are ``[w*step, w*step + range)`` for every integer w; a window
    is emitted iff it contains at least one event.  Requires
    ``range_ms % step_ms == 0`` (pane = step).

    Plan shape: one map-side-combinable groupBy (key, pane) over the raw
    events, an explode of ``range/step`` window ids per pane *partial*,
    then the pane→window rollup groupBy.  Only aggregates with a
    merge function survive the two-level split (COUNT/SUM/MIN/MAX and
    AVG = SUM/COUNT here; quantiles would need the sketch path in
    `functions/sketches.py`).
    """
    if range_ms % step_ms != 0:
        raise ValueError("range_ms must be a multiple of step_ms (pane = step)")
    n_panes = range_ms // step_ms
    pane = F.floor(F.col(ts_col) / F.lit(step_ms)).cast("long")
    partials = (
        df.select(*key_cols, ts_col, value_col)
        .withColumn("pane", pane)
        .groupBy(*key_cols, "pane")
        .agg(
            F.count("*").alias("p_n"),
            # AVG denominator counts non-null values only (SQL AVG
            # semantics); p_n stays COUNT(*) for n_events
            F.count(value_col).alias("p_cnt"),
            F.sum(value_col).alias("p_sum"),
            F.min(value_col).alias("p_min"),
            F.max(value_col).alias("p_max"),
        )
    )
    # pane p ⊂ window w  ⇔  w ∈ [p − n_panes + 1, p]
    win = F.explode(F.sequence(F.col("pane") - F.lit(n_panes - 1), F.col("pane"))).alias("w")
    return (
        partials.select(*key_cols, win, "p_n", "p_cnt", "p_sum", "p_min", "p_max")
        .groupBy(*key_cols, "w")
        .agg(
            F.sum("p_n").cast("long").alias("n_events"),
            F.round(F.sum("p_sum"), 6).alias("sum_v"),
            F.round(F.min("p_min"), 6).alias("min_v"),
            F.round(F.max("p_max"), 6).alias("max_v"),
            F.round(F.sum("p_sum") / F.sum("p_cnt"), 6).alias("avg_v"),
        )
        .withColumn("window_start", (F.col("w") * F.lit(step_ms)).cast("long"))
        .drop("w")
    )


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    state_col: str,
    ts_col: str = "ts_ms",
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history: collapse an event log
    into validity intervals per key — one row per *state change*, with
    ``valid_from`` (inclusive) and ``valid_to`` (exclusive, NULL while
    current).  Consecutive events with the same state merge into one
    interval; an as-of join against the result answers "state at time T"
    (see operators/asof.py).

    Scale: two window passes over the same (key, order) partitioning —
    Catalyst plans ONE shuffle and one sort for both (change detection
    via lag, interval close via lead on the filtered changes).  ``tie_cols``
    break ordering ties for same-timestamp events (required for a
    deterministic history)."""
    from pyspark.sql.window import Window as W

    order = [F.col(ts_col)] + [F.col(c) for c in (tie_cols or [])]
    w = W.partitionBy(*key_cols).orderBy(*order)
    changed = df.withColumn("__prev", F.lag(state_col).over(w)).where(
        F.col("__prev").isNull() | (F.col(state_col) != F.col("__prev"))
    )
    w2 = W.partitionBy(*key_cols).orderBy(ts_col)
    return changed.select(
        *key_cols,
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )


def cusum(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    target: float | None = None,
    drift: float = 0.0,
    threshold: float | None = None,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Two-sided CUSUM change detection (Page 1954) as ONE window pass.

    The textbook recursion ``S⁺_i = max(0, S⁺_{i−1} + (x_i − μ − κ))`` is
    sequential, but it has a prefix closed form: with ``P_i = Σ_{j≤i}
    (x_j − μ − κ)``, ``S⁺_i = P_i − min(0, min_{j≤i} P_j)`` — a running
    sum plus a running min, both single ordered-window aggregates, so
    the operator distributes (one sort per key partition, no recursion,
    no self-join).  Same construction mirrored for S⁻.

    ``target=None`` uses the per-key mean (one unordered window AVG).
    ``threshold`` (in the same units; classic choice 4–5σ) adds a
    boolean ``alarm`` column.  Outputs round to 6 dp — prefix sums are
    order-deterministic (ordered-frame aggregation is sequential in any
    engine), so an ANSI-SQL oracle reproduces them exactly.
    """
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v = F.col(value_col).cast("double")
    mu = F.lit(float(target)) if target is not None else F.avg(v).over(Window.partitionBy(*key_cols))
    d_pos = v - mu - F.lit(drift)
    d_neg = mu - v - F.lit(drift)
    keep = [*key_cols, ts_col, value_col] + ([order_tiebreak] if order_tiebreak else [])
    # window-of-window isn't a thing: materialize the prefix sums, then
    # take the running min in a second projection (Catalyst plans both
    # over the SAME shuffle+sort — one exchange total)
    staged = df.select(
        *keep, F.sum(d_pos).over(run).alias("__pp"), F.sum(d_neg).over(run).alias("__pn")
    )
    s_pos = F.col("__pp") - F.least(F.lit(0.0), F.min("__pp").over(run))
    s_neg = F.col("__pn") - F.least(F.lit(0.0), F.min("__pn").over(run))
    out = staged.select(
        *keep,
        F.round(s_pos, 6).alias("s_pos"),
        F.round(s_neg, 6).alias("s_neg"),
    )
    if threshold is not None:
        out = out.withColumn(
            "alarm", (F.col("s_pos") > F.lit(threshold)) | (F.col("s_neg") > F.lit(threshold))
        )
    return out


def autocorr(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    lags: tuple[int, ...] = (1, 2, 3),
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-key lag-k autocorrelation: Pearson corr(x_i, x_{i−k}) over the
    ts-ordered series, one window pass to materialize the lags plus one
    aggregation for all requested lags together.  Null pairs (series
    head, null values) drop out of each corr, matching SQL CORR.  Seasonal
    structure shows up as peaks at the season's lag; the companion of the
    EWMA/MAD anomaly family for periodicity discovery."""
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    v = F.col(value_col).cast("double")
    lagged = df.select(
        *key_cols, v.alias("__v"), *[F.lag(v, k).over(w).alias(f"__l{k}") for k in lags]
    )
    return lagged.groupBy(*key_cols).agg(
        *[F.round(F.corr("__v", f"__l{k}"), 6).alias(f"ac{k}") for k in lags]
    )


def decompose(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    period_col=None,
    trend_window: int = 12,
    order_tiebreak: str | None = None,
    round_dp: int = 4,
    in_scale: int = 2,
) -> DataFrame:
    """Classical additive decomposition: value = trend + seasonal +
    residual.

    * trend: centered moving average over ``2·trend_window+1`` rows —
      one ordered window pass per key.
    * seasonal: per (key, period-bucket) mean minus the per-key grand
      mean (seasonal-means method; ``period_col`` defaults to
      hour-of-day of an epoch-millis ts) — components sum to ~0 across
      buckets by construction.
    * residual: what's left.

    BIT-REPRODUCIBLE BY CONSTRUCTION: inputs are quantized to
    ``in_scale`` decimals (their true precision), every mean is an
    exact integer sum with a sign-aware integer round-division to
    ``round_dp`` decimals, and the only float op is one final division
    by 10^round_dp.  No double is ever *rounded*, which is where
    engines disagree (Java rounds the shortest decimal representation,
    exact-binary engines round the bits: means like 286.59/8 =
    35.82375 land exactly ON the 4-dp boundary and flip).  Identical
    output on any engine, partitioning, or run order — the property
    that lets a DuckDB oracle gate this operator EXACTLY, and that
    makes nightly corpus-metric diffs trustworthy at 100 TB.

    Window specs share the key partitioning — one sort total.
    Requires ``round_dp >= in_scale``.
    """
    if round_dp < in_scale:
        raise ValueError("round_dp must be >= in_scale")
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(-trend_window, trend_window)
    )
    per = period_col if period_col is not None else F.hour(F.timestamp_millis(F.col(ts_col)))
    keep = [*key_cols, ts_col, value_col] + ([order_tiebreak] if order_tiebreak else [])
    k = 10 ** (round_dp - in_scale)
    scale = float(10 ** round_dp)

    u = F.round(F.col(value_col).cast("double") * F.lit(float(10 ** in_scale)), 0).cast("long")
    staged = df.select(*keep, per.alias("__per"), u.alias("__u"))
    wseason = Window.partitionBy(*key_cols, "__per")
    wall = Window.partitionBy(*key_cols)
    staged = (
        staged.withColumn("__tn", F.sum("__u").over(w))
        .withColumn("__tc", F.count("__u").over(w))
        .withColumn("__sn", F.sum("__u").over(wseason))
        .withColumn("__sc", F.count("__u").over(wseason))
        .withColumn("__gn", F.sum("__u").over(wall))
        .withColumn("__gc", F.count("__u").over(wall))
    )
    # trend_units = round(tn*k/tc); seasonal_units = round((sn*gc - gn*sc)*k/(sc*gc))
    # Sign-aware: `div` truncates toward zero while the oracle's `//`
    # floors, so keep the round-division numerator non-negative and
    # negate outside (round-half-away-from-zero, identical cross-engine
    # for negative-valued series — temperatures, deltas).
    trend_u = F.when(
        F.col("__tn") >= 0, F.expr(f"(__tn * {2 * k} + __tc) div (2 * __tc)")
    ).otherwise(-F.expr(f"((-__tn) * {2 * k} + __tc) div (2 * __tc)"))
    snum = F.col("__sn") * F.col("__gc") - F.col("__gn") * F.col("__sc")
    sden = F.col("__sc") * F.col("__gc")
    seas_u = F.when(
        snum >= 0, F.expr(f"((__sn * __gc - __gn * __sc) * {2 * k} + __sc * __gc) div (2 * __sc * __gc)")
    ).otherwise(
        -F.expr(f"((__gn * __sc - __sn * __gc) * {2 * k} + __sc * __gc) div (2 * __sc * __gc)")
    )
    staged = staged.withColumn("__t4", trend_u).withColumn("__s4", seas_u)
    res_u = F.col("__u") * F.lit(k) - F.col("__t4") - F.col("__s4")
    return staged.select(
        *keep,
        F.col("__per").alias("period_bucket"),
        (F.col("__t4") / F.lit(scale)).alias("trend"),
        (F.col("__s4") / F.lit(scale)).alias("seasonal"),
        (res_u / F.lit(scale)).alias("residual"),
    )


def linreg_trend(
    df: DataFrame,
    key_cols: list[str],
    x_col: str = "ts_ms",
    value_col: str = "value",
    round_out: int = 6,
    slope_unit: int = 1,
) -> DataFrame:
    """Per-key OLS trend line of ``value`` over ``x`` (slope, intercept,
    r²) in ONE grouped aggregate — the closed-form normal equations, no
    iteration, no window.

    Exactness contract (cross-engine bit-reproducible): ``x`` must be an
    integer column (epoch ms, already rebased by the caller if needed)
    and ``value`` exact at 2 decimals.  All five moment sums
    (Σx, Σy, Σxy, Σx², Σy²) are accumulated as DECIMAL(38,0) integers —
    value in cents via an exact decimal cast — so the sums are
    order-free; slope/intercept/r² are then a fixed tree of double ops
    over identical integer operands in both engines, rounded once.

    Scale: one map-side-combinable shuffle on the key; the output is one
    row per key.  This is the distributed form of the reference's
    per-window regression (src/query/window_stats.rs) without the
    per-window re-scan.

    Returns key_cols + (n, slope, intercept, r2); slope is in value
    units per ``slope_unit`` x-units (pass 86_400_000 for per-day slopes
    over epoch-ms x — an epoch-ms slope rounds to 0 at 6 dp otherwise).
    Degenerate keys (n < 2 or zero x-variance) yield NULL
    slope/intercept/r2.
    """
    d38 = "decimal(38,0)"
    x = F.col(x_col).cast(d38)
    y = (F.col(value_col).cast("decimal(18,2)") * 100).cast(d38)  # cents
    g = df.where(F.col(value_col).isNotNull()).groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast(d38).alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
    )
    return ols_from_moments(g, key_cols, slope_unit=slope_unit, round_out=round_out)


def ols_from_moments(
    moments: DataFrame,
    keep_cols: list[str],
    slope_unit: int = 1,
    round_out: int = 6,
) -> DataFrame:
    """Finish an OLS fit from exact integer moment sums — the shared
    tail of the batch (`linreg_trend`) and streaming
    (`streaming.native_agg.moment_stream`) regression paths.

    Expects columns ``__n __sx __sy __sxy __sxx __syy`` (DECIMAL(38,0),
    y in cents).  Because the moments are order-free integers and this
    finisher is a fixed tree of double ops, slope/intercept/r² are
    engine-exact at ``round_out`` dp.
    """
    # exact integer covariance/variance numerators (×n), then doubles
    covn = (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    vxn = (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    vyn = (F.col("__n") * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast("double")
    nd = F.col("__n").cast("double")
    slope_c = covn / vxn  # cents per x-unit
    ok = (F.col("__n") >= 2) & (vxn > 0)
    slope = F.when(ok, F.round(slope_c * F.lit(float(slope_unit)) / 100, round_out))
    intercept = F.when(
        ok, F.round((F.col("__sy").cast("double") - slope_c * F.col("__sx").cast("double")) / nd / 100, round_out)
    )
    r2 = F.when(ok & (vyn > 0), F.round(covn * covn / (vxn * vyn), round_out))
    return moments.select(
        *keep_cols,
        F.col("__n").cast("long").alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def cross_corr(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts_ms",
    value_col: str = "value",
    bucket_ms: int = 3_600_000,
    round_out: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlation between per-key value series, aligned
    on a common time bucket (inner alignment: buckets where BOTH series
    have data).  "Do temperature and pressure move together?" across
    sensor streams.

    Plan: ONE aggregation of the raw table to per-(key, bucket) sums,
    then a self-join of that aggregate frame on the bucket with
    ``key_a < key_b`` — the joined frame is (n_buckets × n_keys)-sized,
    i.e. tiny relative to the event table at any scale; the raw scan is
    never self-joined.  Moment sums over the pairs are DECIMAL(38,0)
    integers (values in exact cents), so the whole pipeline is order-free
    and the final correlation is one fixed double tree — cross-engine
    exact at 6 dp.

    Returns (key_a, key_b, n_buckets, corr); degenerate pairs (fewer
    than 2 common buckets or a zero-variance side) yield NULL corr.
    """
    d38 = "decimal(38,0)"
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast(d38)
    h = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(
            F.col(key_col).alias("k"),
            (F.col(ts_col).cast("long") / F.lit(bucket_ms)).cast("long").alias("b"),
        )
        .agg(F.sum(cents).alias("s"))
    )
    a, bdf = h.alias("a"), h.alias("b")
    pairs = a.join(
        bdf, (F.col("a.b") == F.col("b.b")) & (F.col("a.k") < F.col("b.k"))
    ).select(
        F.col("a.k").alias("key_a"),
        F.col("b.k").alias("key_b"),
        F.col("a.s").alias("x"),
        F.col("b.s").alias("y"),
    )
    g = pairs.groupBy("key_a", "key_b").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    covn = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vxn = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vyn = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    ok = (F.col("n") >= 2) & (vxn > 0) & (vyn > 0)
    corr = F.when(ok, F.round(covn / F.sqrt(vxn * vyn), round_out))
    return g.select(
        "key_a", "key_b", F.col("n").cast("long").alias("n_buckets"), corr.alias("corr")
    )
