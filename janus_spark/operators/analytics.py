"""Behavioral-analytics operators: ordered funnels, cohort retention,
robust (median/MAD) outlier flagging.

These are the product-analytics shapes a warehouse team runs daily over
event streams; each is expressed as grouped aggregates + broadcast-sized
joins so the event table itself is never self-joined row-to-row.

Scale notes (100 TB): funnel steps chain k−1 joins of per-user aggregate
frames (≤ n_users rows each) keyed identically on the user — Catalyst
reuses the hash partitioning across the chain, so the event scan shuffles
once per step at most and the big table is only ever filtered+aggregated.
Cohort retention is two aggregates over the scan joined on the user key.
MAD is two grouped exact percentiles broadcast back map-only.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    event_col: str = "event_type",
    within_ms: int | None = None,
) -> DataFrame:
    """Ordered conversion funnel: a user reaches step k at the EARLIEST
    event of type ``steps[k]`` that is strictly after their step-(k−1)
    time (and within ``within_ms`` of their step-1 time, if given).
    Earliest-completion semantics: greedily taking the minimum valid
    timestamp at every step is optimal — if any assignment completes the
    funnel, the greedy one does.

    Returns one row per step: ``(step, step_name, n_users)`` with
    ``n_users`` monotonically non-increasing down the funnel.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = df.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).cast("long").alias("t"),
        F.col(event_col).alias("e"),
    )
    # each step's reached-state is USER-cardinality — checkpoint it so the
    # per-step count rows don't re-derive every earlier step's join (the
    # event scans keep their pushed-down per-step type filters; only the
    # small state is materialized)
    reached = (
        ev.where(F.col("e") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("t1"))
        .withColumn("tk", F.col("t1"))
        .localCheckpoint(eager=False)
    )
    counts = [(1, steps[0], reached)]
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            ev.where(F.col("e") == step)
            .join(reached.select("u", "t1", "tk"), "u")
            .where(F.col("t") > F.col("tk"))
        )
        if within_ms is not None:
            nxt = nxt.where(F.col("t") <= F.col("t1") + F.lit(within_ms))
        reached = nxt.groupBy("u").agg(
            F.max("t1").alias("t1"), F.min("t").alias("tk")
        ).localCheckpoint(eager=False)
        counts.append((i, step, reached))
    rows = None
    for i, name, frame in counts:
        c = frame.agg(F.count("*").alias("n_users")).select(
            F.lit(i).cast("long").alias("step"),
            F.lit(name).alias("step_name"),
            F.col("n_users").cast("long"),
        )
        rows = c if rows is None else rows.unionByName(c)
    return rows


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    period_ms: int = 7 * 24 * 3_600_000,
) -> DataFrame:
    """Cohort retention: users grouped by their first-activity period,
    counted in every later period they were active.  Output one row per
    ``(cohort_period, period_offset)`` with ``n_active`` distinct users;
    offset 0 is the cohort size itself.

    Two aggregates over the scan (first-seen per user; distinct active
    (user, period) pairs) joined on the user key — the join inputs are
    both user-cardinality, never event-cardinality.
    """
    # integer DIV, not floor(float division): at ms timestamps a double
    # quotient can land a hair under an exact boundary
    first = (
        df.select(F.col(user_col).alias("u"), F.col(ts_col).cast("long").alias("t"))
        .groupBy("u")
        .agg(F.expr(f"min(t) DIV {period_ms}").alias("cohort"))
    )
    active = (
        df.select(
            F.col(user_col).alias("u"),
            F.col(ts_col).cast("long").alias("t"),
        )
        .select("u", F.expr(f"t DIV {period_ms}").alias("p"))
        .distinct()
    )
    return (
        active.join(first, "u")
        .groupBy(
            F.col("cohort").cast("long").alias("cohort_period"),
            (F.col("p") - F.col("cohort")).cast("long").alias("period_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_active"))
    )


def mad_outliers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str = "value",
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier flagging by median/MAD: the modified
    z-score ``0.6745·(x − median) / MAD`` (Iglewicz–Hoaglin) is immune to
    the outliers themselves inflating the threshold — the failure mode of
    mean/σ z-scores that the comparator's F3 function inherits by design.

    Two grouped exact-percentile aggregates (median, then median absolute
    deviation) broadcast back onto the data; the corpus is touched
    map-only.  Groups with MAD = 0 (over half the values identical) yield
    NULL scores (try_divide) and ``is_outlier = false`` for on-median
    rows rather than dividing by zero.

    Adds ``robust_z`` and ``is_outlier``.
    """
    v = F.col(value_col).cast("double")
    # med/mad are GROUP-cardinality: checkpoint each so the second and
    # third passes over the corpus don't re-run the earlier percentile
    # passes (three scans — the exact two-pass-median minimum plus the
    # final map-only flagging pass — instead of a recomputation tree)
    med = (
        df.groupBy(*key_cols)
        .agg(F.percentile(v, 0.5).alias("__med"))
        .localCheckpoint(eager=True)
    )
    with_med = df.join(F.broadcast(med), key_cols)
    mad = (
        with_med.where(v.isNotNull())
        .groupBy(*key_cols)
        .agg(F.percentile(F.abs(v - F.col("__med")), 0.5).alias("__mad"))
        .localCheckpoint(eager=True)
    )
    out = with_med.join(F.broadcast(mad), key_cols)
    robust_z = F.round(F.try_divide(F.lit(0.6745) * (v - F.col("__med")), F.col("__mad")), 6)
    return out.select(
        *df.columns,
        robust_z.alias("robust_z"),
        F.coalesce(F.abs(robust_z) > F.lit(k), F.lit(False)).alias("is_outlier"),
    )


def markov_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    order_cols: list[str] | None = None,
    round_p: int | None = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-key ordered event
    sequences: P(next_state | state) estimated from adjacent pairs.

    The sequence model behind session-flow analysis ("after `view`,
    42% of events are `click`") and synthetic-trace generation.

    Plan: ONE window pass per key for the lead (shuffle on ``key_col``),
    then a grouped count on (state, next_state); the per-state total is a
    second small aggregate broadcast back onto the pair counts, so the
    event table is never self-joined.  At 100 TB the only big shuffle is
    the per-key sort the lead needs — the pair-count frame is at most
    |states|² rows.

    Exactness: the probability is ONE division of two exact counts
    (order-free), so a 6-dp round is engine-reproducible.

    Returns (state, next_state, n_pairs, n_from, p).
    """
    order_cols = order_cols or ["ts_ms", "event_id"]
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    pairs = (
        df.withColumn("__next", F.lead(F.col(state_col)).over(w))
        .where(F.col("__next").isNotNull())
        .groupBy(F.col(state_col).alias("state"), F.col("__next").alias("next_state"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    totals = pairs.groupBy("state").agg(F.sum("n_pairs").alias("n_from"))
    p = F.col("n_pairs").cast("double") / F.col("n_from").cast("double")
    if round_p is not None:
        p = F.round(p, round_p)
    return pairs.join(F.broadcast(totals), "state").select(
        "state", "next_state", "n_pairs", "n_from", p.alias("p")
    )


def skyline2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_grid: int = 64,
) -> DataFrame:
    """2-D skyline (Pareto frontier, minimize both dims): the points not
    dominated by any other point (``b.x <= a.x AND b.y <= a.y`` with at
    least one strict).  The multi-objective "best tradeoffs" operator
    (cheapest-and-smallest part, fastest-and-freshest supplier).

    Plan — grid prune, then exact frontier:
      1. Bucket x into ``n_grid`` equi-width cells (map-only; bounds from
         one scalar agg).  Per-cell min-y is a tiny aggregate; the
         running min over cells strictly to the left gives a broadcast
         dominance threshold per cell.
      2. Map-side filter: drop every point with ``y >= threshold(cell)``
         — any such point is dominated by the cell-min witness to its
         left.  At 100 TB this discards almost everything without a
         shuffle of the full table (survivors are O(frontier × grid
         resolution), not O(n)).
      3. Exact pass on the survivors: per-x min-y, then a single ordered
         running-min over distinct x (frontier-sized, fits one task).

    Equal points tie-break: duplicates of a frontier point are all kept
    (neither strictly dominates); within an x group only min-y rows
    survive.  Returns DISTINCT frontier points (x, y).
    """
    pts = df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y")).where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )
    b = pts.agg(F.min("x").alias("lo"), F.max("x").alias("hi")).collect()[0]
    lo, hi = b["lo"], b["hi"]
    span = (hi - lo) or 1
    cell = F.least(
        F.lit(n_grid - 1), F.floor((F.col("x") - F.lit(lo)) * n_grid / F.lit(span))
    ).cast("long")
    cells = (
        pts.groupBy(cell.alias("c"))
        .agg(F.min("y").alias("cy"))
        .collect()
    )
    # running min of cell-min-y over cells strictly left of c → per-cell
    # dominance threshold (a point in cell c with y >= thr[c] is dominated
    # by some point in a strictly-smaller cell, hence strictly smaller x).
    run, thr = None, {}
    for row in sorted(cells, key=lambda r: r["c"]):
        thr[row["c"]] = run
        run = row["cy"] if run is None else min(run, row["cy"])
    if any(v is not None for v in thr.values()):
        thr_map = F.create_map(
            *[F.lit(v) for kv in thr.items() if kv[1] is not None for v in kv]
        )
        thr_col = F.element_at(thr_map, cell)
        keep = thr_col.isNull() | (F.col("y") < thr_col)
        survivors = pts.where(keep)
    else:
        survivors = pts
    per_x = survivors.groupBy("x").agg(F.min("y").alias("y"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    return (
        per_x.withColumn("__pm", F.min("y").over(w))
        .where(F.col("__pm").isNull() | (F.col("y") < F.col("__pm")))
        .select("x", "y")
    )


def attribution(
    df: DataFrame,
    conversion_type: str,
    touch_type: str,
    campaign_col: str = "campaign",
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    type_col: str = "event_type",
    value_col: str = "value",
    lookback_ms: int | None = None,
    model: str = "last",
    tie_col: str = "event_id",
) -> DataFrame:
    """Marketing touch attribution: credit each conversion's value to a
    touch event's campaign — ``model='last'`` (most recent touch at or
    before the conversion, optionally within ``lookback_ms``) or
    ``'first'`` (the user's earliest touch before the conversion).

    ONE window pass over the per-user ordered stream (running
    last/first of a (ts, campaign) struct with ignorenulls) — no
    touch×conversion self-join, so a user's cost is a sort run, never a
    cross product; the grouped credit rollup after it is
    campaign-cardinality-sized.  Conversions with no qualifying touch
    are credited to campaign NULL ("unattributed") rather than dropped.

    Returns (campaign, n_conversions, revenue) with revenue an exact
    cents sum finished once.
    """
    if model not in ("last", "first"):
        raise ValueError(f"unknown attribution model: {model}")
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(tie_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(
        F.col(type_col) == touch_type,
        F.struct(F.col(ts_col).alias("t"), F.col(campaign_col).alias("c")),
    )
    picked = F.last(touch, ignorenulls=True) if model == "last" else F.first(
        touch, ignorenulls=True
    )
    ev = df.where(F.col(type_col).isin(conversion_type, touch_type))
    conv = (
        ev.withColumn("__touch", picked.over(w))
        .where(F.col(type_col) == conversion_type)
    )
    qualified = F.col("__touch").isNotNull()
    if lookback_ms is not None:
        qualified = qualified & (
            F.col(ts_col) - F.col("__touch.t") <= F.lit(lookback_ms)
        )
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("decimal(38,0)")
    return (
        conv.select(
            F.when(qualified, F.col("__touch.c")).alias("campaign"),
            cents.alias("__cents"),
        )
        .groupBy("campaign")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.round(F.sum("__cents").cast("double") / 100, 2).alias("revenue"),
        )
    )


def skyline(
    df: DataFrame,
    cols: list[str],
    max_frontier: int = 100_000,
) -> DataFrame:
    """d-dimensional skyline (minimize every column in ``cols``): points
    not dominated by any other (all coords ≤, at least one <).

    Plan — sample-witness prune, then exact pairwise pass on survivors:
      1. A single scalar agg picks the strongest witness point (argmin of
         the SUM of per-dimension min-max-normalized coords — the point
         most likely to dominate broadly).  Its coords broadcast as plan
         literals; every point it strictly dominates is discarded
         MAP-SIDE.  On anything but adversarial data this removes the
         overwhelming bulk (everything "inside" the frontier).
      2. The survivors are checked exactly with a NOT-EXISTS-style
         left-anti self-join.  Survivor count is frontier-scale, not
         corpus-scale, so the quadratic step runs on a frame that fits
         broadcast; ``max_frontier`` guards the assumption and raises
         rather than silently running an O(n²) join on corpus-sized
         survivors (raise the cap deliberately, or pre-reduce dims).

    For d=2 prefer :func:`skyline2d` (fully linear, no pairwise step).
    Returns DISTINCT frontier points.
    """
    pts = df.select(*[F.col(c) for c in cols]).where(
        F.lit(True) & F.expr(" AND ".join(f"{c} IS NOT NULL" for c in cols))
    ).distinct()
    b = pts.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    score = None
    for c in cols:
        lo, hi = float(b[f"lo_{c}"]), float(b[f"hi_{c}"])
        span = (hi - lo) or 1.0
        t = (F.col(c).cast("double") - F.lit(lo)) / F.lit(span)
        score = t if score is None else score + t
    witness = pts.orderBy(score.asc(), *[F.col(c) for c in cols]).limit(1).collect()[0]
    dominated = F.lit(True)
    strict = F.lit(False)
    for c in cols:
        w = F.lit(witness[c])
        dominated = dominated & (w <= F.col(c))
        strict = strict | (w < F.col(c))
    survivors = pts.where(~(dominated & strict))
    n = survivors.count()
    if n > max_frontier:
        raise ValueError(
            f"{n} prune survivors exceed max_frontier={max_frontier}; "
            "raise the cap or reduce dimensions"
        )
    a = survivors.alias("a")
    bdf = F.broadcast(survivors.alias("b"))
    dom = F.lit(True)
    st = F.lit(False)
    for c in cols:
        dom = dom & (F.col(f"b.{c}") <= F.col(f"a.{c}"))
        st = st | (F.col(f"b.{c}") < F.col(f"a.{c}"))
    return a.join(bdf, dom & st, "left_anti").select(*cols)


_CEP_META = set("+*?|(){}[]^$")
# digits and ',' are regex meta ONLY inside a {m,n} quantifier; outside
# braces they are literal chars and must be declared symbols like any
# other (a stray 'v7p' digit would otherwise pass validation and
# silently never match)
_CEP_BRACES = re.compile(r"\{[0-9,]*\}")


def validate_cep_pattern(pattern: str, symbols: dict[str, str]) -> None:
    """Reject regex constructs that could match the '\\x01' gap char —
    gaps must stay unmatchable or interleaved undeclared events stop
    breaking adjacency.  '.', negated classes, and escapes all match
    arbitrary bytes; every literal char must be a declared symbol."""
    if "." in pattern:
        raise ValueError(
            "CEP pattern must not contain '.': it matches the gap char; "
            "declare an explicit wildcard symbol instead"
        )
    if "[^" in pattern:
        raise ValueError("negated character classes would match the gap char")
    if "\\" in pattern:
        raise ValueError("escape sequences are not allowed in CEP patterns")
    alphabet = set(symbols.values())
    # strip {m,n} quantifiers first so their digits/commas aren't
    # treated as declared-symbol candidates, then require every
    # remaining char (digits included) to be declared or structural
    stripped = _CEP_BRACES.sub("", pattern)
    bad = sorted(c for c in set(stripped) if c not in alphabet and c not in _CEP_META)
    if bad:
        raise ValueError(f"pattern chars {bad!r} are not declared symbols")


def match_pattern(
    df: DataFrame,
    pattern: str,
    symbols: dict[str, str],
    key_col: str = "user_id",
    ts_col: str = "ts_ms",
    event_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """Sequence pattern matching over per-key event streams
    (MATCH_RECOGNIZE-lite / CEP): count non-overlapping occurrences of a
    regex ``pattern`` over single-character event symbols — e.g.
    ``pattern="vc+p"`` with ``symbols={"view": "v", "click": "c",
    "purchase": "p"}`` finds view → one-or-more clicks → purchase runs.

    Events not in ``symbols`` become gap characters ('\\x01') that break
    literal-symbol adjacency — ``vc+p`` will NOT match across an
    interleaved error event.  The pattern alphabet is validated to the
    declared symbols plus quantifiers/grouping: '.', negated classes,
    and escapes are rejected because they would match the gap char and
    silently void the adjacency contract.  (Declare an explicit wildcard
    symbol in ``symbols`` if gaps should be allowed.)

    Plan: ONE grouped aggregate per key — collect (ts, tie, sym)
    structs, ``array_sort`` (struct field order gives the (ts, tie)
    event order), project the symbol chars, join to a string — then the
    regex engine counts matches map-side.  No window, no join, no
    iteration; per-key memory is that key's event count (keys with
    pathological volumes should be pre-windowed — the standard CEP
    partition contract).  Greedy quantifiers on an alternation-free
    alphabet give identical non-overlapping counts in any regex engine,
    which is what keeps the gate oracle-EXACT.

    Returns (key, n_events, n_matches) with n_matches > 0 only.
    """
    validate_cep_pattern(pattern, symbols)
    sym = F.lit("\x01")
    for name, ch in symbols.items():
        if len(ch) != 1:
            raise ValueError(f"symbol for {name!r} must be one char, got {ch!r}")
        sym = F.when(F.col(event_col) == name, F.lit(ch)).otherwise(sym)
    ev = F.struct(
        F.col(ts_col).alias("t"), F.col(tie_col).alias("k"), sym.alias("c")
    )
    per_key = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(ev)), lambda x: x["c"]), ""
        ).alias("__s"),
    )
    n = F.regexp_count(F.col("__s"), F.lit(pattern))
    return per_key.select(
        key_col, "n_events", n.alias("n_matches")
    ).where(F.col("n_matches") > 0)


def funnel_times(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    event_col: str = "event_type",
    probs: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Time-to-convert distribution per funnel transition: for users
    reaching step k under the same earliest-completion greedy semantics
    as :func:`funnel`, the exact interpolated percentiles of
    ``t(step k) − t(step k−1)``.

    Same plan shape as the funnel (k−1 chained joins of per-user
    MIN-aggregate frames, each ≤ |users| rows); one extra grouped exact
    percentile per transition.  Returns
    (step, from_step, to_step, n_users, p50_ms, p90_ms) for k ≥ 2.
    """
    if len(steps) < 2:
        raise ValueError("need at least two steps")
    ev = df.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).cast("long").alias("t"),
        F.col(event_col).alias("e"),
    )
    reached = (
        ev.where(F.col("e") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("tk"))
        .localCheckpoint(eager=False)  # user-cardinality state, see funnel
    )
    out = None
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            ev.where(F.col("e") == step)
            .join(reached.select("u", "tk"), "u")
            .where(F.col("t") > F.col("tk"))
            .groupBy("u")
            .agg(F.min("t").alias("t_next"), F.max("tk").alias("tk_prev"))
            .localCheckpoint(eager=False)
        )
        deltas = nxt.select("u", (F.col("t_next") - F.col("tk_prev")).alias("d"))
        row = deltas.agg(
            F.lit(i).cast("long").alias("step"),
            F.lit(steps[i - 2]).alias("from_step"),
            F.lit(step).alias("to_step"),
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.percentile("d", probs[0]), 6).alias("p50_ms"),
            F.round(F.percentile("d", probs[1]), 6).alias("p90_ms"),
        )
        out = row if out is None else out.unionByName(row)
        reached = nxt.select("u", F.col("t_next").alias("tk"))
    return out


def ab_test(
    df: DataFrame,
    variant_col: str,
    value_col: str = "value",
    group_cols: list[str] | None = None,
    round_out: int = 6,
) -> DataFrame:
    """Two-sample experiment readout per group: counts, means, mean
    difference, and the Welch t-statistic for variants 'a' vs 'b' (any
    two distinct values of ``variant_col``; rows with other values are
    ignored by the caller's filter).

    Exactness: per-variant (n, Σcents, Σcents²) are DECIMAL(38,0)
    integer sums pivoted into fixed columns, so every aggregate is
    order-free and the t statistic is one deterministic double tree —
    engine-exact at ``round_out`` dp.  ONE map-side-combinable shuffle
    on the group key.

    Welch: t = (ā − b̄) / sqrt(s²ₐ/nₐ + s²ᵦ/nᵦ) with sample variances
    (n−1 denominator).  Degenerate sides (n < 2 or zero variance on
    both) yield NULL t.

    Returns group_cols + (n_a, n_b, mean_a, mean_b, diff, t_stat).
    """
    group_cols = group_cols or []
    d38 = "decimal(38,0)"
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast(d38)
    va = F.col(variant_col) == "a"
    vb = F.col(variant_col) == "b"
    zero = F.lit(0).cast(d38)
    g = (
        df.where(F.col(value_col).isNotNull() & (va | vb))
        .groupBy(*group_cols)
        .agg(
            F.sum(F.when(va, F.lit(1)).otherwise(F.lit(0))).cast(d38).alias("na"),
            F.sum(F.when(vb, F.lit(1)).otherwise(F.lit(0))).cast(d38).alias("nb"),
            F.sum(F.when(va, cents).otherwise(zero)).alias("sa"),
            F.sum(F.when(vb, cents).otherwise(zero)).alias("sb"),
            F.sum(F.when(va, cents * cents).otherwise(zero)).alias("qa"),
            F.sum(F.when(vb, cents * cents).otherwise(zero)).alias("qb"),
        )
    )
    nad, nbd = F.col("na").cast("double"), F.col("nb").cast("double")
    sad, sbd = F.col("sa").cast("double"), F.col("sb").cast("double")
    mean_a = sad / nad / 100
    mean_b = sbd / nbd / 100
    # sample variance ×10⁴ (cents²): (n·Σx² − (Σx)²) / (n·(n−1)) — exact
    # integer numerator cast once
    van = (F.col("na") * F.col("qa") - F.col("sa") * F.col("sa")).cast("double")
    vbn = (F.col("nb") * F.col("qb") - F.col("sb") * F.col("sb")).cast("double")
    var_a = van / (nad * (nad - 1))
    var_b = vbn / (nbd * (nbd - 1))
    se = F.sqrt(var_a / nad + var_b / nbd)
    ok = (F.col("na") >= 2) & (F.col("nb") >= 2) & (se > 0)
    t = F.when(ok, F.round((sad / nad - sbd / nbd) / se, round_out))
    return g.select(
        *group_cols,
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(mean_a, round_out).alias("mean_a"),
        F.round(mean_b, round_out).alias("mean_b"),
        F.round(mean_a - mean_b, round_out).alias("diff"),
        t.alias("t_stat"),
    )


def diff_in_diff(
    df: DataFrame,
    treat_col: str,
    post_col: str,
    value_col: str = "value",
) -> DataFrame:
    """Difference-in-differences point estimate: the 2×2 design
    (treated/control × pre/post) with

        did = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_control,post − ȳ_control,pre)

    the workhorse causal read-out for launches and experiments with a
    pre-period.  ``treat_col``/``post_col`` must be boolean columns.

    Plan: ONE grouped aggregate over the four cells (map-side combine)
    and a single-row finish — no joins, no window.  Cell sums are exact
    integer cents; each mean is one division of exact operands and the
    DiD is a fixed-order difference tree over those identical doubles,
    so the estimate is engine-exact (see ab_test for the inference
    companion — this operator is the design's point estimate).

    Returns one row: (n_tp, n_tq, n_cp, n_cq, mean_treat_post,
    mean_treat_pre, mean_control_post, mean_control_pre, did) where
    q = pre.  Raises at execution time if any cell is empty (the design
    is undefined) — the returned frame is lazy like every other
    operator.
    """
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("decimal(38,0)")
    cell = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(treat_col).alias("__t"), F.col(post_col).alias("__p"))
        .agg(F.count(F.lit(1)).alias("__n"), F.sum(cents).alias("__s"))
    )
    wide = cell.agg(
        *[
            F.sum(F.when((F.col("__t") == t) & (F.col("__p") == p), F.col(c))).alias(
                f"{c[2:]}_{'t' if t else 'c'}{'p' if p else 'q'}"
            )
            for t in (True, False)
            for p in (True, False)
            for c in ("__n", "__s")
        ]
    )

    # empty-cell validation happens IN-PLAN (raise_error fires at
    # execution time), so the operator stays lazy like every other —
    # callers keep lineage and pay the scan only when they act.  The
    # guard wraps each output column (not a droppable side column) so
    # it survives column pruning whichever columns the caller selects.
    def guarded_n(tag):
        n = F.col(f"n_{tag}")
        return F.when(
            n.isNull() | (n == 0),
            F.raise_error(
                F.lit("diff_in_diff: every treat×period cell must be non-empty")
            ).cast("decimal(38,0)"),
        ).otherwise(n)

    def mean(tag):
        return (F.col(f"s_{tag}").cast("double") / guarded_n(tag).cast("double")) / 100.0

    return wide.select(
        *[guarded_n(t).cast("long").alias(f"n_{t}") for t in ("tp", "tq", "cp", "cq")],
        mean("tp").alias("mean_treat_post"),
        mean("tq").alias("mean_treat_pre"),
        mean("cp").alias("mean_control_post"),
        mean("cq").alias("mean_control_pre"),
        (
            (mean("tp") - mean("tq")) - (mean("cp") - mean("cq"))
        ).alias("did"),
    )
