"""Streaming stateful comparator — W9's Structured-Streaming form.

The batch comparator (operators/comparator.py) computes rolling
WindowStats with SQL window functions; this module runs the SAME
semantics continuously over an unbounded stream using
``applyInPandasWithState``: per key, the state holds the last-K
(ts, live, hist) points (exactly the reference's two VecDeques,
comparator.rs:140-152), each micro-batch folds its rows into the state
in timestamp order and emits one row per update with the triggered
anomaly kinds.

This is the engine's showcase of a custom stateful streaming operator —
state is managed by Spark (fault-tolerant via checkpointing), Arrow moves
the batches, and the per-key loop is tiny (K<=10 points).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from janus_spark.operators.comparator import ComparatorConfig

STATE_SCHEMA = StructType(
    [
        StructField("ts", ArrayType(DoubleType()), True),
        StructField("live", ArrayType(DoubleType()), True),
        StructField("hist", ArrayType(DoubleType()), True),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("ts", DoubleType(), False),
        StructField("live_mean", DoubleType(), True),
        StructField("hist_mean", DoubleType(), True),
        StructField("live_slope", DoubleType(), True),
        StructField("hist_slope", DoubleType(), True),
        StructField("anomalies", ArrayType(StringType()), True),
    ]
)


def _window_stats(ts: list[float], vals: list[float]) -> tuple[float, float, float]:
    """mean, population std-dev, least-squares slope — comparator.rs:23-57."""
    n = float(len(vals))
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / n
    std = math.sqrt(var)
    sum_x = sum(ts)
    sum_xy = sum(t * v for t, v in zip(ts, vals))
    sum_x2 = sum(t * t for t in ts)
    denom = n * sum_x2 - sum_x * sum_x
    slope = 0.0 if abs(denom) < 2.2e-16 else (n * sum_xy - sum_x * sum(vals)) / denom
    return mean, std, slope


def _compare(ts, live, hist, latest_live, cfg: ComparatorConfig):
    lm, lsd, ls = _window_stats(ts, live)
    hm, hsd, hs = _window_stats(ts, hist)
    eps = 2.220446049250313e-16
    out = []
    if abs(lm - hm) > cfg.abs_threshold:
        out.append("AbsoluteThresholdExceeded")
    if abs(hm) > eps and (lm - hm) / hm > cfg.rel_threshold:
        out.append("RelativeDropDetected")
    if hm - lm > cfg.catchup_trigger:
        out.append("CatchUpTriggered")
    if ls * hs < 0 and abs(ls) > cfg.slope_epsilon and abs(hs) > cfg.slope_epsilon:
        out.append("TrendDivergence")
    if lsd > hsd + cfg.volatility_buffer:
        out.append("VolatilityIncrease")
    if hsd > eps and abs((latest_live - hm) / hsd) > cfg.outlier_z_threshold:
        out.append("LiveOutlierDetected")
    return lm, hm, ls, hs, out


def streaming_comparator(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    live_col: str = "live",
    hist_col: str = "hist",
    config: ComparatorConfig | None = None,
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Attach the stateful comparator to a (streaming or batch) frame of
    (key, ts, live, hist) rows.  Emits one output row per input row, in
    ts order within each micro-batch, with the anomalies triggered at
    that update — exactly update_and_compare (comparator.rs:157-177)."""
    cfg = config or ComparatorConfig()

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts_hist, live_hist, hist_hist = state.get
            ts_hist, live_hist, hist_hist = list(ts_hist), list(live_hist), list(hist_hist)
        else:
            ts_hist, live_hist, hist_hist = [], [], []
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for _, r in pdf.iterrows():
                t, lv, hv = float(r[ts_col]), float(r[live_col]), float(r[hist_col])
                for buf, v in ((ts_hist, t), (live_hist, lv), (hist_hist, hv)):
                    if len(buf) >= cfg.window_size:
                        buf.pop(0)
                    buf.append(v)
                lm, hm, ls, hs, anomalies = _compare(ts_hist, live_hist, hist_hist, lv, cfg)
                rows.append((key[0], t, lm, hm, ls, hs, anomalies))
        state.update((ts_hist, live_hist, hist_hist))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["key", "ts", "live_mean", "hist_mean", "live_slope", "hist_slope", "anomalies"],
            )

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("k", LongType(), True),      # steps completed so far
        StructField("t1", DoubleType(), True),   # step-1 time
        StructField("tk", DoubleType(), True),   # last completed step time
        StructField("done", LongType(), True),   # 1 after emission
    ]
)

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user", StringType(), False),
        StructField("t1", DoubleType(), False),
        StructField("completed_at", DoubleType(), False),
    ]
)


def streaming_funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user",
    ts_col: str = "ts",
    event_col: str = "event",
    within_ms: int | None = None,
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Continuous ordered-funnel detection: per user, advance through
    ``steps`` (strictly increasing timestamps; optional ``within_ms``
    completion window anchored at step 1) and EMIT one row the moment
    the user completes the funnel — the streaming form of
    ``operators/analytics.funnel`` with the same earliest-completion
    greedy semantics.

    State per user is three scalars (step index, step-1 time, last step
    time) — constant regardless of history length, checkpoint-recoverable
    like the comparator.  Events must arrive in per-user timestamp order
    across micro-batches (the ingest contract the comparator also
    assumes); within a batch rows are folded in ts order.
    """
    n_steps = len(steps)
    if n_steps == 0:
        raise ValueError("steps must be non-empty")

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            k, t1, tk, done = state.get
        else:
            k, t1, tk, done = 0, None, None, 0
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for _, r in pdf.iterrows():
                if done:
                    break
                t, e = float(r[ts_col]), r[event_col]
                if k == 0:
                    if e == steps[0]:
                        k, t1, tk = 1, t, t
                else:
                    if (
                        e == steps[k]
                        and t > tk
                        and (within_ms is None or t <= t1 + within_ms)
                    ):
                        k, tk = k + 1, t
                if k == n_steps and not done:
                    done = 1
                    rows.append((key[0], t1, tk))
        state.update((k, t1, tk, done))
        if rows:
            yield pd.DataFrame(rows, columns=["user", "t1", "completed_at"])

    return df.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


ATTR_STATE_SCHEMA = StructType(
    [
        StructField("lt", DoubleType()),  # last touch ts
        StructField("lc", StringType()),  # last touch campaign
    ]
)
ATTR_OUTPUT_SCHEMA = StructType(
    [
        StructField("user", StringType()),
        StructField("ts", DoubleType()),
        StructField("campaign", StringType()),
        StructField("value", DoubleType()),
    ]
)


def streaming_attribution(
    df: DataFrame,
    conversion_type: str,
    touch_type: str,
    lookback_ms: float | None = None,
    user_col: str = "user",
    ts_col: str = "ts",
    event_col: str = "event",
    campaign_col: str = "campaign",
    value_col: str = "value",
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Continuous last-touch attribution: per user, remember the most
    recent touch (two scalars of state — constant regardless of history)
    and emit each conversion the moment it arrives, credited to that
    touch's campaign when it is within ``lookback_ms`` (NULL campaign
    otherwise — unattributed conversions are reported, not dropped).

    The streaming form of ``operators/analytics.attribution(model=
    'last')``: state crosses micro-batch boundaries and survives restart
    via the checkpoint, so a click in batch 1 credits a purchase in
    batch 30.  Events must arrive in per-user timestamp order across
    micro-batches (the ingest contract shared by the comparator and
    funnel); within a batch rows are folded in ts order.
    """

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        lt, lc = state.get if state.exists else (None, None)
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            for _, r in pdf.iterrows():
                t, e = float(r[ts_col]), r[event_col]
                if e == touch_type:
                    lt, lc = t, r[campaign_col]
                elif e == conversion_type:
                    ok = lt is not None and (lookback_ms is None or t - lt <= lookback_ms)
                    v = r[value_col]
                    rows.append(
                        (key[0], t, lc if ok else None, None if pd.isna(v) else float(v))
                    )
        state.update((lt, lc))
        if rows:
            yield pd.DataFrame(rows, columns=["user", "ts", "campaign", "value"])

    return df.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=ATTR_OUTPUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


CEP_STATE_SCHEMA = StructType(
    [
        StructField("suffix", StringType()),   # unconsumed symbol tail
        StructField("n_matches", LongType()),  # total matches so far
    ]
)
CEP_OUTPUT_SCHEMA = StructType(
    [
        StructField("user", StringType()),
        StructField("ts", DoubleType()),
        StructField("n_new", LongType()),
        StructField("n_total", LongType()),
    ]
)


def streaming_match_pattern(
    df: DataFrame,
    pattern: str,
    symbols: dict[str, str],
    user_col: str = "user",
    ts_col: str = "ts",
    event_col: str = "event",
    max_suffix: int = 10_000,
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Continuous CEP: the streaming form of
    ``operators/analytics.match_pattern`` — per user, maintain the
    UNCONSUMED symbol suffix and total match count; each micro-batch
    appends its symbols, counts new non-overlapping matches, and emits a
    row when new matches appear (ts = batch max ts for the user).

    Equivalence contract with the batch operator: matches never span a
    consumed prefix (non-overlapping), and the suffix after the last
    match is kept so a pattern may complete across ANY number of
    micro-batch boundaries.  ``max_suffix`` caps per-user state (longest
    believable pattern span); events outside ``symbols`` append the
    unmatchable gap char exactly like the batch form.

    Batch/stream equivalence requires the pattern to END in a definite
    symbol (``vc+p``), not an unbounded quantifier (``vc+``): a
    trailing-greedy match is claimed as soon as a batch closes, while
    the batch operator would keep extending it.

    State per user: one bounded string + one counter —
    checkpoint-recoverable like the funnel/attribution operators.
    """
    import re as _re

    from janus_spark.operators.analytics import validate_cep_pattern

    validate_cep_pattern(pattern, symbols)
    rx = _re.compile(pattern)
    gap = "\x01"

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        suffix, total = state.get if state.exists else ("", 0)
        new, last_ts = 0, None
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            for _, r in pdf.iterrows():
                suffix += symbols.get(r[event_col], gap)
                last_ts = float(r[ts_col])
        end = 0
        for m in rx.finditer(suffix):
            new += 1
            end = m.end()
        if new:
            suffix = suffix[end:]
            total += new
        if len(suffix) > max_suffix:
            suffix = suffix[-max_suffix:]
        state.update((suffix, total))
        if new and last_ts is not None:
            yield pd.DataFrame(
                [(key[0], last_ts, new, total)],
                columns=["user", "ts", "n_new", "n_total"],
            )

    return df.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=CEP_OUTPUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
