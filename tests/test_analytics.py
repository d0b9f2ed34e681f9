"""Behavioral analytics: ordered funnel, cohort retention, MAD outliers."""

import pytest

from janus_spark.operators.analytics import funnel, mad_outliers, retention_cohorts


def test_funnel_requires_strict_order_and_window(spark):
    rows = [
        # u1 completes in order
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # u2: click BEFORE view — click after view missing → stops at view
        (2, 50, "click"), (2, 60, "view"),
        # u3: completes but purchase outside the window
        (3, 0, "view"), (3, 5, "click"), (3, 5000, "purchase"),
        # u4: never views; click/purchase don't count
        (4, 10, "click"), (4, 20, "purchase"),
        # u5: same-ts click (not strictly after) → stops at view
        (5, 10, "view"), (5, 10, "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long, event_type string")
    out = {r["step_name"]: r["n_users"] for r in
           funnel(df, ["view", "click", "purchase"], within_ms=100).collect()}
    assert out == {"view": 4, "click": 2, "purchase": 1}


def test_funnel_greedy_earliest_is_optimal(spark):
    # view@0, click@5, purchase@6: greedy takes click@5 then purchase@6.
    # A non-greedy assignment (click@7) would miss purchase@6 — greedy
    # earliest-completion must find the conversion.
    rows = [(1, 0, "view"), (1, 5, "click"), (1, 7, "click"), (1, 6, "purchase")]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long, event_type string")
    out = {r["step_name"]: r["n_users"] for r in
           funnel(df, ["view", "click", "purchase"]).collect()}
    assert out["purchase"] == 1


def test_retention_cohorts_offsets(spark):
    p = 100
    rows = [
        (1, 10), (1, 110), (1, 310),   # cohort 0, active periods 0,1,3
        (2, 150), (2, 250),            # cohort 1, active periods 1,2
        (3, 120),                      # cohort 1, active period 1 only
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long")
    out = {(r["cohort_period"], r["period_offset"]): r["n_active"]
           for r in retention_cohorts(df, period_ms=p).collect()}
    assert out == {(0, 0): 1, (0, 1): 1, (0, 3): 1, (1, 0): 2, (1, 1): 1}


def test_mad_outliers_robust_where_mean_z_is_not(spark):
    # one huge outlier among tight values: MAD flags it; the same point
    # inflates mean/σ enough that a 3σ z-score would also need checking —
    # the key property is the tight points are NOT flagged
    vals = [10.0, 10.1, 9.9, 10.2, 9.8, 10.0, 10.1, 9.9, 1000.0]
    df = spark.createDataFrame(
        [(i, "t", v) for i, v in enumerate(vals)], "event_id long, event_type string, value double"
    )
    out = {r["event_id"]: r for r in mad_outliers(df, ["event_type"], k=3.0).collect()}
    assert out[8]["is_outlier"] is True
    assert all(out[i]["is_outlier"] is False for i in range(8))


def test_mad_outliers_zero_mad_yields_null_scores(spark):
    df = spark.createDataFrame(
        [(i, "t", 5.0) for i in range(10)] + [(99, "t", None)],
        "event_id long, event_type string, value double",
    )
    out = mad_outliers(df, ["event_type"]).collect()
    assert all(r["robust_z"] is None for r in out)       # MAD = 0 → try_divide null
    assert all(r["is_outlier"] is False for r in out)


def test_attribution_last_first_lookback(spark):
    from janus_spark.operators.analytics import attribution

    rows = [
        # user 1: click c1@100, click c2@200, purchase 10.00@250, purchase 5.00@900
        (1, 1, "click", 0.0, 100, "c1"),
        (2, 1, "click", 0.0, 200, "c2"),
        (3, 1, "purchase", 10.0, 250, None),
        (4, 1, "purchase", 5.0, 900, None),   # outside lookback 300
        # user 2: purchase with no touch at all
        (5, 2, "purchase", 2.5, 50, None),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "value", "ts_ms", "campaign"]
    )
    last = {
        r["campaign"]: r
        for r in attribution(df, "purchase", "click", lookback_ms=300, model="last").collect()
    }
    assert last["c2"]["n_conversions"] == 1 and last["c2"]["revenue"] == 10.0
    assert last[None]["n_conversions"] == 2 and last[None]["revenue"] == 7.5
    first = {
        r["campaign"]: r
        for r in attribution(df, "purchase", "click", model="first").collect()
    }
    # no lookback: both user-1 purchases credit the FIRST touch c1
    assert first["c1"]["n_conversions"] == 2 and first["c1"]["revenue"] == 15.0
    assert first[None]["n_conversions"] == 1


def test_attribution_same_ts_tiebreak(spark):
    from janus_spark.operators.analytics import attribution

    rows = [
        (1, 1, "click", 0.0, 100, "early"),
        (3, 1, "click", 0.0, 100, "late"),     # same ts, higher event_id
        (2, 1, "purchase", 1.0, 100, None),    # between the two ids
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "value", "ts_ms", "campaign"]
    )
    out = {r["campaign"]: r["n_conversions"] for r in
           attribution(df, "purchase", "click", model="last").collect()}
    # (ts, event_id) order: only event_id 1 precedes the purchase
    assert out == {"early": 1}


def test_attribution_rejects_unknown_model(spark):
    import pytest

    from janus_spark.operators.analytics import attribution

    df = spark.createDataFrame(
        [(1, 1, "x", 0.0, 0, None)],
        "event_id long, user_id long, event_type string, value double, "
        "ts_ms long, campaign string",
    )
    with pytest.raises(ValueError):
        attribution(df, "purchase", "click", model="linear")


def test_match_pattern_hand_check(spark):
    from janus_spark.operators.analytics import match_pattern

    rows = [
        # u1: v c c p v c p  -> two matches
        *[(i, 1, e, i * 10) for i, e in enumerate("v c c p v c p".split())],
        # u2: v ERR c p -> gap char breaks adjacency, no match
        (0, 2, "view", 0), (1, 2, "error", 10), (2, 2, "click", 20), (3, 2, "purchase", 30),
        # u3: c p (no leading v) -> no match
        (0, 3, "click", 0), (1, 3, "purchase", 10),
    ]
    df = spark.createDataFrame(
        [(eid, u, {"v": "view", "c": "click", "p": "purchase"}.get(e, e), ts)
         for eid, u, e, ts in rows],
        ["event_id", "user_id", "event_type", "ts_ms"],
    )
    out = {r["user_id"]: r["n_matches"] for r in match_pattern(
        df, "vc+p", {"view": "v", "click": "c", "purchase": "p"}
    ).collect()}
    assert out == {1: 2}


def test_match_pattern_rejects_multichar_symbol(spark):
    import pytest

    from janus_spark.operators.analytics import match_pattern

    df = spark.createDataFrame([(1, 1, "view", 0)],
                               ["event_id", "user_id", "event_type", "ts_ms"])
    with pytest.raises(ValueError):
        match_pattern(df, "vv", {"view": "vv"})


def test_match_pattern_rejects_gap_matching_constructs(spark):
    """'.'/negated classes/escapes would match the '\\x01' gap char and
    silently void the adjacency-breaking contract — all rejected, along
    with literal chars outside the declared alphabet; quantifier and
    grouping metachars stay allowed."""
    import pytest

    from janus_spark.operators.analytics import match_pattern, validate_cep_pattern

    df = spark.createDataFrame([(1, 1, "view", 0)],
                               ["event_id", "user_id", "event_type", "ts_ms"])
    syms = {"view": "v", "click": "c", "purchase": "p"}
    for bad in ["v.p", "v[^c]p", r"v\wp", "vxp"]:
        with pytest.raises(ValueError):
            match_pattern(df, bad, syms)
    # allowed shapes parse fine (validator only; no execution needed)
    for ok in ["vc+p", "v(c|p){1,3}p", "vc*p?", "^vc+p$"]:
        validate_cep_pattern(ok, syms)
    # digits are meta ONLY inside {m,n}: a stray literal digit outside
    # braces is an undeclared symbol that would never match — reject it
    for bad in ["v7p", "v1", "0vp", "vc,p"]:
        with pytest.raises(ValueError):
            validate_cep_pattern(bad, syms)
    validate_cep_pattern("vc{2,3}p", syms)
    validate_cep_pattern("vc{2}p", syms)


def test_streaming_match_pattern_rejects_dot(spark):
    import pytest

    from janus_spark.streaming.stateful import streaming_match_pattern

    df = spark.readStream.format("rate").load().selectExpr(
        "CAST(value AS STRING) AS user", "CAST(value AS DOUBLE) AS ts",
        "'view' AS event")
    with pytest.raises(ValueError):
        streaming_match_pattern(df, "v.p", {"view": "v", "purchase": "p"})


def test_ab_test_matches_scipy_free_welch(spark):
    import math

    from janus_spark.operators.analytics import ab_test

    a = [10.0, 12.0, 11.5, 9.5, 10.5]
    b = [8.0, 8.5, 9.0, 7.5]
    rows = [("g", "a", v) for v in a] + [("g", "b", v) for v in b] + [("g", "c", 99.0)]
    df = spark.createDataFrame(rows, ["event_type", "variant", "value"])
    out = ab_test(df, "variant", group_cols=["event_type"]).collect()[0]

    def welch(x, y):
        nx, ny = len(x), len(y)
        mx, my = sum(x) / nx, sum(y) / ny
        vx = sum((v - mx) ** 2 for v in x) / (nx - 1)
        vy = sum((v - my) ** 2 for v in y) / (ny - 1)
        return (mx - my) / math.sqrt(vx / nx + vy / ny)

    assert out["n_a"] == 5 and out["n_b"] == 4  # variant 'c' excluded
    assert out["mean_a"] == 10.7 and out["mean_b"] == 8.25
    assert out["diff"] == 2.45
    assert abs(out["t_stat"] - welch(a, b)) < 1e-6


def test_ab_test_degenerate_sides_null_t(spark):
    from janus_spark.operators.analytics import ab_test

    df = spark.createDataFrame(
        [("g", "a", 1.0), ("g", "b", 2.0), ("g", "b", 2.0)],
        ["event_type", "variant", "value"],
    )
    out = ab_test(df, "variant", group_cols=["event_type"]).collect()[0]
    assert out["t_stat"] is None  # n_a < 2 and zero variance on b
