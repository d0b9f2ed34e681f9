"""Hypothesis nets for the resampling/smoothing operators: invariants
that must hold for ANY series, not just the fixtures."""

from hypothesis import given, settings, strategies as st

from janus_spark.operators.timeseries import ewma, interp_resample

series_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5000),
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda p: p[0],  # one observation per instant (as-of contract)
)


@settings(max_examples=10, deadline=None)
@given(obs=series_st, step=st.sampled_from([50, 170, 999]))
def test_interp_between_brackets_and_hits_observations(spark, obs, step):
    df = spark.createDataFrame([(1, t, float(v)) for t, v in obs],
                               "k long, ts_ms long, value double")
    out = interp_resample(df, ["k"], step_ms=step).collect()
    by_ts = dict(obs)
    lo, hi = min(by_ts), max(by_ts)
    sorted_ts = sorted(by_ts)
    for r in out:
        t = r["ts_ms"]
        assert lo <= t <= hi and t % step == 0
        if t in by_ts:  # slot on an observation returns that value
            assert abs(r["value_interp"] - by_ts[t]) <= 1e-6
        else:  # otherwise strictly between the bracketing values
            prev = max(x for x in sorted_ts if x < t)
            nxt = min(x for x in sorted_ts if x > t)
            a, b = sorted((by_ts[prev], by_ts[nxt]))
            assert a - 1e-6 <= r["value_interp"] <= b + 1e-6
    # every in-range slot is present
    expected = {s * step for s in range((lo + step - 1) // step, hi // step + 1)}
    assert {r["ts_ms"] for r in out} == expected


@settings(max_examples=10, deadline=None)
@given(obs=series_st, alpha=st.sampled_from([0.2, 0.5, 0.9]),
       lag=st.sampled_from([1, 3, 8]))
def test_ewma_convexity_and_lag1_identity(spark, obs, alpha, lag):
    df = spark.createDataFrame([(1, t, float(v)) for t, v in obs],
                               "k long, ts_ms long, value double")
    out = {r["ts_ms"]: r["ewma"] for r in
           ewma(df, ["k"], alpha=alpha, max_lag=lag).collect()}
    by_ts = dict(obs)
    sorted_ts = sorted(by_ts)
    for i, t in enumerate(sorted_ts):
        window = [by_ts[x] for x in sorted_ts[max(0, i - lag + 1): i + 1]]
        # a normalized weighted average stays inside the window's hull
        assert min(window) - 1e-6 <= out[t] <= max(window) + 1e-6
        if lag == 1:  # single-lag EWMA is the identity
            assert abs(out[t] - round(by_ts[t], 6)) <= 1e-6
