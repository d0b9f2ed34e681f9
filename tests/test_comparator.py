"""Stateful comparator (W9) — semantics pinned to comparator.rs:94-236."""

from janus_spark.operators.comparator import ComparatorConfig, detect_anomalies, window_stats


def test_window_stats_mean_std_slope(spark):
    # values 1..5 at ts 1..5: mean 3, pop-std sqrt(2), slope 1
    df = spark.createDataFrame([(float(i), float(i)) for i in range(1, 6)], ["ts", "v"])
    out = window_stats(df, "v", "ts", window_size=10).orderBy("ts").collect()
    last = out[-1]
    assert abs(last["mean"] - 3.0) < 1e-9
    assert abs(last["std_dev"] - 2.0**0.5) < 1e-9
    assert abs(last["slope"] - 1.0) < 1e-9
    assert last["count"] == 5


def test_single_point_slope_is_zero(spark):
    df = spark.createDataFrame([(1.0, 7.0)], ["ts", "v"])
    out = window_stats(df, "v", "ts", window_size=10).collect()
    assert out[0]["slope"] == 0.0  # zero-denominator guard (comparator.rs:49-53)
    assert out[0]["std_dev"] == 0.0


def test_trend_divergence_and_abs_threshold(spark):
    # live rises 0..9, hist falls 9..0 -> opposite slopes, |slope|=1 > 0.01
    rows = [(float(t), float(t), float(9 - t)) for t in range(10)]
    df = spark.createDataFrame(rows, ["ts", "live", "hist"])
    out = detect_anomalies(df, "live", "hist").orderBy("ts").collect()
    last = out[-1]
    assert "TrendDivergence" in last["anomalies"]
    # means are equal (4.5 vs 4.5) -> no AbsoluteThresholdExceeded
    assert "AbsoluteThresholdExceeded" not in last["anomalies"]


def test_outlier_detection(spark):
    # stable hist ~ noise around 10 (nonzero std); live jumps to 100 at the end
    rows = [(float(t), 10.0, 10.0 + (0.5 if t % 2 else -0.5)) for t in range(9)]
    rows.append((9.0, 100.0, 10.0))
    df = spark.createDataFrame(rows, ["ts", "live", "hist"])
    out = detect_anomalies(df, "live", "hist").orderBy("ts").collect()
    assert "LiveOutlierDetected" in out[-1]["anomalies"]
    assert out[-1]["z_score"] > 3


def test_catch_up_and_relative(spark):
    # hist mean far above live mean -> CatchUpTriggered; relative change
    # positive when live above hist
    rows = [(float(t), 1.0, 10.0) for t in range(5)]
    df = spark.createDataFrame(rows, ["ts", "live", "hist"])
    out = detect_anomalies(df, "live", "hist").collect()
    assert "CatchUpTriggered" in out[-1]["anomalies"]  # lag 9 > 2
    assert "RelativeDropDetected" not in out[-1]["anomalies"]  # rel_change = -0.9 < 0.1

    rows2 = [(float(t), 10.0, 1.0) for t in range(5)]
    out2 = detect_anomalies(
        spark.createDataFrame(rows2, ["ts", "live", "hist"]), "live", "hist"
    ).collect()
    assert "RelativeDropDetected" in out2[-1]["anomalies"]  # rel_change = 9 > 0.1


def test_volatility_increase(spark):
    rows = [(float(t), 50.0 if t % 2 else -50.0, 1.0) for t in range(10)]
    df = spark.createDataFrame(rows, ["ts", "live", "hist"])
    out = detect_anomalies(df, "live", "hist").orderBy("ts").collect()
    assert "VolatilityIncrease" in out[-1]["anomalies"]


def test_keyed_partitioning(spark):
    # two independent keys don't leak state into each other
    rows = [("a", float(t), float(t), float(9 - t)) for t in range(10)]
    rows += [("b", float(t), 5.0, 5.0) for t in range(10)]
    df = spark.createDataFrame(rows, ["k", "ts", "live", "hist"])
    out = detect_anomalies(df, "live", "hist", key_cols=["k"]).orderBy("k", "ts").collect()
    a_last = [r for r in out if r["k"] == "a"][-1]
    b_last = [r for r in out if r["k"] == "b"][-1]
    assert "TrendDivergence" in a_last["anomalies"]
    assert b_last["anomalies"] == []
