from janus_spark.operators.historical import (
    assign_sliding_windows,
    run_historical_fixed,
    run_historical_sliding,
    sliding_window_bounds,
)
from janus_spark.operators.baseline import build_baseline, baseline_to_quads
from janus_spark.operators.comparator import window_stats, detect_anomalies

__all__ = [
    "run_historical_fixed",
    "run_historical_sliding",
    "sliding_window_bounds",
    "assign_sliding_windows",
    "build_baseline",
    "baseline_to_quads",
    "window_stats",
    "detect_anomalies",
]
