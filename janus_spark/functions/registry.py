"""Extension-function registry: function name → Column builder.

Model: the reference's ``FunctionRegistry`` (src/extensions/registry.rs:12-52)
maps IRIs under ``https://janus.rs/fn#`` to Rust closures; here the registry
maps normalized names to Python callables returning Column expressions,
extensible at runtime via ``register_function``.  Everything stays JVM-side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column

from janus_spark.functions import anomaly

FUNCTION_REGISTRY: dict[str, Callable[..., Column]] = {
    "abs_diff": anomaly.abs_diff,
    "relative_change": anomaly.relative_change,
    "zscore": anomaly.zscore,
    "absolute_threshold_exceeded": anomaly.absolute_threshold_exceeded,
    "relative_threshold_exceeded": anomaly.relative_threshold_exceeded,
    "catch_up": anomaly.catch_up,
    "volatility_increase": anomaly.volatility_increase,
    "is_outlier": anomaly.is_outlier,
    "trend_divergent": anomaly.trend_divergent,
}


def register_function(name: str, fn: Callable[..., Column]) -> None:
    FUNCTION_REGISTRY[name] = fn
