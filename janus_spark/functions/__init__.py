from janus_spark.functions.registry import FUNCTION_REGISTRY, register_function
from janus_spark.functions import anomaly

__all__ = ["FUNCTION_REGISTRY", "register_function", "anomaly"]
