from janus_spark.datapipe import dedup, similarity, text, multimodal

__all__ = ["dedup", "similarity", "text", "multimodal"]
