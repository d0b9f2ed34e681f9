from janus_spark.streaming.live import LiveQueryRunner, ListSink
from janus_spark.streaming.replay import replay_quads
from janus_spark.streaming.stateful import streaming_comparator

__all__ = ["LiveQueryRunner", "ListSink", "replay_quads", "streaming_comparator"]
