from janus_spark.streaming.live import LiveQueryRunner, ListSink
from janus_spark.streaming.replay import replay_quads

__all__ = ["LiveQueryRunner", "ListSink", "replay_quads"]
