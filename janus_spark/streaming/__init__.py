from janus_spark.streaming.live import LiveQueryRunner, ListSink, ParquetSink
from janus_spark.streaming.replay import replay_quads
from janus_spark.streaming.stateful import streaming_comparator
from janus_spark.streaming.native_agg import native_agg_reason, native_window_agg_stream

__all__ = [
    "LiveQueryRunner",
    "ListSink",
    "ParquetSink",
    "replay_quads",
    "streaming_comparator",
    "native_agg_reason",
    "native_window_agg_stream",
]
