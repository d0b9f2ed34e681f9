from janus_spark.sources.melt import melt_table, melt_events, load_tables
from janus_spark.sources.nquads import parse_nquads_lines, read_nquads, format_nquads
from janus_spark.sources.quadstore import QuadStore
from janus_spark.sources.stream import decode_kafka_quads, open_quad_stream

__all__ = [
    "decode_kafka_quads",
    "open_quad_stream",
    "melt_table",
    "melt_events",
    "load_tables",
    "parse_nquads_lines",
    "read_nquads",
    "format_nquads",
    "QuadStore",
]
