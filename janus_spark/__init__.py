"""janus_spark — a PySpark-native hybrid historical + live RDF stream
analytics engine with the query capabilities of SolidLabResearch/janus.

Brand-new Spark-first design (NOT a port): the reference delegates SPARQL
evaluation to Oxigraph and live windowing to rsp-rs; here both are
re-expressed as Catalyst-optimized DataFrame plans:

- storage          -> time-partitioned Parquet (partition pruning + row-group
                      stats replace the reference's segmented log + two-level
                      index, reference src/storage/segmented_storage.rs)
- SPARQL subset    -> a compiler from SPARQL algebra to DataFrame operators
                      (janus_spark.compiler), replacing Oxigraph
- Janus-QL         -> parser + hybrid decomposition (janus_spark.parsing),
                      reference src/parsing/janusql_parser.rs
- live RSP windows -> Structured Streaming / micro-batch window runtime
                      (janus_spark.streaming), reference rsp-rs usage in
                      src/stream/live_stream_processing.rs
- extension fns    -> native Column expressions (janus_spark.functions),
                      reference src/extensions/{math,rules}.rs
"""

from janus_spark.model import QUAD_SCHEMA, QUAD_COLUMNS
from janus_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["QUAD_SCHEMA", "QUAD_COLUMNS", "get_spark", "__version__"]
