from janus_spark.parsing.janusql import (
    HIST_FIXED,
    HIST_SLIDING,
    LIVE_SLIDING,
    JanusQuery,
    WindowDef,
    parse_janusql,
)

__all__ = [
    "JanusQuery",
    "WindowDef",
    "parse_janusql",
    "HIST_FIXED",
    "HIST_SLIDING",
    "LIVE_SLIDING",
]
