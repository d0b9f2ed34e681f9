"""Stream-bus replay — operator S8.

Reference (src/stream_bus/stream_bus.rs:134-394): read an N-Quads file,
publish each line to the live side AND write it to storage (dual-write),
with a configurable rate and optional looping.

Spark mapping: replay is a deterministic partitioning of a quads frame
into time-ordered micro-batches fed to a LiveQueryRunner, with an
optional dual-write to a QuadStore.  Rate limiting is only meaningful for
wall-clock demos — pass ``rate_hz`` to sleep between batches; tests leave
it off and replay as fast as the engine evaluates (the reference's bench
mode does the same).
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from janus_spark.sources.quadstore import QuadStore
from janus_spark.streaming.live import LiveQueryRunner


def replay_quads(
    quads: DataFrame,
    runner: LiveQueryRunner,
    batch_ms: int,
    store: QuadStore | None = None,
    rate_hz: float | None = None,
    close_at_end: bool = True,
    should_stop: Callable[[], bool] | None = None,
) -> int:
    """Replay a static quads frame as time-ordered micro-batches.

    ``batch_ms``: event-time span per micro-batch (processing-time trigger
    interval equivalent).  Returns the number of batches fed.

    ``should_stop``: polled before each batch — the replay stop control
    the reference exposes as POST /api/replay/stop (server.rs:548+);
    a stopped replay still closes the runner (sentinel flush) so
    downstream windows fire with what was fed.
    """
    bounds = quads.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    if bounds["lo"] is None:
        return 0
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    n = 0
    cur = lo
    while cur <= hi:
        if should_stop is not None and should_stop():
            break
        batch = quads.where((F.col("ts") >= cur) & (F.col("ts") < cur + batch_ms))
        if store is not None:
            store.write(batch)  # dual-write (stream_bus.rs:279-298)
        runner.on_batch(batch)
        cur += batch_ms
        n += 1
        if rate_hz:
            time.sleep(1.0 / rate_hz)
    if close_at_end:
        runner.close(min(cur, hi + 1))
    return n
