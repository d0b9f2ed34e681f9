"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]``; at cluster scale the same settings
(AQE on, adaptive shuffle-partition coalescing, Arrow for the few Pandas
UDF paths) are the ones you want on 1000 executors, so nothing here is
test-only.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "janus_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("JANUS_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("JANUS_DRIVER_MEM", "8g"))
        # collect() is only used by harnesses (oracle comparison) and tiny
        # driver-side manifests; stress sweeps collect multi-GB results for
        # the value-hash compare, so the cap is env-tunable
        .config("spark.driver.maxResultSize", os.environ.get("JANUS_MAX_RESULT_SIZE", "2g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # zstd beats snappy ~2.6× on size for quad-shaped string data; at
        # level 1 it also matches snappy's write and scan speed (level 3
        # costs ~30% write/scan for zero size gain — the data is already
        # dictionary-encoded before the codec sees it). Measured in bench.py.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.hadoop.parquet.compression.codec.zstd.level", "1")
    )
    return builder.getOrCreate()
