"""SparkSession factory tuned for this engine.

Local defaults mirror the driver harness (local[32], 32 shuffle
partitions); on a real cluster the same builder is used with
master/shuffle-partitions supplied by the environment. Every knob here
exists for 100 TB scale: AQE for runtime re-planning and skew joins,
Arrow for the pandas-UDF geometry path, UTC session time zone so
timestamps are stable against any oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "flightdb_spark", *, cpus: int | None = None) -> SparkSession:
    """Return (or create) the engine's SparkSession."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    shuffle = str(cpus or os.cpu_count() or 32)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # push MIN/MAX/COUNT straight to parquet footer statistics —
        # profile/bbox-style aggregates never touch row data
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # runtime bloom filters: build-side keys prune the probe-side
        # SCAN of large shuffle joins (exact results, pure pruning)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.driver.memory", os.environ.get("FLIGHTDB_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
