"""Test-table loading and view registration.

The driver provides a TPC-H-ish star schema plus ``events``,
``documents`` and ``embeddings`` at /root/testdata/sf*/ (TESTDATA.md).
Loading is plain ``spark.read.parquet`` — Catalyst handles predicate
pushdown, column pruning and partition pruning from there; nothing in
this engine hand-schedules scans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The engine's timestamp semantics are UTC everywhere (the reference
    # stores all times UTC, trackpoint.go:20). Pin the session time zone
    # so timestamp literals and pandas conversion are stable no matter
    # how the caller built the session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts has shipped as TIMESTAMP(NANOS), TIMESTAMP(MICROS),
        # and (via nanosAsLong) bigint across testdata generations.
        # Normalize every variant to session-zone TIMESTAMP (UTC) so the
        # engine and the DuckDB oracle agree regardless of which parquet
        # vintage is on disk.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Read micros-NTZ parquet as session-zone TIMESTAMP directly at
        # the scan (session tz pinned UTC above) instead of casting after
        # the fact: a cast on top of the relation blocks parquet
        # filter pushdown on ts, so every time-range query would read the
        # whole fact table. With the scan typed LTZ, `ts >= lit` lands in
        # PushedFilters (verified via explain).
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type == "bigint":
            # Epoch-nanos: integer `div` (nanos exceed 2^53, float division
            # would lose precision), truncation matches DuckDB's ns→us.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type.startswith("timestamp_ntz"):
            # Wall-clock micros: reinterpret as UTC instants (session tz is
            # pinned to UTC above, so the cast is a pure type change).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition a scan whose partition count is below the
    session's default parallelism.

    The driver's test tables are single-file / single-row-group parquet,
    which Spark can only scan as ONE task — every downstream map-side
    stage (shingling, plane dots, per-point trig, Arrow batches) then
    runs serial until the first shuffle. On a real cluster the input
    arrives pre-split (many files / row groups), the condition is false,
    and no exchange is inserted — so call sites keep their scan-adjacent
    pushdown at scale while local runs use every core. Round-robin, not
    keyed: callers that need co-location do their own keyed shuffle.

    Uses classic-mode APIs (sparkContext / df.rdd) to inspect the scan;
    under Spark Connect those don't exist, and the server's own file
    splitting is in charge anyway — degrade to a no-op there."""
    try:
        sc = df.sparkSession.sparkContext
        target = sc.defaultParallelism
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every test table as a temp view named after the table."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
