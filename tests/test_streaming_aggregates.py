"""Streaming windowed/session aggregates (streaming/aggregates.py):
late-but-in-watermark rows merge; the results match the equivalent
batch aggregation over the same rows."""

import datetime as dt

from pyspark.sql import functions as F

from flightdb_spark.streaming.aggregates import (
    sessionized_user_stats,
    windowed_event_counts,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _run_stream(spark, tmp_path, df, fn, name, mode="update"):
    # Memory sink, non-append mode: append-mode windows only emit once
    # the watermark passes their end, which never happens for the final
    # batch of a finite source. Update emits each window's latest merged
    # value (tumbling); session windows only allow append/complete, so
    # the session test reads the complete-mode final state instead.
    src = str(tmp_path / f"{name}_in")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        fn(stream)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .trigger(availableNow=True)
        .outputMode(mode)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_windowed_counts_match_batch(spark, tmp_path):
    rows = [
        # misordered arrival inside one file: watermark tolerance covers it
        (1, T0 + dt.timedelta(minutes=12), 7, "click", 1.0),
        (2, T0 + dt.timedelta(minutes=1), 7, "click", 2.0),
        (3, T0 + dt.timedelta(minutes=3), 8, "view", 3.0),
        (4, T0 + dt.timedelta(minutes=14), 8, "click", 4.0),
        (5, T0 + dt.timedelta(minutes=25), 7, "view", 5.0),
    ]
    df = _mk(spark, rows)
    got = _run_stream(spark, tmp_path, df, windowed_event_counts, "wc")
    batch = (
        df.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    key = ["win_start", "event_type"]
    assert sorted(map(tuple, got.select(*key, "n_events", "sum_value").collect())) == sorted(
        map(tuple, batch.select(*key, "n_events", "sum_value").collect())
    )


def test_session_window_gap_splits_sessions(spark, tmp_path):
    rows = [
        (1, T0, 7, "click", 1.0),
        (2, T0 + dt.timedelta(minutes=10), 7, "click", 1.0),  # same session
        (3, T0 + dt.timedelta(minutes=50), 7, "click", 1.0),  # > 30 min gap: new session
        (4, T0 + dt.timedelta(minutes=5), 8, "view", 1.0),
    ]
    df = _mk(spark, rows)
    got = _run_stream(spark, tmp_path, df, sessionized_user_stats, "ss", mode="complete")
    u7 = got.filter(F.col("user_id") == 7).orderBy("sess_start").collect()
    assert [r["n_events"] for r in u7] == [2, 1]
    assert u7[0]["first_ts"] == T0
    assert u7[0]["last_ts"] == T0 + dt.timedelta(minutes=10)
    u8 = got.filter(F.col("user_id") == 8).collect()
    assert len(u8) == 1 and u8[0]["n_events"] == 1


def test_stream_static_enrichment(spark, tmp_path):
    from flightdb_spark.streaming.aggregates import enrich_stream_static

    rows = [
        (1, T0, 7, "click", 1.0),
        (2, T0 + dt.timedelta(minutes=1), 8, "view", 2.0),
        (3, T0 + dt.timedelta(minutes=2), 9, "click", 3.0),  # no dim row
    ]
    df = _mk(spark, rows)
    dim = spark.createDataFrame(
        [(7, "gold"), (8, "trial")], "user_id long, tier string"
    )
    src = str(tmp_path / "es_in")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        enrich_stream_static(stream, dim)
        .writeStream.format("memory")
        .queryName("es")
        .option("checkpointLocation", str(tmp_path / "es_ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = {r["event_id"]: r["tier"] for r in spark.table("es").collect()}
    assert got == {1: "gold", 2: "trial", 3: None}


def test_sliding_windows_match_batch_and_overlap(spark, tmp_path):
    from flightdb_spark.streaming.aggregates import sliding_window_stats

    rows = [
        (1, T0 + dt.timedelta(minutes=1), 7, "click", 1.0),
        (2, T0 + dt.timedelta(minutes=7), 7, "click", 2.0),
        (3, T0 + dt.timedelta(minutes=12), 8, "click", 4.0),
        # misordered arrival, still inside the watermark
        (4, T0 + dt.timedelta(minutes=3), 8, "click", 8.0),
    ]
    df = _mk(spark, rows)
    got = _run_stream(spark, tmp_path, df, sliding_window_stats, "sw")
    batch = (
        df.groupBy(F.window("ts", "10 minutes", "5 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)")).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    key = ["win_start", "event_type"]
    assert sorted(map(tuple, got.select(*key, "n_events", "sum_value").collect())) == sorted(
        map(tuple, batch.select(*key, "n_events", "sum_value").collect())
    )
    # every event appears in exactly window/slide = 2 windows
    assert got.agg(F.sum("n_events")).collect()[0][0] == 2 * len(rows)
