"""CdcStateTable: streamed MERGE == whole-feed batch collapse,
bucket-level copy-on-write pruning, redelivery idempotence, tombstone
deletes, time travel."""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import functions as F

from flightdb_spark.streaming.cdc import CdcStateTable, apply_cdc_stream
from flightdb_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _run_stream(spark, src, table, ckpt):
    q = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(table)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_streamed_merge_equals_batch_collapse(spark, tmp_path):
    """The events feed split into 3 micro-batches through the CDC
    table must equal the one-shot last-wins collapse of the whole
    feed (tombstone semantics of q176: final 'error' deletes)."""
    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    # three chronological micro-batches (CDC feeds arrive in order)
    days = [10, 20, 40]
    lo = None
    for i, d in enumerate(days):
        hi = F.lit(f"2024-01-{d:02d}" if d <= 31 else "2024-02-09").cast(
            "timestamp"
        )
        part = ev.filter(F.col("ts") < hi)
        if lo is not None:
            part = part.filter(F.col("ts") >= lo)
        part.coalesce(1).write.mode("append").parquet(src)
        lo = hi

    table = CdcStateTable(
        str(tmp_path / "state"),
        key_col="user_id",
        order_cols=["ts", "event_id"],
        tombstone="event_type = 'error'",
        n_buckets=4,
    )
    _run_stream(spark, src, table, str(tmp_path / "ckpt"))

    got = {
        r["user_id"]: (r["event_type"], r["value"])
        for r in table.read(spark).collect()
    }
    order = F.struct("ts", "event_id")
    expect = {
        r["user_id"]: (r["attr"], r["val"])
        for r in ev.groupBy("user_id")
        .agg(
            F.max_by("event_type", order).alias("attr"),
            F.max_by("value", order).alias("val"),
        )
        .filter(F.col("attr") != "error")
        .collect()
    }
    assert got == expect


def test_bucket_pruning_carries_untouched_buckets_by_reference(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows0 = [(i, base, i, "view", float(i)) for i in range(16)]
    df0 = spark.createDataFrame(
        rows0, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )
    table = CdcStateTable(
        str(tmp_path / "state"), "user_id", ["ts", "event_id"], n_buckets=8
    )
    table(df0, 0)
    # second batch touches ONE key
    df1 = spark.createDataFrame(
        [(100, base + dt.timedelta(days=1), 3, "purchase", 9.0)],
        df0.schema,
    )
    table(df1, 1)
    m0 = json.load(open(os.path.join(table._vdir(0), "_MANIFEST.json")))
    m1 = json.load(open(os.path.join(table._vdir(1), "_MANIFEST.json")))
    rewritten = [b for b in m1 if m1[b] != m0.get(b)]
    assert len(rewritten) == 1  # only the touched bucket rewrote
    carried = [b for b in m1 if m1[b] == m0.get(b)]
    assert len(carried) == len(m0) - 1
    got = {r["user_id"]: r["event_type"] for r in table.read(spark).collect()}
    assert got[3] == "purchase" and got[0] == "view" and len(got) == 16


def test_redelivery_is_noop_and_time_travel(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    df0 = spark.createDataFrame([(1, base, 1, "view", 1.0)], schema)
    df1 = spark.createDataFrame(
        [(2, base + dt.timedelta(hours=1), 1, "purchase", 2.0)], schema
    )
    table = CdcStateTable(str(tmp_path / "state"), "user_id", ["ts", "event_id"])
    table(df0, 0)
    table(df1, 1)
    assert table.committed_versions() == [0, 1]
    table(df1, 1)  # redelivery: same batch id
    assert table.committed_versions() == [0, 1]  # no new version
    # time travel: version 0 still readable
    assert table.read(spark, version=0).collect()[0]["event_type"] == "view"
    assert table.read(spark).collect()[0]["event_type"] == "purchase"


def test_tombstone_deletes_key(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    table = CdcStateTable(
        str(tmp_path / "state"),
        "user_id",
        ["ts", "event_id"],
        tombstone="event_type = 'error'",
    )
    table(spark.createDataFrame([(1, base, 1, "view", 1.0), (2, base, 2, "view", 2.0)], schema), 0)
    table(
        spark.createDataFrame(
            [(3, base + dt.timedelta(hours=1), 1, "error", 0.0)], schema
        ),
        1,
    )
    got = [r["user_id"] for r in table.read(spark).collect()]
    assert got == [2]


def test_apply_cdc_stream_helper(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    src = str(tmp_path / "src")
    spark.createDataFrame([(1, base, 1, "view", 1.0)], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    table = CdcStateTable(str(tmp_path / "state"), "user_id", ["ts", "event_id"])
    q = apply_cdc_stream(
        spark.readStream.schema(schema).parquet(src), table, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    assert table.read(spark).count() == 1
