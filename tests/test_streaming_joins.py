"""Stream-stream interval join (streaming/joins.py): results match the
equivalent batch interval join; out-of-horizon and wrong-user pairs
are excluded."""

import datetime as dt

from pyspark.sql import functions as F

from flightdb_spark.streaming.joins import (
    click_purchase_attribution,
    stream_interval_join,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _run(spark, tmp_path, df, fn, name):
    src = str(tmp_path / f"{name}_in")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        fn(stream)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_click_purchase_attribution_matches_batch(spark, tmp_path):
    m = dt.timedelta
    rows = [
        (1, T0, 7, "click", 1.0),
        (2, T0 + m(minutes=10), 7, "purchase", 5.0),   # click1 +10min
        (3, T0 + m(minutes=45), 7, "purchase", 5.0),   # click1 +45 (out); click4 +5 (in)
        (4, T0 + m(minutes=40), 7, "click", 1.0),
        (5, T0 + m(minutes=50), 7, "purchase", 5.0),   # click1 +50 (out); click4 +10 (in)
        (6, T0 + m(minutes=5), 8, "purchase", 5.0),    # other user, no click
        (7, T0, 9, "click", 1.0),                      # click with no purchase
    ]
    df = _events(spark, rows)
    got = _run(spark, tmp_path, df, click_purchase_attribution, "cp_attr")
    pairs = sorted(
        (r.user_id, r.click_ts, r.purchase_ts, r.lag_us) for r in got.collect()
    )
    assert pairs == [
        (7, T0, T0 + m(minutes=10), 600_000_000),
        (7, T0 + m(minutes=40), T0 + m(minutes=45), 300_000_000),
        (7, T0 + m(minutes=40), T0 + m(minutes=50), 600_000_000),
    ]
    # cross-check the full pair set against the batch interval join
    clicks = df.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purch = df.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("purchase_ts")
    )
    batch = clicks.join(
        purch,
        (clicks.user_id == purch.u2)
        & (purch.purchase_ts > clicks.click_ts)
        & (purch.purchase_ts <= clicks.click_ts + F.expr("INTERVAL 30 minutes")),
    ).select("user_id", "click_ts", "purchase_ts")
    want = sorted((r.user_id, r.click_ts, r.purchase_ts) for r in batch.collect())
    assert [p[:3] for p in pairs] == want


def test_stream_interval_join_generic(spark, tmp_path):
    m = dt.timedelta
    left = spark.createDataFrame(
        [(7, T0), (8, T0 + m(minutes=5))], "user_id long, l_ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, T0 + m(minutes=20)), (8, T0 + m(hours=2))],
        "user_id long, r_ts timestamp",
    )
    lsrc, rsrc = str(tmp_path / "l_in"), str(tmp_path / "r_in")
    left.coalesce(1).write.parquet(lsrc)
    right.coalesce(1).write.parquet(rsrc)
    ls = spark.readStream.schema(left.schema).parquet(lsrc)
    rs = spark.readStream.schema(right.schema).parquet(rsrc)
    q = (
        stream_interval_join(ls, rs)
        .writeStream.format("memory")
        .queryName("gen_join")
        .option("checkpointLocation", str(tmp_path / "gen_ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = [(r.user_id, r.lag_us) for r in spark.table("gen_join").collect()]
    # user 8's right event is 2h out — beyond the 30-min horizon
    assert got == [(7, 1_200_000_000)]
