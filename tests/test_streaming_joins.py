"""Stream-stream joins (streaming/joins.py): the watermarked
attribution join matches its batch twin, and the outer variant emits
unmatched rows exactly once."""

import datetime as dt

from flightdb_spark.streaming.joins import attribute_within_horizon

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")


def _run(spark, tmp_path, imps, clicks, name, how="inner"):
    idir, cdir = str(tmp_path / f"{name}_i"), str(tmp_path / f"{name}_c")
    imps.coalesce(1).write.parquet(idir)
    clicks.coalesce(1).write.parquet(cdir)
    si = spark.readStream.schema(imps.schema).parquet(idir)
    sc = spark.readStream.schema(clicks.schema).parquet(cdir)
    q = (
        attribute_within_horizon(si, sc, how=how)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


IMPS = [
    (10, T0, 1),
    (11, T0 + dt.timedelta(minutes=5), 1),
    (12, T0 + dt.timedelta(minutes=2), 2),
    (13, T0, 3),  # user 3 never clicks
    # flush row: pushes the global watermark (min across sources - 30m)
    # past click 21 + horizon so the outer join can PROVE it unmatched
    (30, T0 + dt.timedelta(hours=2), 9),
]
CLICKS = [
    (20, T0 + dt.timedelta(minutes=7), 1),   # joins imps 10 and 11
    (21, T0 + dt.timedelta(minutes=30), 2),  # outside the 10-min horizon
    (22, T0 + dt.timedelta(minutes=3), 2),   # joins imp 12
    (31, T0 + dt.timedelta(hours=2, minutes=1), 9),  # flush; joins imp 30
]
MATCHED = {(20, 10), (20, 11), (22, 12), (31, 30)}


def test_stream_join_matches_batch(spark, tmp_path):
    imps, clicks = _mk(spark, IMPS), _mk(spark, CLICKS)
    got = _run(spark, tmp_path, imps, clicks, "ssj")
    batch = attribute_within_horizon(imps, clicks)  # watermark no-op on batch
    cols = ["user_id", "follow_id", "lead_id"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, batch.select(*cols).collect())
    )
    # click 20 attributed to both in-horizon impressions, click 22 to one
    pairs = {(r["follow_id"], r["lead_id"]) for r in got.collect()}
    assert pairs == MATCHED


def test_stream_outer_join_emits_unmatched_follow(spark, tmp_path):
    imps, clicks = _mk(spark, IMPS), _mk(spark, CLICKS)
    got = _run(spark, tmp_path, imps, clicks, "ssj_outer", how="leftOuter")
    unmatched = [r for r in got.collect() if r["lead_id"] is None]
    # click 21 (past the horizon) emits exactly once with a NULL lead
    assert [(r["follow_id"], r["user_id"]) for r in unmatched] == [(21, 2)]
    matched = {(r["follow_id"], r["lead_id"]) for r in got.collect() if r["lead_id"]}
    assert matched == MATCHED
