"""Storage-layout jobs: bucketing eliminates the Exchange, compaction
reduces file count and keeps data identical."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flightdb_spark.storage import bucketize, compact


def test_bucketed_window_has_no_exchange(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS tp_bucketed")
    df = spark.range(1000).select(
        (F.col("id") % 50).alias("flight_id"), F.col("id").alias("ts")
    )
    bucketize(df, "tp_bucketed", "flight_id", buckets=8,
              sort_cols=("flight_id", "ts"), path=str(tmp_path / "tp_bucketed"))
    t = spark.table("tp_bucketed")

    # groupBy on the bucket key: no Exchange in the plan
    agg_plan = t.groupBy("flight_id").count()._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in agg_plan, agg_plan

    # window on the bucket key: no Exchange either
    w = W.partitionBy("flight_id").orderBy("ts")
    win_plan = t.withColumn("rn", F.row_number().over(w))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in win_plan, win_plan

    # co-bucketed self-join: force sort-merge (broadcast would win at
    # this toy size) and verify neither side shuffles
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        join_plan = (
            t.alias("a").join(spark.table("tp_bucketed").alias("b"), "flight_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange hashpartitioning" not in join_plan, join_plan
        assert "SortMergeJoin" in join_plan, join_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS tp_bucketed")


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "small_files")
    df = spark.range(10_000).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("v")
    )
    df.repartition(64).write.parquet(src)  # 64 tiny files
    n_in = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert n_in == 64

    out = str(tmp_path / "compacted")
    n_out = compact(spark, src, out, key="k", target_mb=1)
    assert n_out < n_in

    back = spark.read.parquet(out)
    assert back.count() == 10_000
    assert back.exceptAll(df).count() == 0

    # range partitioning: per-file key ranges are disjoint
    files = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )
    ranges = []
    for f in files:
        r = spark.read.parquet(f).agg(F.min("k"), F.max("k")).first()
        ranges.append((r[0], r[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_dedup_stream_suppresses_duplicates(spark, tmp_path):
    """Streaming ingest dedup: identical (normalized) texts arriving
    within the watermark collapse to one delivery."""
    import datetime as dt

    from pyspark.sql import functions as F  # noqa: F811

    from flightdb_spark.operators.textdedup import dedup_stream

    src = str(tmp_path / "docs_in")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, "the quick brown fox", t0),
        (2, "THE QUICK BROWN FOX", t0 + dt.timedelta(minutes=1)),  # dup after norm
        (3, "a different document", t0 + dt.timedelta(minutes=2)),
        (4, "the quick brown fox", t0 + dt.timedelta(minutes=3)),     # dup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = str(tmp_path / "docs_out")
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in got] in ([1, 3], [2, 3], [1, 3, 4], [2, 3, 4])
    fps = {r["fingerprint"] for r in got}
    assert len(fps) == len(got) or len(got) == 2


def test_salted_agg_matches_plain(spark):
    from flightdb_spark.operators.skew import salted_agg

    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 8, "HOT").otherwise(F.col("id").cast("string")).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    got = salted_agg(
        df, "k",
        {"n": ("*", "count"), "sv": ("v", "sum"), "mx": ("v", "max")},
        n_salts=8,
    ).toPandas().set_index("k").sort_index()
    want = (
        df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.max("v").alias("mx"))
        .toPandas().set_index("k").sort_index()
    )
    assert got.equals(want)


def test_salted_broadcast_join_matches_plain(spark):
    from flightdb_spark.operators.skew import salted_broadcast_join

    big = spark.range(5_000).select(
        F.when(F.col("id") % 5 < 4, "HOT").otherwise(F.col("id").cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.createDataFrame(
        [("HOT", "hot-dim"), ("1", "one"), ("7", "seven")], "k string, d string"
    )
    got = salted_broadcast_join(big, dim, "k", n_salts=4)
    want = big.join(dim, "k")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # right/full would replicate unmatched dim keys once per salt — refused
    import pytest

    for bad in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_broadcast_join(big, dim, "k", n_salts=4, how=bad)


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """A narrow longitude band must touch far fewer z-ordered files
    than lat-sorted files (which each span the full lon range)."""
    import itertools

    from pyspark.sql import functions as F

    from flightdb_spark.storage import zorder_write

    pts = [
        (i, -90.0 + 180.0 * ((i * 37) % 64) / 64, -180.0 + 360.0 * ((i * 53) % 64) / 64)
        for i in range(4096)
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")

    zdir = str(tmp_path / "zorder")
    ndir = str(tmp_path / "latsort")
    zorder_write(df, zdir, n_files=16)
    df.repartitionByRange(16, F.col("lat")).sortWithinPartitions("lat").write.parquet(ndir)

    def files_touching(path, lo, hi):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min("lon").alias("mn"), F.max("lon").alias("mx"))
            .collect()
        )
        assert len(per_file) >= 8
        return sum(1 for r in per_file if r["mx"] >= lo and r["mn"] <= hi)

    z_touched = files_touching(zdir, -10.0, 10.0)
    n_touched = files_touching(ndir, -10.0, 10.0)
    assert z_touched < n_touched  # two-dim clustering prunes; slab layout cannot
    # and the z-ordered copy is lossless
    assert spark.read.parquet(zdir).count() == 4096


def test_manifest_pruned_read(spark, tmp_path):
    """Range-partitioned layout + manifest => a narrow range scan reads
    a strict subset of files and returns exactly the full-scan result."""
    from flightdb_spark.storage import build_manifest, compact, pruned_read
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    spark.range(0, 2_000_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartition(8).write.mode("overwrite").parquet(src)
    packed = str(tmp_path / "packed")
    compact(spark, src, packed, key="k", target_mb=1)

    manifest = build_manifest(spark, packed, "k").cache()
    n_files = manifest.count()
    assert n_files > 1  # compaction produced a multi-file layout

    df, read, total = pruned_read(spark, packed, "k", 100, 120, manifest=manifest)
    assert total == n_files and 0 < read < total  # skipping happened
    expect = (
        spark.read.parquet(packed).filter(F.col("k").between(100, 120))
    )
    assert df.exceptAll(expect).count() == 0
    assert expect.exceptAll(df).count() == 0

    empty, read0, _ = pruned_read(
        spark, packed, "k", 5_000_000, 6_000_000, manifest=manifest
    )
    assert read0 == 0 and empty.count() == 0
    manifest.unpersist()
