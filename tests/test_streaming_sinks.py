"""Exactly-once foreachBatch sink: redelivered batch ids are no-ops,
torn writes are invisible to readers."""

from flightdb_spark.streaming.sinks import IdempotentParquetSink


def _mk(spark, rows):
    return spark.createDataFrame(rows, "event_id long, v string")


def _run_stream(spark, src, sink, ckpt):
    q = (
        spark.readStream.schema("event_id long, v string")
        .option("maxFilesPerTrigger", 1)  # several micro-batches
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_exactly_once_across_restart_and_redelivery(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _mk(spark, [(1, "a"), (2, "b")]).coalesce(1).write.mode("append").parquet(src)
    _mk(spark, [(3, "c")]).coalesce(1).write.mode("append").parquet(src)

    sink = IdempotentParquetSink(out)
    _run_stream(spark, src, sink, ckpt)
    assert sorted(
        r["event_id"] for r in sink.read(spark).collect()
    ) == [1, 2, 3]
    ids = sink.committed_ids()
    assert len(ids) >= 2  # maxFilesPerTrigger=1 -> one batch per file

    # simulate a redelivery: re-run batch 0's writer call directly
    first = sink.read(spark).limit(1)
    sink(first, ids[0])
    assert ids[0] in sink.skipped  # marker made it a no-op
    assert sorted(r["event_id"] for r in sink.read(spark).collect()) == [1, 2, 3]

    # new data + SAME checkpoint -> only the new batch lands, exactly once
    _mk(spark, [(4, "d")]).coalesce(1).write.mode("append").parquet(src)
    _run_stream(spark, src, sink, ckpt)
    assert sorted(r["event_id"] for r in sink.read(spark).collect()) == [1, 2, 3, 4]


def test_torn_write_invisible_until_marked(spark, tmp_path):
    out = str(tmp_path / "torn")
    sink = IdempotentParquetSink(out)
    sink(_mk(spark, [(1, "a")]), 0)
    # write batch 1's data but "crash" before the marker
    _mk(spark, [(2, "b")]).write.parquet(f"{out}/batch_id=1")
    assert sink.committed_ids() == [0]
    assert [r["event_id"] for r in sink.read(spark).collect()] == [1]
    # redelivery of batch 1 completes the commit and rewrites cleanly
    sink(_mk(spark, [(2, "b")]), 1)
    assert sink.committed_ids() == [0, 1]
    assert sorted(r["event_id"] for r in sink.read(spark).collect()) == [1, 2]
