"""FIFOSet dedup (streaming/fifoset.py): reference fifoset.go parity —
admission anchored at last ADMISSION time, not last sighting — and
batch == stream on ordered input (the transformWithStateInPandas path
carries its anchor across micro-batches)."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from flightdb_spark.streaming.fifoset import (
    fifo_dedup_batch,
    fifo_dedup_stream,
    fifo_dedup_stream_legacy,
)


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False

T0 = datetime(2020, 1, 1, 12, 0, 0)
SCHEMA = "registration string, callsign string, ts timestamp, seq int"


def _rows():
    """One key sighted every 45 min for 5 hours: with a 2 h TTL the
    admissions are t+0 (anchor), t+2:15 (first >= +2 h), t+4:30.
    A second key appears once. fifoset.go:34-47: Created is set at
    AddIfNew and never refreshed, so the suppression window does NOT
    slide with repeat sightings."""
    rows = [
        ("N1", "SWA1", T0 + timedelta(minutes=45 * i), i) for i in range(7)
    ]
    rows.append(("N2", "UAL2", T0, 100))
    return rows


EXPECTED_SEQ = {0, 3, 6, 100}  # 45*3=135 >= 120; 45*6-135=135 >= 120


def test_fifo_dedup_batch_anchored_expiry(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    out = fifo_dedup_batch(df, ttl_s=7200)
    assert {r["seq"] for r in out.collect()} == EXPECTED_SEQ


def _stream_roundtrip(spark, tmp_path, dedup_fn):
    """Feed the rows as two ordered micro-batches (availableNow over
    two files); the state anchor must survive across batches so
    admissions equal the batch twin's."""
    rows = sorted(_rows(), key=lambda r: r[2])
    cut = len(rows) // 2
    src = os.path.join(tmp_path, "src")
    sink = os.path.join(tmp_path, "sink")
    ckpt = os.path.join(tmp_path, "ckpt")
    spark.createDataFrame(rows[:cut], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            dedup_fn(stream, ttl_s=7200)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    spark.createDataFrame(rows[cut:], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    return {r["seq"] for r in spark.read.parquet(sink).collect()}


def test_fifo_dedup_stream_legacy_matches_batch(spark, tmp_path):
    assert _stream_roundtrip(spark, tmp_path, fifo_dedup_stream_legacy) == EXPECTED_SEQ


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState state protocol needs google.protobuf "
    "(absent from this container); fifo_dedup_stream_legacy covers the "
    "same semantics on applyInPandasWithState",
)
def test_fifo_dedup_stream_tws_matches_batch(spark, tmp_path):
    assert _stream_roundtrip(spark, tmp_path, fifo_dedup_stream) == EXPECTED_SEQ
