"""Incremental near-dup ingest gate (streaming/neardup.py): cross-batch
index suppression, intra-batch first-wins, exactly-once redelivery."""

from __future__ import annotations

import os

from flightdb_spark.streaming.neardup import NearDupIndexGate, neardup_gate_stream

SCHEMA = "doc_id long, text string"

T_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
T_B = "one two three four five six seven eight nine ten eleven twelve"
T_C = "red orange yellow green blue indigo violet ultraviolet infra deep"
T_D = "north south east west up down left right forward backward sideways"


def _run(spark, tmp_path, gate, rows, src_name):
    """Append one file to the SHARED source and drain with the SHARED
    checkpoint — the second call is a new micro-batch of the same
    logical stream (batch ids advance), exactly like production."""
    src = os.path.join(tmp_path, "src")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = neardup_gate_stream(stream, gate, os.path.join(tmp_path, "ckpt"))
    q.awaitTermination(120)


def test_neardup_gate_cross_and_intra_batch(spark, tmp_path):
    tmp_path = str(tmp_path)
    gate = NearDupIndexGate(
        os.path.join(tmp_path, "accepted"), os.path.join(tmp_path, "index")
    )
    # batch 1: A and B unique; D and its exact copy D' (doc 13) — D
    # (smaller id) wins
    _run(spark, tmp_path, gate, [(1, T_A), (2, T_B), (12, T_D), (13, T_D)], "b1")
    # batch 2: exact copy of A (rejected vs index), fresh C (accepted)
    _run(spark, tmp_path, gate, [(21, T_A), (22, T_C)], "b2")

    got = {r["doc_id"] for r in gate.read_accepted(spark).collect()}
    assert got == {1, 2, 12, 22}
    assert [s["n_accepted"] for s in gate.stats if not s["redelivered"]] == [3, 1]


def test_neardup_gate_redelivery_is_noop(spark, tmp_path):
    tmp_path = str(tmp_path)
    gate = NearDupIndexGate(
        os.path.join(tmp_path, "accepted"), os.path.join(tmp_path, "index")
    )
    batch = spark.createDataFrame([(1, T_A), (2, T_B)], SCHEMA)
    gate(batch, 0)
    n_files = len(os.listdir(os.path.join(tmp_path, "accepted", "batch_id=0")))
    gate(batch, 0)  # redelivered
    assert gate.stats[-1]["redelivered"]
    assert (
        len(os.listdir(os.path.join(tmp_path, "accepted", "batch_id=0"))) == n_files
    )
    assert {r["doc_id"] for r in gate.read_accepted(spark).collect()} == {1, 2}
