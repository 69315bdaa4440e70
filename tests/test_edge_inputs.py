"""Empty-input hardening: every core operator must return an empty
(not crashed) result on empty edges/streams/dims — the degenerate
partitions a 1000-executor job hits constantly."""

from datetime import datetime

from flightdb_spark.operators import textdedup
from flightdb_spark.operators.robust import mad_outliers
from flightdb_spark.operators.waypoints import (
    match_waypoints,
    match_waypoints_bucketed,
)
from flightdb_spark.streaming.fifoset import fifo_dedup_batch


def test_connected_components_empty_edges(spark):
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert textdedup.connected_components(empty).count() == 0
    assert textdedup.dedup_clusters(empty).count() == 0


def test_minhash_chain_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    sigs = textdedup.minhash_signatures(textdedup.shingles(docs), seeds=(0, 1))
    assert sigs.count() == 0
    bands = textdedup.lsh_bands(sigs, seeds=(0, 1))
    assert textdedup.lsh_candidate_pairs(bands).count() == 0


def test_mad_outliers_empty(spark):
    ev = spark.createDataFrame([], "event_id long, event_type string, value double")
    assert mad_outliers(ev).count() == 0
    assert mad_outliers(ev, exact=False).count() == 0


def test_fifo_dedup_empty(spark):
    df = spark.createDataFrame([], "registration string, callsign string, ts timestamp")
    assert fifo_dedup_batch(df).count() == 0


def test_waypoint_join_empty_dim(spark):
    tp = spark.createDataFrame(
        [("f1", "ADSB", datetime(2024, 6, 1), 37.0, -122.0)],
        "flight_id string, track string, ts timestamp, lat double, lon double",
    )
    dim = spark.createDataFrame([], "name string, lat double, lon double")
    assert match_waypoints(tp, dim).count() == 0
    assert match_waypoints_bucketed(tp, dim).count() == 0
