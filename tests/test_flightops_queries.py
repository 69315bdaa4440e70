"""Invariant checks for batch 45 (q334-q336), plus hand-built
geometry cases for the holding and go-around detectors."""

import datetime as dt

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.synth import synth_trackpoints

REGISTRY = load_registry()


def _toy_track(spark, pts):
    base = dt.datetime(2026, 1, 1)
    rows = [
        (1, i, base + dt.timedelta(minutes=i), lat, lon, alt)
        for i, (lat, lon, alt) in enumerate(pts)
    ]
    return spark.createDataFrame(
        rows, ["flight_id", "event_id", "ts", "lat", "lon", "alt_ft"]
    )


def test_holding_flags_a_circle(spark, monkeypatch):
    import math

    # 16 points around a small circle (two full laps worth of heading
    # change inside any 10-point window after the first lap)
    pts = [
        (37.0 + 0.01 * math.cos(2 * math.pi * i / 8),
         -122.0 + 0.01 * math.sin(2 * math.pi * i / 8),
         5000.0)
        for i in range(16)
    ]
    import flightdb_spark.queries.flightops as fo

    monkeypatch.setattr(
        fo, "synth_trackpoints", lambda s, d: _toy_track(spark, pts)
    )
    out = fo.q334_holding_detection.__wrapped__(spark, "ignored") \
        if hasattr(fo.q334_holding_detection, "__wrapped__") \
        else fo.q334_holding_detection(spark, "ignored")
    pdf = out.toPandas()
    assert len(pdf) == 1 and pdf.n_holding_windows.iloc[0] >= 1


def test_go_around_fires_on_descend_then_climb(spark, monkeypatch):
    import flightdb_spark.queries.flightops as fo

    pts = (
        [(37.0, -122.0, 6000.0 - 500 * i) for i in range(8)]  # descend to 2500
        + [(37.0, -122.0, 2500.0 + 800 * i) for i in range(1, 8)]  # climb out
    )
    monkeypatch.setattr(
        fo, "synth_trackpoints", lambda s, d: _toy_track(spark, pts)
    )
    out = fo.q335_go_around(spark, "ignored").toPandas()
    assert len(out) == 1
    assert out.n_go_arounds.iloc[0] >= 1
    assert out.lowest_abort_alt_ft.iloc[0] <= 3000.0


def test_phase_segments_cover_all_steps(spark, sf_dir):
    out = REGISTRY["q336_phase_segments"].fn(spark, sf_dir).toPandas()
    tp = synth_trackpoints(spark, sf_dir)
    n_pts = tp.count()
    n_flights = tp.select("flight_id").distinct().count()
    # every step (point minus the per-flight first) is in exactly one segment
    assert (out.n_segments * out.avg_len).sum().round() == n_pts - n_flights
    assert (out.max_len >= 1).all()
