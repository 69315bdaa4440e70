"""Douglas-Peucker simplification (operators/simplify.py): kept sets
on hand-built geometries, tiny-track edge cases, determinism."""

import datetime as dt

from flightdb_spark.operators.simplify import douglas_peucker

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _tp(spark, pts, flight_id=1):
    rows = [
        (flight_id, T0 + dt.timedelta(seconds=i), lat, lon)
        for i, (lat, lon) in enumerate(pts)
    ]
    return spark.createDataFrame(
        rows, "flight_id long, ts timestamp, lat double, lon double"
    )


def _kept(spark, pts, eps_km, flight_id=1):
    out = douglas_peucker(_tp(spark, pts, flight_id), eps_km)
    return sorted(r.point_idx for r in out.collect())


def test_straight_line_collapses_to_endpoints(spark):
    # colinear points along a meridian: everything between the ends is
    # within any positive epsilon of the chord
    pts = [(37.0 + 0.01 * i, -122.0) for i in range(10)]
    assert _kept(spark, pts, 0.1) == [0, 9]


def test_spike_survives(spark):
    # a 0.1-degree (~11 km) east spike must be kept at eps=1 km and
    # dropped at eps=20 km
    pts = [(37.0, -122.0), (37.05, -121.9), (37.1, -122.0)]
    assert _kept(spark, pts, 1.0) == [0, 1, 2]
    assert _kept(spark, pts, 20.0) == [0, 2]


def test_square_wave_keeps_apexes(spark):
    # N-S square wave: every corner deviates ~11 km from the overall
    # chord; all corners kept at 1 km
    pts = [
        (37.0, -122.0),
        (37.0, -121.9),
        (37.1, -121.9),
        (37.1, -121.8),
        (37.0, -121.8),
        (37.0, -121.7),
    ]
    assert _kept(spark, pts, 1.0) == [0, 1, 2, 3, 4, 5]


def test_tiny_tracks_kept_verbatim(spark):
    assert _kept(spark, [(37.0, -122.0)], 1.0) == [0]
    assert _kept(spark, [(37.0, -122.0), (37.5, -121.5)], 1.0) == [0, 1]


def test_multiple_flights_and_determinism(spark):
    a = _tp(spark, [(37.0 + 0.01 * i, -122.0) for i in range(5)], flight_id=1)
    b = _tp(
        spark, [(37.0, -122.0), (37.05, -121.9), (37.1, -122.0)], flight_id=2
    )
    df = a.union(b)
    got1 = sorted(
        (r.flight_id, r.point_idx) for r in douglas_peucker(df, 1.0).collect()
    )
    got2 = sorted(
        (r.flight_id, r.point_idx) for r in douglas_peucker(df, 1.0).collect()
    )
    assert got1 == got2
    assert got1 == [(1, 0), (1, 4), (2, 0), (2, 1), (2, 2)]
