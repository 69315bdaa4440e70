"""DTW trajectory distance (operators/trajectory.py::dtw_via_pairs):
identity, symmetry, translation sensitivity, and a hand-checked value."""

import datetime as dt

from flightdb_spark.operators.trajectory import dtw_via_pairs

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _tp(spark, tracks):
    rows = []
    for fid, pts in tracks.items():
        for i, (lat, lon) in enumerate(pts):
            rows.append((fid, T0 + dt.timedelta(seconds=i), lat, lon))
    return spark.createDataFrame(
        rows, "flight_id long, ts timestamp, lat double, lon double"
    )


def _pairs(spark, pairs):
    return spark.createDataFrame(pairs, "flight_a long, flight_b long")


def test_identical_tracks_have_zero_dtw(spark):
    path = [(37.0 + 0.01 * i, -122.0) for i in range(10)]
    tp = _tp(spark, {1: path, 2: path})
    got = dtw_via_pairs(tp, _pairs(spark, [(1, 2)])).collect()
    assert len(got) == 1 and got[0].dtw_km == 0.0


def test_symmetry(spark):
    a = [(37.0 + 0.01 * i, -122.0) for i in range(8)]
    b = [(37.0 + 0.01 * i, -121.9) for i in range(8)]
    tp = _tp(spark, {1: a, 2: b})
    d12 = dtw_via_pairs(tp, _pairs(spark, [(1, 2)])).collect()[0].dtw_km
    # swap roles: same distance
    tp2 = _tp(spark, {1: b, 2: a})
    d21 = dtw_via_pairs(tp2, _pairs(spark, [(1, 2)])).collect()[0].dtw_km
    assert d12 == d21 > 0


def test_reversed_track_scores_far(spark):
    # Hausdorff would call these identical; DTW must not
    path = [(37.0 + 0.02 * i, -122.0) for i in range(10)]
    tp = _tp(spark, {1: path, 2: list(reversed(path))})
    d = dtw_via_pairs(tp, _pairs(spark, [(1, 2)])).collect()[0].dtw_km
    assert d > 5.0


def test_constant_offset_value(spark):
    # two parallel 2-point tracks 0.1 deg of latitude apart:
    # every aligned step costs 11.132 km; symmetric DTW path = 2 steps
    a = [(37.0, -122.0), (37.01, -122.0)]
    b = [(37.1, -122.0), (37.11, -122.0)]
    tp = _tp(spark, {1: a, 2: b})
    d = dtw_via_pairs(tp, _pairs(spark, [(1, 2)])).collect()[0].dtw_km
    assert abs(d - 2 * 11.132) < 0.01
