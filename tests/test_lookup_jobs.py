"""Lookup surface (api.py), waypoint matching, condensed/summary jobs."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from flightdb_spark import api
from flightdb_spark.jobs import condensed_daily, flights_summary
from flightdb_spark.operators.waypoints import match_waypoints, set_waypoints

T0 = datetime(2024, 6, 1, 18, 0, 0)  # 11:00 PDT


@pytest.fixture()
def flights(spark):
    rows = [
        ("A23A23_100", "A23A23", "UAL123", None, "B738", "LAX", "SFO",
         T0, T0 + timedelta(minutes=40), ["AL"], {"WPA": T0 + timedelta(minutes=10)}),
        ("A23A23_200", "A23A23", "UAL9", None, "B738", "SFO", "SEA",
         T0 + timedelta(hours=3), T0 + timedelta(hours=4), ["AL"], {}),
        ("N1_1", None, "N839AL", "N839AL", "C172", "SQL", None,
         T0 + timedelta(hours=8), T0 + timedelta(hours=9), ["GA"], {}),
    ]
    return spark.createDataFrame(
        rows,
        "flight_id string, icao_id string, callsign string, registration string, "
        "equip_type string, orig string, dest string, first_ts timestamp, "
        "last_ts timestamp, tags array<string>, waypoints map<string,timestamp>",
    )


def test_by_idspec_icao_point(flights):
    epoch = int((T0 + timedelta(minutes=5)).timestamp())
    got = api.lookup_all(flights, api.by_idspec(f"A23A23@{epoch}")).collect()
    assert [r["flight_id"] for r in got] == ["A23A23_100"]


def test_by_idspec_range_matches_several(flights):
    s = int(T0.timestamp())
    e = int((T0 + timedelta(hours=5)).timestamp())
    got = api.lookup_all(flights, api.by_idspec(f"A23A23@{s}:{e}")).collect()
    assert {r["flight_id"] for r in got} == {"A23A23_100", "A23A23_200"}


def test_by_idspec_registration_fallback(flights):
    epoch = int((T0 + timedelta(hours=8, minutes=30)).timestamp())
    got = api.lookup_all(flights, api.by_idspec(f"N839AL@{epoch}")).collect()
    assert [r["flight_id"] for r in got] == ["N1_1"]


def test_lookup_most_recent(flights):
    got = api.lookup_most_recent(flights, api.by_icao_id("A23A23")).collect()
    assert [r["flight_id"] for r in got] == ["A23A23_200"]


def test_query_for_recent_with_tags_and_waypoints(flights):
    got = api.query_for_recent(flights, ["AL"], 10, waypoints=["WPA"]).collect()
    assert [r["flight_id"] for r in got] == ["A23A23_100"]


def test_snapshot_at(spark):
    tp = spark.createDataFrame(
        [("f1", "ADSB", T0 + timedelta(minutes=m), 37.0 + m * 0.01, -122.0, 5000.0, 250.0)
         for m in range(5)],
        "flight_id string, track string, ts timestamp, lat double, lon double, "
        "alt_ft double, groundspeed_kt double",
    )
    snap = api.snapshot_at(tp, T0 + timedelta(minutes=2, seconds=30)).collect()
    assert len(snap) == 1 and snap[0]["lat"] == pytest.approx(37.02)


def test_match_and_set_waypoints(spark, flights):
    # track passes straight over WPX (37.5, -122.0); WPY is 1° away
    tp = spark.createDataFrame(
        [("A23A23_100", "ADSB", T0 + timedelta(minutes=m), 37.46 + 0.02 * m, -122.0, 5000.0, 250.0)
         for m in range(5)],
        "flight_id string, track string, ts timestamp, lat double, lon double, "
        "alt_ft double, groundspeed_kt double",
    )
    wps = spark.createDataFrame(
        [("WPX", 37.5, -122.0), ("WPY", 38.5, -121.0)], "name string, lat double, lon double"
    )
    crossings = match_waypoints(tp, wps).collect()
    assert len(crossings) == 1
    c = crossings[0]
    assert c["waypoint"] == "WPX"
    # crossing stamped at segment END: first segment touching the 1-km
    # box around 37.5 is (37.48 -> 37.50), end ts = T0+2min
    assert c["ts"] == T0 + timedelta(minutes=2)

    updated = set_waypoints(flights, match_waypoints(tp, wps))
    m = {r["flight_id"]: r["waypoints"] for r in updated.collect()}
    assert "WPX" in m["A23A23_100"] and m["N1_1"] == {}


def test_condensed_daily(spark, flights):
    out = condensed_daily(flights, "2024-06-01").collect()
    assert len(out) == 3  # all three start on the same PDT day
    by_id = {r["idspec"]: r for r in out}
    assert f"A23A23@{int(T0.timestamp())}" in by_id


def test_flights_summary_shape_and_dedupe(spark, flights):
    tp = spark.createDataFrame(
        [("A23A23_100", "ADSB", T0 + timedelta(minutes=m), 37.0, -122.0, 1000.0 * m, 250.0)
         for m in range(4)],
        "flight_id string, track string, ts timestamp, lat double, lon double, "
        "alt_ft double, groundspeed_kt double",
    )
    out = flights_summary(flights, tp, "2024-06-01")
    rows = {r["flight_id"]: r for r in out.collect()}
    assert rows["A23A23_100"]["n_points"] == 4
    assert rows["A23A23_100"]["max_alt_ft"] == 3000.0
    assert rows["A23A23_100"]["track_sources"] == ["ADSB"]
    assert rows["A23A23_100"]["waypoints"][0]["name"] == "WPA"
    # a flight starting on a different PDT date is excluded by the
    # midnight-straddle rule
    assert "N1_1" in rows  # 2:00 UTC+8h = same PDT day (11pm? no: 18+8=26 -> 02:00 UTC next day = 19:00 PDT same day)


def test_timeslots_quantization(spark):
    from datetime import timezone

    fl = spark.createDataFrame(
        [("f1", datetime(2024, 6, 1, 18, 10), datetime(2024, 6, 1, 19, 5))],
        "flight_id string, first_ts timestamp, last_ts timestamp",
    ).withColumn("timeslots", api.timeslots(F.col("first_ts"), F.col("last_ts")))
    row = fl.collect()[0]
    # span 18:10-19:05 overlaps slots 18:00, 18:30, 19:00
    assert [t.minute for t in row["timeslots"]] == [0, 30, 0]
    assert len(row["timeslots"]) == 3
    hit = fl.filter(api.by_time_quantized(datetime(2024, 6, 1, 18, 45))).count()
    miss = fl.filter(api.by_time_quantized(datetime(2024, 6, 1, 20, 0))).count()
    assert hit == 1 and miss == 0


def test_trajectory_hausdorff_and_grid(spark):
    from flightdb_spark.operators.trajectory import (
        candidate_pairs_by_grid,
        symmetric_hausdorff,
    )

    # fa and fb fly parallel tracks 0.1 deg apart; fc flies far away
    rows = []
    for i in range(5):
        rows.append(("fa", 37.0 + 0.01 * i, -122.0))
        rows.append(("fb", 37.0 + 0.01 * i, -122.1))
        rows.append(("fc", 45.0 + 0.01 * i, -100.0))
    tp = spark.createDataFrame(rows, "flight_id string, lat double, lon double")
    h = {(r["flight_a"], r["flight_b"]): r["hausdorff_km"]
         for r in symmetric_hausdorff(tp).collect()}
    # parallel tracks: Hausdorff ≈ 0.1 deg lon at 37N ≈ 8.84 km
    assert h[("fa", "fb")] == pytest.approx(0.1 * 111.32 * 0.7986, rel=0.01)
    assert h[("fa", "fc")] > 1000
    pairs = {(r["flight_a"], r["flight_b"])
             for r in candidate_pairs_by_grid(tp).collect()}
    assert ("fa", "fb") in pairs          # share a 0.5-deg cell
    assert ("fa", "fc") not in pairs      # never co-located


def test_hausdorff_grid_matches_exact_on_candidates(spark):
    from flightdb_spark.operators.trajectory import (
        candidate_pairs_by_grid,
        symmetric_hausdorff,
        symmetric_hausdorff_grid,
    )

    rows = []
    for i in range(5):
        rows.append(("fa", 37.0 + 0.01 * i, -122.0))
        rows.append(("fb", 37.0 + 0.01 * i, -122.1))
        rows.append(("fc", 45.0 + 0.01 * i, -100.0))
        rows.append(("fd", 45.0 + 0.01 * i, -100.05))
    tp = spark.createDataFrame(rows, "flight_id string, lat double, lon double")
    exact = {(r["flight_a"], r["flight_b"]): r["hausdorff_km"]
             for r in symmetric_hausdorff(tp).collect()}
    gated = {(r["flight_a"], r["flight_b"]): r["hausdorff_km"]
             for r in symmetric_hausdorff_grid(tp).collect()}
    pairs = {(r["flight_a"], r["flight_b"])
             for r in candidate_pairs_by_grid(tp).collect()}
    # the grid only prunes: every surviving pair's value is exact
    assert set(gated) == pairs
    for p, v in gated.items():
        assert v == pytest.approx(exact[p], rel=1e-9)
    # and the far pairs were pruned, not computed
    assert ("fa", "fc") not in gated and ("fa", "fb") in gated


def test_match_waypoints_bucketed_equals_range_join(spark):
    """The grid equi-join scale path returns exactly the broadcast
    range join's crossings on a randomized fleet x waypoint-grid
    workload (incl. segments spanning cell boundaries)."""
    import random

    from flightdb_spark.operators.waypoints import match_waypoints_bucketed

    rnd = random.Random(7)
    rows = []
    for f in range(12):
        lat, lon = 37.0 + rnd.random(), -122.5 + rnd.random()
        for m in range(30):
            lat += (rnd.random() - 0.45) * 0.03
            lon += (rnd.random() - 0.5) * 0.03
            rows.append(
                (f"F{f}", "ADSB", T0 + timedelta(minutes=m), lat, lon, 5000.0, 250.0)
            )
    tp = spark.createDataFrame(
        rows,
        "flight_id string, track string, ts timestamp, lat double, lon double, "
        "alt_ft double, groundspeed_kt double",
    )
    wps = spark.createDataFrame(
        [
            (f"W{i}_{j}", 37.0 + i * 0.1, -122.5 + j * 0.1)
            for i in range(11)
            for j in range(11)
        ],
        "name string, lat double, lon double",
    )
    base = {
        (r["flight_id"], r["waypoint"], r["ts"])
        for r in match_waypoints(tp, wps).collect()
    }
    assert base  # the random walk crosses some of the 121 fixes
    for cell_deg in (0.05, 0.2):
        got = {
            (r["flight_id"], r["waypoint"], r["ts"])
            for r in match_waypoints_bucketed(tp, wps, cell_deg=cell_deg).collect()
        }
        assert got == base
