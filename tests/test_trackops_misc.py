"""Track-array operators, enrichment joins, sinks, restrictor store, ACL."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from flightdb_spark import georestrictors
from flightdb_spark.operators.enrich import enrich_schedule, merge_identity, overlay_airframe
from flightdb_spark.operators.intersect import Restrictor
from flightdb_spark.operators.trackops import (
    clip_to,
    full_bounding_box,
    indices_at_dists_from,
    interpolate_heading,
    padded_trim_to_times,
    prune_track_contents,
    reposition_by_time,
    sample_every,
    windowed_average_at,
)
from flightdb_spark.sinks import archive_verified, flights_to_json, import_flights_json, write_report_csv

T0 = datetime(2024, 6, 1, 18, 0, 0)


@pytest.fixture()
def tp(spark):
    rows = [("f1", "ADSB", T0 + timedelta(seconds=10 * i), 37.0 + 0.01 * i, -122.0,
             1000.0 + 100 * i, 250.0) for i in range(10)]
    return spark.createDataFrame(
        rows, "flight_id string, track string, ts timestamp, lat double, lon double, "
              "alt_ft double, groundspeed_kt double")


def test_clip_and_padded_trim(tp):
    got = clip_to(tp, T0 + timedelta(seconds=30), T0 + timedelta(seconds=60)).count()
    assert got == 4
    # reversed endpoints swap (track.go:583)
    assert clip_to(tp, T0 + timedelta(seconds=60), T0 + timedelta(seconds=30)).count() == 4
    padded = padded_trim_to_times(tp, T0 + timedelta(seconds=30), T0 + timedelta(seconds=60), pad=1)
    assert padded.count() == 6  # 4 + one neighbor either side


def test_sample_every(tp):
    # 10 points at 10 s spacing, 30 s buckets -> ceil coverage ≈ 4 buckets
    got = sample_every(tp, 30.0).count()
    assert got == 4


def test_as_lines_sampled_every(tp):
    from flightdb_spark.operators.trackops import as_lines_sampled_every

    # 4 sampled points -> 3 consecutive line segments, time-ordered
    segs = as_lines_sampled_every(tp, 30.0).orderBy("t0").collect()
    assert len(segs) == 3
    for s in segs:
        assert s["t0"] < s["t1"]
        assert s["lat1"] > s["lat0"]  # northbound track
    # segments chain: each segment starts where the previous ended
    for a, b in zip(segs, segs[1:]):
        assert a["t1"] == b["t0"] and a["lat1"] == b["lat0"]


def test_windowed_average(tp):
    out = windowed_average_at(tp, T0 + timedelta(seconds=45), 30.0).collect()[0]
    # points at 30,40,50,60 s -> lats 37.03..37.06 avg 37.045
    assert out["lat"] == pytest.approx(37.045)
    assert out["n_averaged"] == 4


def test_prune_and_bbox(tp):
    pruned = prune_track_contents(tp).orderBy("ts").collect()
    assert len(pruned) == 2 and pruned[0]["lat"] == 37.0 and pruned[1]["lat"] == pytest.approx(37.09)
    box = full_bounding_box(tp).collect()[0]
    assert box["lat_min"] == 37.0 and box["lat_max"] == pytest.approx(37.09)


def test_indices_at_dists(tp):
    # ref point north of the track end; flight approaches it
    out = indices_at_dists_from(tp, 37.2, -122.0, [20.0, 15.0]).collect()[0]
    d20, d15 = out["at_20_0km"], out["at_15_0km"]
    assert d20 is not None and d15 is not None and d20["ts"] <= d15["ts"]


def test_scalar_interp_and_reposition(spark):
    df = spark.createDataFrame([(350.0, 10.0, 0.5, 37.0, -122.0, 360.0, 0.0)],
                               "h1 double, h2 double, r double, lat double, lon double, "
                               "gs double, hdg double")
    r = df.select(
        interpolate_heading(F.col("h1"), F.col("h2"), F.col("r")).alias("h"),
        *[c.alias(n) for c, n in zip(
            reposition_by_time(F.col("lat"), F.col("lon"), F.col("gs"), F.col("hdg"), F.lit(3600.0)),
            ["lat2", "lon2"])],
    ).collect()[0]
    assert r["h"] == pytest.approx(0.0)  # shortest way round 350->10
    # 360 kt due north for 1 h = 666.7 km ≈ +6 deg lat
    assert r["lat2"] == pytest.approx(37.0 + 666.72 / 111.32, rel=1e-3)
    assert r["lon2"] == pytest.approx(-122.0)


def test_enrichment_joins(spark):
    fl = spark.createDataFrame(
        [("f1", "A23A23", "", None), ("f2", "ABC999", "N111XX", "B738")],
        "flight_id string, icao_id string, registration string, equip_type string")
    af = spark.createDataFrame(
        [("A23A23", "N839AL", "C172", "UAL"), ("ABC999", "NXXXXX", "A320", "SWA")],
        "icao24 string, registration string, equip_type string, callsign_prefix string")
    out = {r["flight_id"]: r for r in overlay_airframe(fl, af).collect()}
    assert out["f1"]["registration"] == "N839AL" and out["f1"]["equip_type"] == "C172"
    # fill-only-blank: f2 keeps its own values (airframe.go:21-25)
    assert out["f2"]["registration"] == "N111XX" and out["f2"]["equip_type"] == "B738"

    snap = spark.createDataFrame([("A23A23", "UAL123")], "icao_id string, callsign string")
    m = {r["flight_id"]: r for r in merge_identity(fl, snap, ("callsign",)).collect()}
    assert m["f1"]["callsign"] == "UAL123"

    sched = spark.createDataFrame(
        [("A23A23", "LAX", "SFO", 123, T0), ("ABC999", "SJC", "SEA", 9, T0 - timedelta(hours=2))],
        "icao_id string, orig string, dest string, number long, fetched_at timestamp")
    s = {r["flight_id"]: r for r in enrich_schedule(fl, sched, T0 + timedelta(minutes=5)).collect()}
    assert s["f1"]["sched_dest"] == "SFO"
    assert s["f2"]["sched_dest"] is None  # stale (>20 min)


def test_sinks_roundtrip(spark, tmp_path, tp):
    write_report_csv(tp.select("flight_id", "ts", "alt_ft"), str(tmp_path / "csv"))
    back = spark.read.option("header", True).csv(str(tmp_path / "csv"))
    assert back.count() == 10

    fl = tp.limit(3)
    flights_to_json(fl, str(tmp_path / "json"))
    imported = import_flights_json(spark, str(tmp_path / "json"))
    assert imported.count() == 3 and "alt_ft" in imported.columns

    assert archive_verified(fl, str(tmp_path / "arch")) is True


def test_georestrictor_store(tmp_path):
    box = Restrictor(gr_type="squarebox", center_lat=37.5, center_lon=-122.0, side_km=10.0)
    tri = Restrictor(gr_type="polygon", poly=((37.0, -122.0), (37.1, -122.0), (37.0, -121.9)))
    georestrictors.save_set(str(tmp_path), "alice", "myset", [box, tri], logic="any")
    rs, logic = georestrictors.load_set(str(tmp_path), "alice", "myset")
    assert rs == [box, tri] and logic == "any"
    assert georestrictors.list_sets(str(tmp_path), "alice") == ["myset"]
    georestrictors.delete_set(str(tmp_path), "alice", "myset")
    assert georestrictors.list_sets(str(tmp_path), "alice") == []
    with pytest.raises(ValueError):
        georestrictors.save_set(
            str(tmp_path), "bob", "big",
            [Restrictor(gr_type="polygon", poly=tuple((37.0 + i / 100, -122.0) for i in range(11)))])


def test_foia_acl_filter(spark):
    from flightdb_spark.reports import Options, run_report

    fl = spark.createDataFrame(
        [("f1", "UAL1", "B738", "LAX", "SFO", T0, T0, ["AL"], {}, ["FOIA"]),
         ("f2", "UAL2", "B738", "LAX", "SFO", T0, T0, ["AL"], {}, ["ADSB"])],
        "flight_id string, callsign string, equip_type string, orig string, "
        "dest string, first_ts timestamp, last_ts timestamp, tags array<string>, "
        "waypoints map<string,timestamp>, track_sources array<string>")
    tp = spark.createDataFrame(
        [], "flight_id string, track string, ts timestamp, lat double, lon double, "
            "alt_ft double, groundspeed_kt double")
    res = run_report("list", spark, fl, tp, Options(blocked_sources=("FOIA",)))
    funnel = {r["outcome"]: r["n"] for r in res.funnel.collect()}
    assert funnel["[B] Eliminated: FOIA ACL blocked data source"] == 1
    assert funnel["[ACCEPTED] listed"] == 1


def test_sideview_series(spark, tp):
    from flightdb_spark.operators.derived import with_derived_columns
    from flightdb_spark.operators.sideview import sideview_series

    derived = with_derived_columns(tp)
    series = sideview_series(derived, smooth_points=3).collect()
    assert len(series) == 10
    xs = [r["x_km"] for r in series if r["x_km"] is not None]
    assert xs == sorted(xs)  # monotone along-path distance
    ref = sideview_series(derived, x="dist_to_ref", ref=(37.2, -122.0)).collect()
    assert ref[0]["x_km"] > ref[-1]["x_km"]  # approaching the ref point
