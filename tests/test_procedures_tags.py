"""Procedure detection, SFO coarse-flightpath tags, breakup rematch."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from flightdb_spark.functions.procedures import with_flown_procedures
from flightdb_spark.operators.repair import find_breakup_candidates
from flightdb_spark.operators.sfotags import tag_coarse_flightpath

T0 = datetime(2024, 6, 1, 18, 0, 0)


def _fl(spark, rows):
    return spark.createDataFrame(
        rows,
        "flight_id string, icao_id string, orig string, dest string, "
        "first_ts timestamp, last_ts timestamp, tags array<string>, "
        "waypoints map<string,timestamp>",
    )


def test_flown_procedures(spark):
    wp_all = {w: T0 + timedelta(minutes=i) for i, w in
              enumerate(["WWAVS", "EPICK", "EDDYY", "SWELS", "MENLO"])}
    wp_vectored = {w: T0 + timedelta(minutes=i) for i, w in
                   enumerate(["WWAVS", "EPICK", "EDDYY"])}  # vectored after EDDYY
    wp_missing_req = {"EPICK": T0, "EDDYY": T0}  # WWAVS required, absent
    fl = _fl(spark, [
        ("F1", "A", "LAX", "SFO", T0, T0, [], wp_all),
        ("F2", "B", "LAX", "SFO", T0, T0, [], wp_vectored),
        ("F3", "C", "LAX", "SFO", T0, T0, [], wp_missing_req),
    ])
    out = {r["flight_id"]: r["flown_procedures"] for r in with_flown_procedures(fl).collect()}
    assert [(p["name"], p["vectored_after"]) for p in out["F1"]] == [("SERFR2", "")]
    assert [(p["name"], p["vectored_after"]) for p in out["F2"]] == [("SERFR2", "EDDYY")]
    assert out["F3"] == []


def test_sfo_coarse_tags(spark):
    fixes = {
        "WWAVS": (36.74, -121.89), "ALWYS": (37.48, -121.21),
        "LOZIT": (38.10, -122.51), "PIRAT": (37.26, -123.01),
        "FINSH": (37.78, -122.51), "BRIXX": (37.62, -122.37),
        "PPEGS": (37.39, -122.28),
    }
    # southern arrival: crosses the WWAVS 30-km box, dest SFO
    rows = [("FS", "ADSB", T0 + timedelta(minutes=i), 36.60 + 0.07 * i, -121.89, 8000.0, 250.0)
            for i in range(6)]
    # northern arrival crossing LOZIT box + BRIXX at 6000 ft
    rows += [("FN", "ADSB", T0 + timedelta(minutes=i), 38.20 - 0.115 * i, -122.51 + 0.028 * i, 6000.0, 250.0)
             for i in range(6)]
    tp = spark.createDataFrame(
        rows, "flight_id string, track string, ts timestamp, lat double, lon double, "
              "alt_ft double, groundspeed_kt double")
    fl = _fl(spark, [
        ("FS", "A", "LAX", "SFO", T0, T0 + timedelta(minutes=6), ["AL"], {}),
        ("FN", "B", "SEA", "SFO", T0, T0 + timedelta(minutes=6), ["AL"],
         {"BRIXX": T0 + timedelta(minutes=5)}),
    ])
    out = {r["flight_id"]: set(r["tags"]) for r in
           tag_coarse_flightpath(fl, tp, fixes).collect()}
    assert ":SFO_S" in out["FS"] and ":SFO_N" not in out["FS"]
    assert ":SFO_N" in out["FN"]
    assert ":SFO_NW" in out["FN"]  # BRIXX crossed above 5000 ft


def test_breakup_candidates(spark):
    fl = _fl(spark, [
        ("A_1", "A23A23", "LAX", "SFO", T0, T0 + timedelta(minutes=20), [], {}),
        ("A_2", "A23A23", "LAX", "SFO", T0 + timedelta(minutes=25), T0 + timedelta(minutes=50), [], {}),
        ("A_3", "A23A23", "LAX", "SFO", T0 + timedelta(hours=4), T0 + timedelta(hours=5), [], {}),
        ("B_1", "ABC999", "SJC", "SEA", T0, T0 + timedelta(minutes=30), [], {}),
    ])
    got = {(r["flight_a"], r["flight_b"]): r["gap_s"]
           for r in find_breakup_candidates(fl).collect()}
    assert got == {("A_1", "A_2"): 300}  # only the 5-min gap qualifies
