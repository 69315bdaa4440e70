"""approachsignature/trains reports; SWIM + connector normalizers."""

from __future__ import annotations

import json
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from flightdb_spark.operators.intersect import Restrictor
from flightdb_spark.reports import Options, run_report
from flightdb_spark.sources.connectors import (
    fetch_fr24_list,
    normalize_aex_list,
    normalize_fa_track,
    normalize_fr24_list,
)
from flightdb_spark.sources.swim import parse_swim_json

T0 = datetime(2024, 6, 1, 18, 0, 0)


def test_approachsignature(spark):
    # approach to SFO from the south: distance decreasing 60 -> 5 NM
    rows = []
    for i in range(12):
        dist_deg = (60 - 5 * i) / 60.0  # degrees of latitude south of SFO
        rows.append(("FA", "ADSB", T0 + timedelta(minutes=2 * i),
                     37.6189 - dist_deg, -122.3750, 10000.0 - 700 * i, 280.0))
    tp = spark.createDataFrame(
        rows, "flight_id string, track string, ts timestamp, lat double, lon double, "
              "alt_ft double, groundspeed_kt double")
    wps = {"EPICK": T0, "EDDYY": T0 + timedelta(minutes=5), "SWELS": T0 + timedelta(minutes=9)}
    fl = spark.createDataFrame(
        [("FA", "UAL123", "B738", "LAX", "SFO", T0, T0 + timedelta(minutes=24), ["AL"], wps),
         ("FB", "UAL9", "A320", "LAX", "SFO", T0, T0 + timedelta(minutes=24), ["AL"], wps)],
        "flight_id string, callsign string, equip_type string, orig string, "
        "dest string, first_ts timestamp, last_ts timestamp, tags array<string>, "
        "waypoints map<string,timestamp>")
    res = run_report("approachsignature", spark, fl, tp, Options())
    rows_out = {r["flight_id"]: r for r in res.rows.collect()}
    assert set(rows_out) == {"FA"}  # FB rejected: equip prefix
    r = rows_out["FA"]
    # first point inside 41.1 NM: dist starts at 60, decreases 5/step ->
    # first < 41.1 is 40 NM at i=4
    assert r["ts_at_41_1nm"] == T0 + timedelta(minutes=8)
    assert r["alt_at_41_1nm"] == 10000.0 - 700 * 4
    funnel = {x["outcome"]: x["n"] for x in res.funnel.collect()}
    assert funnel["[D] equip didn't have prefix B73"] == 1


def test_trains(spark):
    gate = Restrictor(gr_type="squarebox", center_lat=37.5, center_lon=-122.0, side_km=10.0)
    rows, fl_rows = [], []
    # 5 flights cross the gate: 3 bunched 2 min apart, then a 20-min
    # pause, then 2 bunched
    offsets = [0, 2, 4, 24, 26]
    for i, off in enumerate(offsets):
        fid = f"F{i}"
        for j, lat in enumerate([37.3, 37.5, 37.7]):
            rows.append((fid, "ADSB", T0 + timedelta(minutes=off, seconds=30 * j),
                         lat, -122.0, 5000.0, 250.0))
        fl_rows.append((fid, f"UAL{i}", "B738", "LAX", "SFO", T0 + timedelta(minutes=off),
                        T0 + timedelta(minutes=off + 2), ["AL"], {}))
    tp = spark.createDataFrame(
        rows, "flight_id string, track string, ts timestamp, lat double, lon double, "
              "alt_ft double, groundspeed_kt double")
    fl = spark.createDataFrame(
        fl_rows,
        "flight_id string, callsign string, equip_type string, orig string, "
        "dest string, first_ts timestamp, last_ts timestamp, tags array<string>, "
        "waypoints map<string,timestamp>")
    res = run_report("trains", spark, fl, tp,
                     Options(restrictors=(gate,), extra={"train_gap_s": 300}))
    rows_out = {r["flight_id"]: r for r in res.rows.collect()}
    assert rows_out["F0"]["train_len"] == 3 and rows_out["F1"]["train_len"] == 3
    assert rows_out["F3"]["train_len"] == 2 and rows_out["F4"]["train_len"] == 2
    funnel = {x["outcome"]: x["n"] for x in res.funnel.collect()}
    assert funnel["[ACCEPTED] [E] trains of length=03"] == 3
    assert funnel["[ACCEPTED] [E] trains of length=02"] == 2


SWIM_FLIGHT = {
    "timestamp": "2024-06-01T18:00:00Z",
    "flightIdentification": {"aircraftIdentification": "UAL123", "computerId": 4321.0},
    "enRoute": {
        "position": {
            "position": {"location": {"pos": "37.5 -122.0"}},
            "altitude": {"content": 10000.0},
            "actualSpeed": {"surveillance": {"content": 280.0}},
            # velocity due north: x=0, y=100 -> compass heading 0
            "trackVelocity": {"x": {"content": 0.0}, "y": {"content": 100.0}},
        }
    },
}


def test_parse_swim_multi_and_single(spark):
    multi = json.dumps({"ns5:MessageCollection": {"message": [{"flight": SWIM_FLIGHT}]}})
    single = json.dumps({"ns5:MessageCollection": {"message": {"flight": SWIM_FLIGHT}}})
    raw = spark.createDataFrame([(multi,), (single,)], "value string")
    out = parse_swim_json(raw).collect()
    assert len(out) == 2
    for r in out:
        assert r["icao_id"] == "SWM4321"
        assert r["callsign"] == "UAL123"
        assert r["lat"] == 37.5 and r["lon"] == -122.0
        assert r["alt_ft"] == 10000.0
        assert r["heading_deg"] == pytest.approx(0.0)
        assert r["ts"] == datetime(2024, 6, 1, 18, 0)


def test_fr24_and_fa_and_aex_normalizers(spark):
    fr24 = spark.createDataFrame(
        [("abc123", ["A23A23", "37.5", "-122.0", "270", "10000", "250", "1200",
                     "T-XYZ", "B738", "N123UA", "1717264800", "LAX", "SFO",
                     "UA123", "", "-640", "UAL123", ""])],
        "fr24_id string, fields array<string>",
    )
    r = normalize_fr24_list(fr24).collect()[0]
    assert r["icao_id"] == "A23A23" and r["lat"] == 37.5 and r["callsign"] == "UAL123"
    assert r["ts"] == datetime(2024, 6, 1, 18, 0) and r["vertical_rate_fpm"] == -640.0

    fa = spark.createDataFrame(
        [(1717264800, 37.5, -122.0, 100, 250, "", "TA")],
        "timestamp long, latitude double, longitude double, altitude long, "
        "groundspeed long, altitudeStatus string, updateType string",
    )
    fr = normalize_fa_track(fa).collect()[0]
    assert fr["alt_ft"] == 10000.0 and fr["track"] == "FA:TA"

    aex = spark.createDataFrame(
        [("A23A23", "UAL1", "N1", 1717264800000, 37.5, -122.0, 9000.0, 250.0, 270.0, "1200")],
        "Icao string, Call string, Reg string, PosTime long, Lat double, "
        "Long double, GAlt double, Spd double, Trak double, Sqk string",
    )
    ar = normalize_aex_list(aex).collect()[0]
    assert ar["icao_id"] == "A23A23" and ar["ts"] == datetime(2024, 6, 1, 18, 0)


def test_fetchers_are_stubs(spark):
    with pytest.raises(NotImplementedError):
        fetch_fr24_list(spark, (36.0, 38.0, -123.0, -121.0))


def test_fr24_track_normalizer(spark):
    from flightdb_spark.sources.connectors import normalize_fr24_track

    raw = spark.createDataFrame(
        [("abc123", 1717264800, 37.5, -122.0, 10000, 250, 270)],
        "fr24_id string, ts long, lat double, lon double, alt long, speed long, heading long",
    )
    r = normalize_fr24_track(raw).collect()[0]
    assert r["track"] == "fr24" and r["alt_ft"] == 10000.0
    assert r["ts"] == datetime(2024, 6, 1, 18, 0)


def test_normalize_fr24_details_golden(spark):
    """Reference golden (fr24/fr24_test.go:122-136): BA287 liveDetails
    arr_schd 1442015700 -> '2015-09-11 23:55:00 UTC'."""
    from flightdb_spark.sources.connectors import normalize_fr24_details

    raw = spark.createDataFrame(
        [("BA287", "landed", 1441976400, 1442015700, 1442015551,
          "1.00", "-7.00", "LHR", "SFO")],
        "flight string, status string, dep_schd long, arr_schd long, "
        "eta long, from_tz_offset string, to_tz_offset string, "
        "from_iata string, to_iata string",
    )
    row = normalize_fr24_details(raw).collect()[0]
    assert str(row["scheduled_arrival_utc"]) == "2015-09-11 23:55:00"
    assert str(row["scheduled_departure_utc"]) == "2015-09-11 13:00:00"
    assert row["flight_number"] == "BA287" and row["status"] == "landed"
    assert row["orig"] == "LHR" and row["dest"] == "SFO"
    assert row["origin_tz_offset"] == "1.00"


def test_resolve_fr24_ids_decision_branches(spark):
    """GetFr24Id parity (fr24/fr24.go:425-467): no-registration short-
    circuit, live ('query') match with callsign canonicalization,
    live mismatch falling through to the first matching history record,
    and not-found."""
    from flightdb_spark.sources.connectors import resolve_fr24_ids

    flights = spark.createDataFrame(
        [
            ("f1", "N100AB", "SWA0123"),   # live has SWA123X -> canonical equal
            ("f2", "N200CD", "UAL55"),     # live mismatch; history rank 1 matches
            ("f3", None, "AAL1"),          # no registration
            ("f4", "N400GH", "DAL9"),      # candidates exist, no callsign match
            ("f5", "N500JK", "4517"),      # bare number + prefix -> SWA4517 in live
        ],
        "flight_id string, registration string, callsign string",
    ).withColumn(
        "cs_prefix",
        F.when(F.col("flight_id") == "f5", F.lit("SWA")),
    )
    live = spark.createDataFrame(
        [
            ("N100AB", "SWA123X", "id-live-1"),
            ("N200CD", "UAL77", "id-live-2"),   # wrong callsign -> skip
            ("N400GH", "KLM9", "id-live-4"),
            ("N500JK", "SWA4517", "id-live-5"),
        ],
        "registration string, callsign string, fr24_id string",
    )
    history = spark.createDataFrame(
        [
            ("N200CD", "UAL055", "id-hist-old", 1),
            ("N200CD", "UAL55", "id-hist-older", 2),  # also equal, higher rank
            ("N400GH", "BAW9", "id-hist-4", 0),
        ],
        "registration string, callsign string, fr24_id string, rank int",
    )
    out = {
        r["flight_id"]: (r["fr24_id"], r["fr24_reason"])
        for r in resolve_fr24_ids(
            flights, live, history, airframe_prefix_col="cs_prefix"
        ).collect()
    }
    assert out["f1"] == ("id-live-1", "query")
    assert out["f2"] == ("id-hist-old", "history")  # lowest rank wins
    assert out["f3"] == (None, "no_registration")
    assert out["f4"] == (None, "not_found")
    assert out["f5"] == ("id-live-5", "query")
