"""The minimum end-to-end slice (SURVEY §7 step 4): FOIA CSV → flights +
trackpoints with matched waypoints → `.list` report with tag/waypoint
predicates → rows + funnel + CSV sink. Plus the realtime-airspace
composite view."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from flightdb_spark import api
from flightdb_spark.reports import Options, run_report
from flightdb_spark.sinks import write_report_csv
from flightdb_spark.sources.foia import ingest_foia

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_foia_to_list_report_end_to_end(spark, tmp_path):
    # waypoint dim placed on the AAA1234 fixture track (~37.63, -122.368)
    wps = spark.createDataFrame(
        [("WPTEST", 37.632, -122.368), ("WPFAR", 45.0, -100.0)],
        "name string, lat double, lon double",
    )
    flights, points = ingest_foia(
        spark, os.path.join(FIXTURES, "foia.csv"), waypoints=wps
    )
    # ingest matched the waypoint into the flights map
    wp_flights = flights.filter(
        F.array_contains(F.map_keys("waypoints"), "WPTEST")
    ).collect()
    assert len(wp_flights) >= 1

    # query surface: tag + waypoint predicate composition (fquery.go canned)
    recent = api.query_for_recent(flights, ["FOIA"], 10, waypoints=["WPTEST"])
    assert recent.count() == len(wp_flights)

    # the .list report over the ingested lake, not-tag excluded
    res = run_report("list", spark, flights, points, Options(not_tags=("GA",)))
    rows = res.rows.collect()
    assert all("GA" not in r["tag_list"].split() for r in rows)
    funnel = {r["outcome"]: r["n"] for r in res.funnel.collect()}
    assert funnel.get("[B] Eliminated: had not-tag 'GA'", 0) >= 1

    # CSV sink round-trips the report rows
    out = str(tmp_path / "report_csv")
    write_report_csv(res.rows, out)
    assert spark.read.option("header", True).csv(out).count() == len(rows)


def test_realtime_airspace_composite(spark):
    now = datetime(2024, 6, 1, 18, 0, 30)
    cols = ("icao_id string, callsign string, ts timestamp, lat double, "
            "lon double, alt_ft double, groundspeed_kt double")
    adsb = spark.createDataFrame(
        [("A23A23", "UAL1", now - timedelta(seconds=5), 37.5, -122.0, 9000.0, 250.0),
         ("A23A23", "UAL1", now - timedelta(seconds=15), 37.4, -122.0, 9000.0, 250.0),
         ("STALE1", "OLD1", now - timedelta(seconds=90), 36.0, -120.0, 5000.0, 200.0)],
        cols)
    fr24 = spark.createDataFrame(
        [("ABC999", "SWA2", now - timedelta(seconds=10), 37.7, -122.2, 11000.0, 300.0)],
        cols)
    view = api.realtime_airspace({"ADSB": adsb, "fr24": fr24}, now)
    rows = {r["key"]: r for r in view.collect()}
    # latest position wins; stale aircraft dropped; keys namespaced
    assert set(rows) == {"ADSB:A23A23", "fr24:ABC999"}
    assert rows["ADSB:A23A23"]["lat"] == 37.5

    loc = api.localize_to(view, 37.6189, -122.3750).collect()
    for r in loc:
        assert r["dist_km"] >= 0 and 0 <= r["bearing_deg"] < 360
        assert r["dist3_km"] >= r["dist_km"]
