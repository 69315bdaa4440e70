"""Report framework + canned reports (reference report/ + analysis/),
against synthetic flights/trackpoints fixtures."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from flightdb_spark.operators.intersect import Restrictor
from flightdb_spark.reports import Options, registered_reports, run_report
from flightdb_spark.reports.canned import select_preferred_track

T0 = datetime(2024, 6, 1, 18, 0, 0)  # 11:00 PDT

BOX = Restrictor(gr_type="squarebox", center_lat=37.5, center_lon=-122.0, side_km=20.0)


def _flights(spark):
    rows = [
        # FA crosses the box, level at 5000 ft, waypoints WPA->WPB, to SFO
        ("FA", "UAL123", "B738", "LAX", "SFO",
         T0, T0 + timedelta(minutes=40), ["AL"],
         {"WPA": T0 + timedelta(minutes=10), "WPB": T0 + timedelta(minutes=30)}),
        # FB stays far away, climbing
        ("FB", "N839AL", "C172", "SQL", "TRK",
         T0, T0 + timedelta(minutes=40), ["GA", "NOISY"], {}),
        # FC crosses the box but carries the not-tag
        ("FC", "SWA999", "B737", "OAK", "SAN",
         T0, T0 + timedelta(minutes=40), ["AL", "NOISY"], {}),
    ]
    return spark.createDataFrame(
        rows,
        "flight_id string, callsign string, equip_type string, orig string, "
        "dest string, first_ts timestamp, last_ts timestamp, tags array<string>, "
        "waypoints map<string,timestamp>",
    )


def _trackpoints(spark):
    rows = []
    # FA: 37.3 -> 37.7 along lon -122.0 in 40 min, alt 5000, gs 250
    for i in range(5):
        rows.append(
            ("FA", "ADSB", T0 + timedelta(minutes=10 * i), 37.3 + 0.1 * i, -122.0, 5000.0, 250.0)
        )
    # FB: far away at (36.0, -120), climbing hard
    for i in range(5):
        rows.append(
            ("FB", "ADSB", T0 + timedelta(minutes=10 * i), 36.0 + 0.01 * i, -120.0, 1000.0 + 2000 * i, 100.0)
        )
    # FC: crosses the box too
    for i in range(5):
        rows.append(
            ("FC", "ADSB", T0 + timedelta(minutes=10 * i), 37.3 + 0.1 * i, -122.0, 8000.0, 300.0)
        )
    return spark.createDataFrame(
        rows,
        "flight_id string, track string, ts timestamp, lat double, lon double, "
        "alt_ft double, groundspeed_kt double",
    )


def test_registry_has_canned_reports():
    names = registered_reports()
    for n in ("list", "altitudebands", "closestpoint", "flowndist",
              "straightlinedisplacement", "levelflight2", "sfoclassb"):
        assert n in names


def test_preferred_track_selection(spark):
    tp = spark.createDataFrame(
        [("f1", "MLAT", T0, 1.0, 1.0, 0.0, 0.0), ("f1", "ADSB", T0, 2.0, 2.0, 0.0, 0.0),
         ("f2", "fr24", T0, 3.0, 3.0, 0.0, 0.0)],
        "flight_id string, track string, ts timestamp, lat double, lon double, "
        "alt_ft double, groundspeed_kt double",
    )
    got = {(r["flight_id"], r["track"]) for r in
           select_preferred_track(tp, ("FOIA", "ADSB", "MLAT", "fr24")).collect()}
    assert got == {("f1", "ADSB"), ("f2", "fr24")}


def test_list_report_funnel_and_bands(spark):
    opt = Options(not_tags=("NOISY",), restrictors=(BOX,))
    res = run_report("list", spark, _flights(spark), _trackpoints(spark), opt)
    rows = {r["flight_id"]: r for r in res.rows.collect()}
    assert set(rows) == {"FA"}
    r = rows["FA"]
    assert r["alt_band"] == "altband: 04500-05499"
    assert r["speed_band"] == "speedband: 250-269"
    assert r["market"] == "LAX:SFO"
    funnel = {r["outcome"]: r["n"] for r in res.funnel.collect()}
    assert funnel["[ACCEPTED] listed"] == 1
    assert funnel["[B] Eliminated: had not-tag 'NOISY'"] == 2  # FB + FC
    # FB never got to the restrictor stage — not-tag wins first, as in
    # the reference's ordered PreProcess


def test_altitudebands(spark):
    res = run_report("altitudebands", spark, _flights(spark), _trackpoints(spark),
                     Options(restrictors=(BOX,)))
    rows = res.rows.collect()
    assert len(rows) == 2  # FA and FC both cross
    by_id = {r["flight_id"]: r for r in rows}
    assert by_id["FA"]["alt_band"] == "04500-05500"
    assert by_id["FC"]["alt_band"] == "07500-08500"
    # entry at idx 1 (37.4 inside the ~0.09° half-extent box? 37.45.. check: entry
    # convention from intersect tests: first inside point or segment start)
    assert by_id["FA"]["i_entry"] >= 0


def test_closestpoint_histogram(spark):
    opt = Options(refpoint=("PT", 36.0, -120.0), track_spec=("ADSB",))
    res = run_report("closestpoint", spark, _flights(spark), _trackpoints(spark), opt)
    rows = {r["flight_id"]: r for r in res.rows.collect()}
    assert rows["FB"]["i_closest"] == 0 and rows["FB"]["dist_km"] == 0.0
    h = res.histogram.collect()[0]
    assert h["n"] == 3 and h["p50"] > 0


def test_flowndist(spark):
    opt = Options(refpoint=("WPA", 0.0, 0.0), refpoint2=("WPB", 0.0, 0.0),
                  track_spec=("ADSB",))
    res = run_report("flowndist", spark, _flights(spark), _trackpoints(spark), opt)
    rows = {r["flight_id"]: r for r in res.rows.collect()}
    assert set(rows) == {"FA"}
    # WPA@t+10 = point idx1 (37.4), WPB@t+30 = idx3 (37.6): 0.2° lat ≈ 22.2 km
    assert rows["FA"]["flown_km"] == pytest.approx(0.2 * 111.19, rel=0.01)
    funnel = {r["outcome"]: r["n"] for r in res.funnel.collect()}
    assert funnel["[D] flights without WPA"] == 2


def test_straightlinedisplacement(spark):
    # line parallel to FA's track, displaced 0.05° lon ≈ 4.4 km at 37.5°
    opt = Options(
        refpoint=("WPA", 37.35, -122.05), refpoint2=("WPB", 37.65, -122.05),
    )
    res = run_report("straightlinedisplacement", spark, _flights(spark),
                     _trackpoints(spark), opt)
    rows = {r["flight_id"]: r for r in res.rows.collect()}
    assert set(rows) == {"FA"}
    expected_m = 0.05 * 111.32 * 0.7934 * 1000  # cos(37.5°) ≈ 0.7934
    assert rows["FA"]["mean_disp_m"] == pytest.approx(expected_m, rel=0.02)


def test_levelflight(spark):
    opt = Options(restrictors=(BOX,), altitude_tolerance=1.0, ref_distance_km=5.0)
    res = run_report("levelflight2", spark, _flights(spark), _trackpoints(spark), opt)
    rows = {r["flight_id"]: r for r in res.rows.collect()}
    # FA level at 5000 through the box; FC level at 8000 too
    assert "FA" in rows and rows["FA"]["longest_run_km"] >= 5.0
    assert rows["FA"]["start_alt"] == 5000.0


def test_sfoclassb_excursion(spark):
    # flight to SFO passing ~20 NM out at 2000 ft -> below the 4000 ft shelf
    t0 = T0
    rows = []
    for i, (dlat, alt) in enumerate([(0.55, 2000.0), (0.45, 2000.0), (0.30, 2500.0)]):
        # 0.55° lat ≈ 33 NM ... 0.30° ≈ 18 NM from SFO, all beyond kLimit 15.5
        rows.append(("FS", "ADSB", t0 + timedelta(minutes=5 * i),
                     37.6189 + dlat, -122.3750, alt, 250.0))
    tp = spark.createDataFrame(
        rows, "flight_id string, track string, ts timestamp, lat double, lon double, "
              "alt_ft double, groundspeed_kt double")
    fl = spark.createDataFrame(
        [("FS", "UAL1", "B738", "LAX", "SFO", t0, t0 + timedelta(minutes=15),
          ["AL"], {})],
        "flight_id string, callsign string, equip_type string, orig string, "
        "dest string, first_ts timestamp, last_ts timestamp, tags array<string>, "
        "waypoints map<string,timestamp>")
    res = run_report("sfoclassb", spark, fl, tp, Options())
    rows = res.rows.collect()
    assert len(rows) == 1
    r = rows[0]
    # deepest: at 18 NM ring floor 4000, alt 2500 -> below_by 1500;
    # at 27/33 NM floor 8000/none... 27NM ring floor 8000, alt 2000 -> 6000
    assert r["below_by_ft"] == 6000.0
    funnel = {x["outcome"]: x["n"] for x in res.funnel.collect()}
    assert "[ACCEPTED] [D] Class B excursion" in funnel


def test_sfoclassb_rejects_non_sfo(spark):
    res = run_report("sfoclassb", spark, _flights(spark), _trackpoints(spark), Options())
    funnel = {x["outcome"]: x["n"] for x in res.funnel.collect()}
    assert funnel.get("[D] dest != SFO") == 2  # FB, FC


def test_prefilter_pruned_flight_still_fails_restrictor(spark):
    """Regression: a flight the bbox prefilter prunes entirely (no
    intersection outcome rows) must be ELIMINATED by a non-excluding
    restrictor, not silently accepted; and must SATISFY an excluder."""
    opt = Options(restrictors=(BOX,))
    res = run_report("list", spark, _flights(spark), _trackpoints(spark), opt)
    funnel = {r["outcome"]: r["n"] for r in res.funnel.collect()}
    # FB never nears the box -> pruned -> eliminated with blame idx 0
    assert funnel.get("[B] Eliminated: did not satisfy restrictor 0") == 1
    ids = {r["flight_id"] for r in res.rows.collect()}
    assert "FB" not in ids and ids == {"FA", "FC"}

    from flightdb_spark.operators.intersect import Restrictor
    excl = Restrictor(gr_type="squarebox", center_lat=36.1, center_lon=-120.0,
                      side_km=50.0, is_excluding=True)
    res2 = run_report("list", spark, _flights(spark), _trackpoints(spark),
                      Options(restrictors=(excl,)))
    ids2 = {r["flight_id"] for r in res2.rows.collect()}
    assert ids2 == {"FA", "FC"}  # FB hit the excluder; FA/FC pruned -> satisfied


def test_time_of_day_window_wraps_midnight(spark):
    # T0 = 11:00 PDT; a 22->5 night window must exclude it, a 5->22
    # window must include it
    night = Options(tod_start_hour=22, tod_end_hour=5)
    day = Options(tod_start_hour=5, tod_end_hour=22)
    res_n = run_report("list", spark, _flights(spark), _trackpoints(spark), night)
    res_d = run_report("list", spark, _flights(spark), _trackpoints(spark), day)
    assert res_n.rows.count() == 0
    assert res_d.rows.count() == 3


def _tod_fixture(spark):
    """Two flights crossing BOX. X departs 21:50 PDT (outside a 22->5
    night window) but enters the box at 22:10 PDT; Y departs 22:30 PDT
    (inside the window) but, with 4-hour point spacing, enters at 06:30
    PDT the next morning (outside)."""
    tx = datetime(2024, 6, 2, 4, 50)  # 21:50 PDT Jun 1
    ty = datetime(2024, 6, 2, 5, 30)  # 22:30 PDT Jun 1
    flights = spark.createDataFrame(
        [
            ("X", "UALX", "B738", "LAX", "SFO", tx, tx + timedelta(minutes=40),
             ["AL"], {"WPA": tx + timedelta(minutes=20)}),
            ("Y", "UALY", "B738", "LAX", "SFO", ty, ty + timedelta(hours=16),
             ["AL"], {"WPA": ty + timedelta(hours=8)}),
        ],
        "flight_id string, callsign string, equip_type string, orig string, "
        "dest string, first_ts timestamp, last_ts timestamp, tags array<string>, "
        "waypoints map<string,timestamp>",
    )
    rows = []
    for i in range(5):  # enters BOX (lat>=37.41) at i=2
        rows.append(("X", "ADSB", tx + timedelta(minutes=10 * i),
                     37.3 + 0.1 * i, -122.0, 5000.0, 250.0))
        rows.append(("Y", "ADSB", ty + timedelta(hours=4 * i),
                     37.3 + 0.1 * i, -122.0, 5000.0, 250.0))
    tp = spark.createDataFrame(
        rows,
        "flight_id string, track string, ts timestamp, lat double, lon double, "
        "alt_ft double, groundspeed_kt double",
    )
    return flights, tp


def test_tod_anchors_on_intersection_times(spark):
    # report/report.go:155-165: with a restrictor, ToD tests the
    # intersection entry/exit hours, NOT the flight's first_ts.
    flights, tp = _tod_fixture(spark)
    night = Options(restrictors=(BOX,), tod_start_hour=22, tod_end_hour=5)
    res = run_report("list", spark, flights, tp, night)
    ids = {r["flight_id"] for r in res.rows.collect()}
    assert ids == {"X"}  # X crosses in-window despite pre-window start
    funnel = {r["outcome"]: r["n"] for r in res.funnel.collect()}
    assert funnel.get("[Bb] Failed TimeOfDay restrictions") == 1  # Y


def test_tod_anchors_on_waypoint_times(spark):
    # report/report.go:166-173: no restrictor -> requested waypoints'
    # crossing times anchor the window. X crosses WPA at 22:10 PDT,
    # Y at 06:30 PDT next day.
    flights, tp = _tod_fixture(spark)
    night = Options(waypoints=("WPA",), tod_start_hour=22, tod_end_hour=5)
    res = run_report("list", spark, flights, tp, night)
    ids = {r["flight_id"] for r in res.rows.collect()}
    assert ids == {"X"}


def test_positive_tag_and_waypoint_selection(spark):
    # Options.tags / Options.waypoints are applied as query filters
    # (fquery.go ByTags/ByWaypoints) — flights lacking them never
    # enter the funnel.
    res = run_report("list", spark, _flights(spark), _trackpoints(spark),
                     Options(tags=("GA",)))
    assert {r["flight_id"] for r in res.rows.collect()} == {"FB"}
    res2 = run_report("list", spark, _flights(spark), _trackpoints(spark),
                      Options(waypoints=("WPA",)))
    assert {r["flight_id"] for r in res2.rows.collect()} == {"FA"}
    assert res2.funnel.count() == 1  # only the accepted label remains


def test_closestpoint_altitude_band(spark):
    # ClosestTo's altitude band (track.go:849-863): only in-band points
    # compete for the argmin. FA flies level at 5000 ft; FB climbs
    # 1000->9000 ft. With a 500-3000 ft band, FA has no in-band point
    # (rejected); FB's closest must be one of its <3000 ft points even
    # though a later (higher) point passes nearer the ref.
    opt = Options(refpoint=("REF", 36.04, -120.0), alt_min=500.0, alt_max=3000.0,
                  track_spec=("ADSB",))
    res = run_report("closestpoint", spark, _flights(spark), _trackpoints(spark), opt)
    rows = {r["flight_id"]: r for r in res.rows.collect()}
    assert "FA" not in rows  # level at 5000 ft: out of band
    assert rows["FB"]["i_closest"] == 1  # i=1 is 3000ft REF-adjacent; i>=2 out of band
    # without the band, the nearest point wins regardless of altitude
    res2 = run_report("closestpoint", spark, _flights(spark), _trackpoints(spark),
                      Options(refpoint=("REF", 36.04, -120.0), track_spec=("ADSB",)))
    rows2 = {r["flight_id"]: r for r in res2.rows.collect()}
    assert rows2["FB"]["i_closest"] == 4  # 36.04 is closest to the last point
