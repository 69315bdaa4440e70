"""Flight-domain core: callsign/idspec codecs, FOIA ingest, derived
columns, geo-restrictor intersection goldens.

The geometry cases mirror the *scenarios* of the reference's
intersectabletrack tests (synthetic tracks vs boxes/planes/altitude
bands, asserting entry/exit indices — intersectabletrack_test.go:35-363)
re-expressed against our own fixtures and index convention.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import numpy as np
import pytest
from pyspark.sql import functions as F

from flightdb_spark.functions.callsign import callsign_type, normalized_callsign
from flightdb_spark.functions.idspec import IdSpec, classify_id, parse_idspec
from flightdb_spark.operators.derived import with_derived_columns, sanity_filter
from flightdb_spark.operators.intersect import (
    Restrictor,
    crawl_track,
    intersect_tracks,
    satisfies_set,
)
from flightdb_spark.sources.foia import ingest_foia

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


# --- callsign golden table (FIXTURES.md §8, callsign_test.go) -----------------
@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("SWA3848", "IcaoFlightNumber"),
        ("N839AL", "Registration"),
        ("4517", "BareFlightNumber"),
        ("00000000", "JunkCallsign"),
        ("????????", "JunkCallsign"),
        ("", "JunkCallsign"),
        ("AAL353X", "IcaoFlightNumber"),  # ATC suffix
    ],
)
def test_callsign_classification(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], ["cs"])
    got = df.select(callsign_type(F.col("cs")).alias("t")).first()["t"]
    assert got == expected


def test_callsign_normalization(spark):
    df = spark.createDataFrame(
        [("SWA0123", "XXX"), ("4517", "SWA"), ("N839AL", "SWA")],
        ["cs", "prefix"],
    )
    got = [
        r["n"]
        for r in df.select(
            normalized_callsign(F.col("cs"), F.col("prefix")).alias("n")
        ).collect()
    ]
    assert got == ["SWA123", "SWA4517", "N839AL"]


# --- idspec codec goldens (FIXTURES.md §9, idspec.go) --------------------------
def test_idspec_parse_epoch():
    s = parse_idspec("A23A23@1412312312")
    assert s.kind == "icao" and s.end is None
    assert int(s.start.timestamp()) == 1412312312
    assert s.to_string() == "A23A23@1412312312"


def test_idspec_parse_range_and_rfc3339():
    r = parse_idspec("UAL123@1412312312:1412315999")
    assert r.kind == "callsign" and r.end is not None
    t = parse_idspec("N1234S@2006-01-02T15:04:05Z")
    assert t.kind == "registration"
    assert t.start == datetime(2006, 1, 2, 15, 4, 5, tzinfo=timezone.utc)


def test_idspec_hex_ambiguity():
    # 6-hex-digit string is always an icao id (idspec.go:79-87)
    assert classify_id("A23A23") == "icao"
    assert classify_id("ABC123") == "icao"  # even though it looks like a callsign
    assert classify_id("N123AB") == "registration"


# --- FOIA ingest ----------------------------------------------------------------
def test_foia_ingest(spark, tmp_path):
    flights, points = ingest_foia(spark, os.path.join(FIXTURES, "foia.csv"))
    fl = {r["flight_id"]: r for r in flights.collect()}
    # same AIRCRAFT_ID, different FLIGHT_INDEX → two distinct flights
    assert len(fl) == 3
    f1 = fl["AAA1234_20170401260"]
    assert f1["orig"] == "SFO" and f1["dest"] == "LAX"
    assert f1["callsign_prefix"] == "AAA" and f1["number"] == 1234
    assert "FOIA" in f1["tags"] and "AL" in f1["tags"]
    assert "SFO:" in f1["tags"] and ":LAX" in f1["tags"] and ":NORCAL:" in f1["tags"]
    # directional group tags (SetAirportComboTagsFor, flightpath.go:76-79):
    # SFO origin -> NORCAL:, LAX dest -> :SW (LAX is a SouthwestAirport)
    assert "NORCAL:" in f1["tags"] and ":SW" in f1["tags"] and ":SW:" in f1["tags"]
    assert ":NORCAL" not in f1["tags"] and "SW:" not in f1["tags"]
    f3 = fl["N839AL_20170401500"]
    assert f3["registration"] == "N839AL" and "GA" in f3["tags"]
    # trackpoints: altitude ×100, UTC timestamps, midnight straddle intact
    pts = points.filter(F.col("flight_id") == "N839AL_20170401500").orderBy("ts").collect()
    assert [p["alt_ft"] for p in pts] == [500.0, 700.0]
    assert pts[0]["ts"].day == 1 and pts[1]["ts"].day == 2
    # write path: date-partitioned parquet round-trips
    out = str(tmp_path / "lake")
    ingest_foia(spark, os.path.join(FIXTURES, "foia.csv"), out_dir=out)
    assert spark.read.parquet(f"{out}/flights").count() == 3
    assert spark.read.parquet(f"{out}/trackpoints").count() == 7


# --- derived columns --------------------------------------------------------------
def _mk_tp(spark, rows):
    return spark.createDataFrame(
        rows, "flight_id string, track string, ts timestamp, lat double, lon double, "
        "alt_ft double, groundspeed_kt double"
    )


def test_derived_columns_constant_speed(spark):
    # ~0.01° lat per 10 s ≈ 1.1132 km per step, constant climb 600 ft/min
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("f1", "FOIA", t0.replace(second=s), 37.0 + 0.001 * s, -122.0, 1000.0 + s * 10, None)
        for s in range(0, 50, 10)
    ]
    out = with_derived_columns(_mk_tp(spark, rows)).orderBy("ts").collect()
    assert out[0]["step_km"] is None
    step = out[1]["step_km"]
    assert step == pytest.approx(0.01 * 111.19, rel=0.01)  # 0.01° lat ≈ 1.112 km
    # derived groundspeed for FOIA: km / h / 1.852 → knots
    assert out[1]["groundspeed_kt"] == pytest.approx(step / (10 / 3600) / 1.852, rel=1e-9)
    assert out[1]["vertical_speed_fpm"] == pytest.approx(100 / (10 / 60), rel=1e-9)  # 600 fpm
    assert out[-1]["dist_travelled_km"] == pytest.approx(4 * step, rel=1e-6)
    # angle of inclination: atan2(100 ft in km, step)
    assert out[1]["angle_of_inclination"] == pytest.approx(
        np.degrees(np.arctan2(100 * 0.0003048, step)), rel=1e-9
    )


def test_sanity_filter_drops_teleport(spark):
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("f1", "ADSB", t0.replace(second=0), 37.00, -122.0, 1000.0, 250.0),
        ("f1", "ADSB", t0.replace(second=10), 37.01, -122.0, 1000.0, 250.0),
        ("f1", "ADSB", t0.replace(second=20), 40.00, -122.0, 1000.0, 250.0),  # ~332km in 10s
        ("f1", "ADSB", t0.replace(second=30), 37.02, -122.0, 1000.0, 250.0),
    ]
    out = sanity_filter(_mk_tp(spark, rows))
    lats = [r["lat"] for r in out.orderBy("ts").collect()]
    assert 40.00 not in lats and len(lats) == 3


# --- restrictor crawl goldens -------------------------------------------------------
BOX = Restrictor(gr_type="squarebox", center_lat=37.5, center_lon=-122.0, side_km=20.0)


def _track(*pts):
    lats = np.array([p[0] for p in pts])
    lons = np.array([p[1] for p in pts])
    alts = np.array([p[2] if len(p) > 2 else 5000.0 for p in pts])
    return lats, lons, alts


def test_crawl_enter_and_exit():
    # 20 km box ⇒ half-extent ≈ 0.0898° lat; track crosses north-south
    tr = _track((37.3, -122.0), (37.45, -122.0), (37.5, -122.0), (37.55, -122.0), (37.7, -122.0))
    i, j, hit = crawl_track(*tr, BOX)
    assert hit and (i, j) == (1, 4)  # 37.45 inside (|Δ|=0.05 < 0.0898); 37.7 first outside


def test_crawl_started_inside():
    tr = _track((37.5, -122.0), (37.52, -122.0), (37.8, -122.0))
    i, j, hit = crawl_track(*tr, BOX)
    assert hit and i == 0 and j == 2


def test_crawl_fell_off_end_inside():
    tr = _track((37.2, -122.0), (37.49, -122.0), (37.5, -122.0))
    i, j, hit = crawl_track(*tr, BOX)
    assert hit and i == 1 and j == 2  # never leaves → exit = last index


def test_crawl_single_point():
    inside = _track((37.5, -122.0))
    outside = _track((36.0, -122.0))
    assert crawl_track(*inside, BOX) == (0, 0, True)
    assert crawl_track(*outside, BOX) == (-1, -1, False)


def test_crawl_flythrough_segment():
    # both endpoints outside, segment passes straight through the box
    tr = _track((37.2, -122.0), (37.8, -122.0))
    i, j, hit = crawl_track(*tr, BOX)
    assert hit and i == 0 and j == 1


def test_crawl_miss():
    tr = _track((36.0, -120.0), (36.1, -120.1))
    assert crawl_track(*tr, BOX) == (-1, -1, False)


def test_crawl_altitude_band():
    banded = Restrictor(
        gr_type="squarebox", center_lat=37.5, center_lon=-122.0, side_km=20.0,
        alt_min=3000, alt_max=8000,
    )
    tr_in = _track((37.3, -122.0), (37.5, -122.0, 5000.0), (37.7, -122.0))
    tr_below = _track((37.3, -122.0, 1000.0), (37.5, -122.0, 1000.0), (37.7, -122.0, 1000.0))
    assert crawl_track(*tr_in, banded)[2] is True
    assert crawl_track(*tr_below, banded)[2] is False


def test_crawl_vertical_plane():
    gate = Restrictor(
        gr_type="verticalplane",
        start_lat=37.5, start_lon=-122.2, end_lat=37.5, end_lon=-121.8,
    )
    crossing = _track((37.4, -122.0), (37.6, -122.0))  # crosses the gate line
    parallel = _track((37.4, -122.0), (37.4, -121.5))
    i, j, hit = crawl_track(*crossing, gate)
    assert hit and (i, j) == (0, 1)
    assert crawl_track(*parallel, gate)[2] is False


def test_crawl_polygon():
    tri = Restrictor(
        gr_type="polygon",
        poly=((37.4, -122.1), (37.6, -122.1), (37.5, -121.9)),
    )
    inside = _track((37.3, -122.0), (37.5, -122.05), (37.5, -121.5))
    assert crawl_track(*inside, tri)[2] is True
    assert crawl_track(*_track((36.0, -120.0), (36.1, -120.0)), tri)[2] is False


def test_intersect_tracks_and_set_logic(spark):
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # f_cross crosses the box; f_miss stays away
    for s, lat in enumerate([37.3, 37.5, 37.7]):
        rows.append(("f_cross", t0.replace(minute=s), lat, -122.0, 5000.0))
    for s, lat in enumerate([36.0, 36.1, 36.2]):
        rows.append(("f_miss", t0.replace(minute=s), lat, -120.0, 5000.0))
    tp = spark.createDataFrame(
        rows, "flight_id string, ts timestamp, lat double, lon double, alt_ft double"
    )
    excluder = Restrictor(
        gr_type="squarebox", center_lat=36.1, center_lon=-120.0, side_km=50.0,
        is_excluding=True,
    )
    outcomes = intersect_tracks(tp, [BOX, excluder], prefilter=False)
    got = {(r["flight_id"], r["restrictor_idx"]): r for r in outcomes.collect()}
    assert got[("f_cross", 0)]["satisfied"] is True
    assert got[("f_cross", 0)]["i_entry"] == 1
    assert got[("f_cross", 1)]["satisfied"] is True  # excluder: not hit → satisfied
    assert got[("f_miss", 0)]["satisfied"] is False
    assert got[("f_miss", 1)]["satisfied"] is False  # hit the excluder → unsatisfied

    verdict = {r["flight_id"]: r for r in satisfies_set(outcomes, "all").collect()}
    assert verdict["f_cross"]["satisfies_set"] is True
    assert verdict["f_miss"]["satisfies_set"] is False
    assert verdict["f_miss"]["blame_idx"] == 0  # first failing restrictor

    # bbox prefilter drops f_miss before Python for the non-excluding box
    pruned = intersect_tracks(tp, [BOX], prefilter=True)
    assert {r["flight_id"] for r in pruned.collect()} == {"f_cross"}


# --- METAR as-of join + indicated altitude -----------------------------------
def test_metar_asof_and_indicated_altitude(spark):
    from flightdb_spark.operators.metar import asof_join_metar, with_indicated_altitude

    # reports at :56 past the hour (metar.go:94: "generally at 56m past")
    metars = spark.createDataFrame(
        [
            ("KSFO", datetime(2024, 1, 1, 11, 56), 30.12, "raw11"),
            ("KSFO", datetime(2024, 1, 1, 12, 56), 29.80, "raw12"),
            ("KOAK", datetime(2024, 1, 1, 12, 56), 28.00, "rawX"),
        ],
        "station string, report_time timestamp, altimeter_inhg double, raw string",
    )
    tp = spark.createDataFrame(
        [
            ("f1", datetime(2024, 1, 1, 12, 30), 5000.0),  # before 12:56 -> rewind to 11:56
            ("f1", datetime(2024, 1, 1, 12, 58), 5000.0),  # after 12:56 -> use 12:56
            ("f1", datetime(2024, 1, 1, 14, 0), 5000.0),   # no report for 14h or 13h -> null
        ],
        "flight_id string, ts timestamp, alt_ft double",
    )
    out = with_indicated_altitude(asof_join_metar(tp, metars, station="KSFO"))
    rows = {r["ts"].hour * 100 + r["ts"].minute: r for r in out.collect()}
    assert rows[1230]["altimeter_inhg"] == 30.12      # rewound one hour
    assert rows[1258]["altimeter_inhg"] == 29.80      # current hour, already published
    assert rows[1400]["altimeter_inhg"] is None       # nothing to rewind to
    # indicated = alt + 1000*(inHg - 29.9213); missing METAR keeps pressure alt
    assert rows[1230]["indicated_alt_ft"] == pytest.approx(5000 + 1000 * (30.12 - 29.9213))
    assert rows[1258]["indicated_alt_ft"] == pytest.approx(5000 + 1000 * (29.80 - 29.9213))
    assert rows[1400]["indicated_alt_ft"] == 5000.0


# --- multimodal columns -------------------------------------------------------
def test_multimodal_metadata_and_features(spark):
    import hashlib

    from flightdb_spark.multimodal import (
        decode_media,
        media_metadata,
        sample_frames,
        synth_media,
    )

    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "abc"), (2, "a" * 100)], "doc_id long, text string"
    )
    media = synth_media(docs)
    meta = {r["media_id"]: r for r in media_metadata(media).collect()}
    assert meta[0]["kind"] == "image" and meta[1]["kind"] == "audio" and meta[2]["kind"] == "video"
    assert meta[0]["byte_len"] == 11
    assert meta[0]["sha256"] == hashlib.sha256(b"hello world").hexdigest()
    assert meta[0]["mime"] == "image/png"

    feats = {r["media_id"]: r for r in decode_media(media, out_dim=16).collect()}
    assert len(feats[0]["feature"]) == 16
    assert sum(feats[0]["feature"]) == pytest.approx(1.0)
    # determinism: same input -> same feature
    feats2 = {r["media_id"]: r for r in decode_media(media, out_dim=16).collect()}
    assert feats[2]["feature"] == feats2[2]["feature"]

    frames = sample_frames(media, k=4).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == {2}  # only the video row
    assert 1 <= len(by_media[2]) <= 4
    assert all(len(bytes(r["frame_bytes"])) > 0 for r in by_media[2])


def test_decode_media_real_wav_path(spark):
    # Real-codec-first decode: a genuine RIFF/WAV payload decodes via
    # stdlib `wave` (decode_path="wave", feature histogram over the PCM
    # samples, not the container bytes); a non-WAV audio payload and
    # image/video payloads (PIL/av absent here) fall back to the
    # deterministic fake per row.
    import io
    import wave as wave_mod

    from flightdb_spark.multimodal import decode_media

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(bytes([7] * 32))  # 32 samples, all value 7
    wav_blob = buf.getvalue()

    media = spark.createDataFrame(
        [
            (0, "audio", bytearray(wav_blob)),
            (1, "audio", bytearray(b"not a wav")),
            (2, "image", bytearray(b"not a png")),
        ],
        "media_id long, kind string, blob binary",
    )
    rows = {r["media_id"]: r for r in decode_media(media, out_dim=16).collect()}
    assert rows[0]["decode_path"] == "wave"
    # all 32 PCM samples are 7 -> the whole histogram mass in bin 7%16
    assert rows[0]["feature"][7] == pytest.approx(1.0)
    assert rows[1]["decode_path"] == "fake"
    assert rows[2]["decode_path"] == "fake"


def test_resize_stub_raises(spark):
    from flightdb_spark.multimodal import resize_image_stub, synth_media

    docs = spark.createDataFrame([(0, "hello")], "doc_id long, text string")
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        resize_image_stub(synth_media(docs), 8, 8).collect()


# --- altitude-band + vertical-plane crawl scenarios -----------------------------
# Scenario families from intersectabletrack_test.go:179-363, re-expressed
# against our raw-point crawl convention (module docstring of
# operators/intersect.py): no line-sampling structure, no interpolation;
# altitude tests are segment-span overlaps, so expected indices are pinned
# to OUR convention where the reference's own comments acknowledge
# interpolation-dependent inconsistency.
BIGBOX = Restrictor(gr_type="squarebox", center_lat=0.0, center_lon=0.0,
                    side_km=2000.0)  # half-extent ≈ 8.98° lat


def _alt_track(*triples):
    lats = np.array([t[0] for t in triples])
    lons = np.array([t[1] for t in triples])
    alts = np.array([t[2] for t in triples])
    return lats, lons, alts


def test_crawl_altitude_above_band_misses():
    # through the box but entirely above the 0-99 band
    r = Restrictor(**{**BIGBOX.__dict__, "alt_min": 1, "alt_max": 99})
    tr = _alt_track((-20, 0, 100), (-10, 0, 100), (-5, 0, 100), (5, 0, 100),
                    (10, 0, 100), (20, 0, 100))
    assert crawl_track(*tr, r) == (-1, -1, False)


def test_crawl_altitude_subset_of_contained_points():
    # only the alt-14 points are in the 10-20 band: entry at idx 3,
    # exit at the first out-of-band point (idx 6, our convention)
    r = Restrictor(**{**BIGBOX.__dict__, "alt_min": 10, "alt_max": 20})
    tr = _alt_track((-10, 0, 4), (-8, 0, 4), (-6, 0, 4), (-4, 0, 14), (-2, 0, 14),
                    (0, 0, 14), (2, 0, 24), (4, 0, 24), (6, 0, 24), (8, 0, 24), (10, 0, 24))
    assert crawl_track(*tr, r) == (3, 6, True)


def test_crawl_altitude_flythrough_close_end_low():
    # no point inside; the crossing segment's altitude span (5..15)
    # overlaps the 10-20 band -> fly-through hit at the segment start
    # (the reference agrees: I:1, J:2, intersectabletrack_test.go:222-227)
    r = Restrictor(**{**BIGBOX.__dict__, "alt_min": 10, "alt_max": 20})
    tr = _alt_track((-20, 0, 5), (-10, 0, 5), (10, 0, 15), (20, 0, 15))
    assert crawl_track(*tr, r) == (1, 2, True)


GATE = Restrictor(gr_type="verticalplane", start_lat=10.0, start_lon=-100.0,
                  end_lat=10.0, end_lon=100.0)


def test_gate_simple_crossing():
    tr = _alt_track((2, 0, 50), (8, 0, 50), (16, 0, 50), (20, 0, 50))
    assert crawl_track(*tr, GATE) == (1, 2, True)  # segment 8->16 crosses lat 10


def test_gate_coincident_track_is_not_a_crossing():
    # flying ALONG the plane is not an intersection
    # (intersectabletrack_test.go:290-293)
    tr = _alt_track((10, 20, 50), (10, 30, 50), (10, 40, 50), (10, 50, 50))
    assert crawl_track(*tr, GATE) == (-1, -1, False)


def test_gate_outside_lateral_extent_misses():
    # crosses lat 10 but at lon 150, beyond the gate's end at lon 100
    tr = _alt_track((2, 150, 50), (16, 150, 50))
    assert crawl_track(*tr, GATE) == (-1, -1, False)


def test_gate_altitude_undershoot():
    r = Restrictor(**{**GATE.__dict__, "alt_min": 1000, "alt_max": 0})
    tr = _alt_track((2, 0, 5), (8, 0, 5), (16, 0, 5), (20, 0, 5))
    assert crawl_track(*tr, r) == (-1, -1, False)


def test_gate_descent_in_band_at_crossing():
    # descending through the gate; crossing segment spans alts 12->11,
    # inside the 10-20 band -> hit (reference scenario
    # intersectabletrack_test.go:324-336, our segment-span semantics)
    r = Restrictor(**{**GATE.__dict__, "alt_min": 10, "alt_max": 20})
    tr = _alt_track((6, 0, 15), (8, 0, 12), (10, 0, 11), (12, 0, 10), (14, 0, 9))
    i, j, hit = crawl_track(*tr, r)
    assert hit and i == 1  # the 8->10 segment reaches the plane in-band


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("N1", "Registration"),       # 2-char N-number is valid (callsign.go:85)
        ("N0123", "JunkCallsign"),    # N-numbers cannot start with 0
        ("N1O", "JunkCallsign"),      # I/O excluded from N-numbers
        ("5", "JunkCallsign"),        # bare numbers need 2-4 digits (callsign.go:101)
        ("52", "BareFlightNumber"),
    ],
)
def test_callsign_reference_edge_cases(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], ["cs"])
    got = df.select(callsign_type(F.col("cs")).alias("t")).first()["t"]
    assert got == expected


def test_idspec_lowercase_normalized():
    s = parse_idspec("a23a23@1412312312")
    assert s.raw_id == "A23A23" and s.kind == "icao"
