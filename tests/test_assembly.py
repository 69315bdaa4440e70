"""Fragment→flight assembly: the reference's gluing scenarios
(track_test.go:13-141 PlausibleExtension table) and the
misordered-fragments regression (addtrackfragment_test.go:21-125 — many
out-of-order fragments must assemble into exactly ONE flight)."""

from __future__ import annotations

import random
from datetime import datetime, timezone

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flightdb_spark.streaming.assembly import (
    EXTENSION_MAX_GAP_S,
    assemble_batch,
    assemble_stream,
    process_fragments,
)

E0 = datetime(2024, 1, 1, 12, 0, tzinfo=timezone.utc).timestamp()


def frag(t0, n=5, dt=10.0, lat0=37.0, dlat=0.001, source="ADSB", callsign="", icao="A23A23"):
    return {
        "icao": icao,
        "source": source,
        "callsign": callsign,
        "ts": [t0 + i * dt for i in range(n)],
        "lat": [lat0 + i * dlat for i in range(n)],
        "lon": [-122.0] * n,
        "alt": [5000.0] * n,
    }


# --- gluing scenario table (track_test.go) ------------------------------------
def test_contiguous_fragments_glue():
    fl = process_fragments([frag(E0), frag(E0 + 60)])
    assert len(fl) == 1 and len(fl[0].tracks["ADSB"].ts) == 10


def test_too_slow_gap_starts_new_flight():
    # the contribution path tolerates suffix gaps up to 3x (misordered
    # delivery; see assembly module docstring) — beyond that, new flight
    fl = process_fragments([frag(E0), frag(E0 + 3 * EXTENSION_MAX_GAP_S + 120)])
    assert len(fl) == 2


def test_suffix_gap_within_3x_glues():
    # 988 s gap straight from the misordered fixture (frag 14): the
    # infill arrives later, so the contribution path must accept
    fl = process_fragments([frag(E0), frag(E0 + 988)])
    assert len(fl) == 1


def test_from_the_past_prefix_within_3x_gap():
    # out-of-order prefix fragment: tolerated up to 3x gap (track.go:454-462)
    fl = process_fragments([frag(E0), frag(E0 - 1500)])  # 25 min before
    assert len(fl) == 1
    assert fl[0].tracks["ADSB"].ts[0] == E0 - 1500  # merged + resorted


def test_prefix_too_old_rejected():
    fl = process_fragments([frag(E0), frag(E0 - 3 * EXTENSION_MAX_GAP_S - 120)])
    assert len(fl) == 2


def test_misordered_overlapping_same_space_glues():
    # time-overlapping fragment in the same airspace: space overlap -> glue
    fl = process_fragments([frag(E0, n=10), frag(E0 + 20, lat0=37.002)])
    assert len(fl) == 1


def test_overlap_disjoint_space_new_flight():
    # same time window, 2 degrees away: no space overlap -> new flight
    fl = process_fragments([frag(E0, n=10), frag(E0 + 20, lat0=39.5)])
    assert len(fl) == 2


def test_adsb_mlat_accumulate_separately():
    fl = process_fragments(
        [frag(E0), frag(E0 + 60, source="MLAT"), frag(E0 + 120, source="ADSB")]
    )
    assert len(fl) == 1
    assert set(fl[0].tracks) == {"ADSB", "MLAT"}
    assert len(fl[0].tracks["ADSB"].ts) == 10 and len(fl[0].tracks["MLAT"].ts) == 5


def test_callsign_backfill():
    # MLAT callsigns take a while to show up (addtrackfragment.go:77-80)
    fl = process_fragments([frag(E0), frag(E0 + 60, callsign="UAL123")])
    assert fl[0].callsign == "UAL123"


def test_deterministic_flight_id():
    fl = process_fragments([frag(E0 + 60), frag(E0 - 120)])  # prefix merge
    assert fl[0].flight_id == f"A23A23_{int(E0 - 120)}"


# --- in-state incremental enrichment (addtrackfragment.go:111-136) -------------
GAP_FIX = {"GAPWP": (37.05, -122.0)}  # sits between the two fragments below


def _gap_frags():
    """frag1 ends at lat 37.04, frag2 starts at 37.06: the GAPWP fix at
    37.05 is crossed only by the line BETWEEN the fragments."""
    f1 = frag(E0, n=5, dt=10.0, lat0=37.0, dlat=0.01)
    f2 = frag(E0 + 60, n=5, dt=10.0, lat0=37.06, dlat=0.01)
    return f1, f2


def test_waypoint_crossed_in_inter_fragment_gap():
    f1, f2 = _gap_frags()
    fl = process_fragments([f1, f2], fixes=GAP_FIX)
    assert len(fl) == 1
    # crossing ts = segment END = frag2's first point (flightpath.go:37)
    assert fl[0].waypoints == {"GAPWP": f2["ts"][0]}
    # without the previous-point prefix the fix is NOT in either frag
    fl_solo = process_fragments([f1], fixes=GAP_FIX)
    assert fl_solo[0].waypoints == {}
    fl_solo2 = process_fragments([f2], fixes=GAP_FIX)
    assert fl_solo2[0].waypoints == {}


def test_waypoint_inside_fragment_matches():
    f1 = frag(E0, n=5, dt=10.0, lat0=37.03, dlat=0.01)  # passes 37.05
    fl = process_fragments([f1], fixes=GAP_FIX)
    assert "GAPWP" in fl[0].waypoints


def test_airframe_overlay_in_state():
    af = {"A23A23": {"registration": "N12345", "equip_type": "B738"}}
    fl = process_fragments([frag(E0)], airframes=af)
    assert fl[0].registration == "N12345" and fl[0].equip_type == "B738"
    # unknown icao: stays blank
    fl2 = process_fragments([frag(E0, icao="FFFFFF")], airframes=af)
    assert fl2[0].registration == ""


# --- misordered-fragments regression ------------------------------------------
import json
from pathlib import Path


def _real_frags():
    """The reference's own misordered-fragments fixture
    (addtrackfragment_test.go:134 onward): 200 TrackFragments / 1,308
    points for A5BB1B/ASA235 in real PubSub arrival order."""
    raw = json.loads(
        (Path(__file__).parent / "fixtures" / "misordered_frags.json").read_text()
    )
    frags = []
    for fr in raw:
        tr = fr["Track"]
        frags.append(
            {
                "icao": fr["IcaoId"],
                "source": "ADSB",
                "callsign": fr.get("Callsign") or "",
                "ts": [
                    datetime.fromisoformat(
                        p["TimestampUTC"].replace("Z", "+00:00")
                    ).timestamp()
                    for p in tr
                ],
                "lat": [p["Lat"] for p in tr],
                "lon": [p["Long"] for p in tr],
                "alt": [float(p["Altitude"]) for p in tr],
            }
        )
    return frags


def test_real_misordered_fixture_one_flight():
    """addtrackfragment_test.go:21-76: the 200-fragment sequence 'should
    now generate a single flight' — the original bug produced 20."""
    frags = _real_frags()
    fl = process_fragments(frags)
    assert len(fl) == 1
    t = fl[0].tracks["ADSB"]
    assert len(t.ts) == sum(len(f["ts"]) for f in frags) == 1308
    assert t.ts == sorted(t.ts)
    assert fl[0].callsign == "ASA235"
    assert fl[0].icao == "A5BB1B"


def test_misordered_regression_one_flight():
    """196-fragment analog: a 30-min flight chopped into 1-min fragments,
    delivered with local shuffling — must assemble into exactly 1 flight."""
    frags = [frag(E0 + 60 * i, n=6, dt=10.0, lat0=37.0 + 0.01 * i) for i in range(30)]
    rng = random.Random(42)
    # swap adjacent pairs randomly (delivery jitter; gaps stay < 30 min)
    for i in range(0, 28, 2):
        if rng.random() < 0.5:
            frags[i], frags[i + 1] = frags[i + 1], frags[i]
    fl = process_fragments(frags)
    assert len(fl) == 1
    ts = fl[0].tracks["ADSB"].ts
    assert ts == sorted(ts) and len(ts) == 180


# --- batch wrapper -------------------------------------------------------------
def _frag_points_df(spark, frags):
    rows = []
    for idx, fr in enumerate(frags):
        for i in range(len(fr["ts"])):
            rows.append(
                (fr["icao"], idx, fr["source"], fr["callsign"],
                 datetime.fromtimestamp(fr["ts"][i], tz=timezone.utc),
                 fr["lat"][i], fr["lon"][i], fr["alt"][i])
            )
    return spark.createDataFrame(
        rows,
        "icao_id string, frag_idx long, track string, callsign string, "
        "ts timestamp, lat double, lon double, alt_ft double",
    )


def test_assemble_batch(spark):
    frags = (
        [frag(E0 + 60 * i) for i in range(3)]  # flight 1
        + [frag(E0 + 7200 + 60 * i, icao="A23A23") for i in range(2)]  # 2h later: flight 2
        + [frag(E0 + 60 * i, icao="ABC999", callsign="SWA1") for i in range(3)]
    )
    out = assemble_batch(_frag_points_df(spark, frags))
    flights = {r["flight_id"]: r for r in
               out.groupBy("flight_id", "icao_id", "callsign").count().collect()}
    assert len(flights) == 3
    a = [k for k in flights if k.startswith("A23A23")]
    assert len(a) == 2
    sw = flights[f"ABC999_{int(E0)}"]
    assert sw["callsign"] == "SWA1" and sw["count"] == 15


def test_real_misordered_fixture_batch(spark):
    frags = _real_frags()
    out = assemble_batch(_frag_points_df(spark, frags))
    got = out.groupBy("flight_id", "callsign").count().collect()
    assert len(got) == 1
    assert got[0]["count"] == 1308 and got[0]["callsign"] == "ASA235"


def test_real_misordered_fixture_stream(spark, tmp_path):
    """The fixture fed as four in-order micro-batches, then a sentinel
    fragment 2 h later that closes the fixture flight: exactly one
    fixture flight must be emitted, with all 1,308 points."""
    frags = _real_frags()
    src = tmp_path / "frags"
    src.mkdir()
    last_ts = max(t for f in frags for t in f["ts"])
    chunks = [frags[i : i + 50] for i in range(0, 200, 50)]
    for i, ch in enumerate(chunks):
        # frag_idx must be globally increasing (arrival order)
        df = _frag_points_df(spark, ch)
        df = df.withColumn("frag_idx", F.col("frag_idx") + F.lit(i * 50))
        df.coalesce(1).write.parquet(str(src / f"b{i}"))
    sentinel = frag(last_ts + 7200, icao="A5BB1B")
    _frag_points_df(spark, [sentinel]).withColumn(
        "frag_idx", F.col("frag_idx") + F.lit(999)
    ).coalesce(1).write.parquet(str(src / "b9"))
    # file streams process oldest-mtime first: pin batch order explicitly
    import os
    for i, d in enumerate(sorted(src.iterdir())):
        for p in d.rglob("*"):
            os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    stream_in = (
        spark.readStream.schema(
            "icao_id string, frag_idx long, track string, callsign string, "
            "ts timestamp, lat double, lon double, alt_ft double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        assemble_stream(stream_in)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(str(tmp_path / "out"))
    fixture = got.filter(F.col("callsign") == "ASA235")
    assert fixture.select("flight_id").distinct().count() == 1
    assert fixture.count() == 1308


# --- streaming smoke -----------------------------------------------------------
def test_assemble_stream_smoke(spark, tmp_path):
    """applyInPandasWithState wiring: feed two micro-batch directories,
    second fragment starts a new flight (2h gap) which closes flight 1
    and emits its points."""
    src = tmp_path / "frags"
    out_dir = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    df1 = _frag_points_df(spark, [frag(E0 + 60 * i) for i in range(3)])
    df1.write.parquet(str(src / "b1"))
    df2 = _frag_points_df(spark, [frag(E0 + 7200)])
    df2.write.parquet(str(src / "b2"))

    stream_in = (
        spark.readStream.schema(df1.schema).option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        assemble_stream(stream_in)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(out_dir))
    # flight 1 was closed (by the arrival of the 2h-later fragment) and emitted
    assert got.count() == 15
    assert got.select("flight_id").distinct().count() == 1


def test_stream_incremental_enrichment(spark, tmp_path):
    """The gap-crossing fix is attributed in-state: frag1 and frag2
    arrive in separate micro-batches; the emitted flight carries GAPWP
    (ts = frag2's first point) and the overlaid registration."""
    import os

    f1, f2 = _gap_frags()
    src = tmp_path / "frags"
    src.mkdir()
    _frag_points_df(spark, [f1]).coalesce(1).write.parquet(str(src / "b1"))
    _frag_points_df(spark, [f2]).withColumn(
        "frag_idx", F.col("frag_idx") + F.lit(1)
    ).coalesce(1).write.parquet(str(src / "b2"))
    _frag_points_df(spark, [frag(E0 + 7200 + 3600)]).withColumn(
        "frag_idx", F.col("frag_idx") + F.lit(2)
    ).coalesce(1).write.parquet(str(src / "b3"))
    for i, d in enumerate(sorted(src.iterdir())):
        for p in d.rglob("*"):
            os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    stream_in = (
        spark.readStream.schema(
            "icao_id string, frag_idx long, track string, callsign string, "
            "ts timestamp, lat double, lon double, alt_ft double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    af = {"A23A23": {"registration": "N12345", "equip_type": "B738"}}
    q = (
        assemble_stream(stream_in, airframes=af, fixes=GAP_FIX)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    import json as _json

    got = spark.read.parquet(str(tmp_path / "out"))
    first = got.filter(F.col("flight_id") == f"A23A23_{int(E0)}")
    assert first.count() == 10
    row = first.select("waypoints", "registration").first()
    assert row["registration"] == "N12345"
    assert _json.loads(row["waypoints"]) == {"GAPWP": f2["ts"][0]}


def test_dedup_recent_stream(spark, tmp_path):
    from flightdb_spark.streaming.assembly import dedup_recent

    src = tmp_path / "in"
    src.mkdir()
    rows = [("N839AL", "UAL1", datetime(2024, 1, 1, 12, 0, tzinfo=timezone.utc), 1),
            ("N839AL", "UAL1", datetime(2024, 1, 1, 12, 30, tzinfo=timezone.utc), 2),  # dup in window
            ("N999ZZ", "SWA2", datetime(2024, 1, 1, 12, 10, tzinfo=timezone.utc), 3)]
    df = spark.createDataFrame(rows, "registration string, callsign string, ts timestamp, seq long")
    df.write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(df.schema).parquet(str(src / "*"))
    q = (dedup_recent(stream).writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == 2  # the 12:30 re-delivery was suppressed
    assert got.select("registration").distinct().count() == 2
