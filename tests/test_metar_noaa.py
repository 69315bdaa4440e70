"""NOAA METAR parser + (station, hour)-keyed as-of join, against the
reference's own fixture (metar/metar_test.go:11-106)."""

from __future__ import annotations

from datetime import datetime, timezone
from pathlib import Path

import pytest

from flightdb_spark.sources.metar_noaa import (
    noaa_reports,
    parse_noaa,
    parse_noaa_documents,
)

FIXTURE = Path(__file__).parent / "fixtures" / "noaa_ksfo.txt"


def _text() -> str:
    return FIXTURE.read_text()


def test_parse_noaa_counts_and_fields():
    # TestParseNOAA: all 34 rows survive (none lack altim_in_hg)
    reports = parse_noaa(_text())
    assert len(reports) == 34
    first = reports[0]
    assert first["station"] == "KSFO"
    assert first["report_time"] == datetime(2016, 1, 30, 20, 56, tzinfo=timezone.utc)
    assert first["altimeter_inhg"] == pytest.approx(30.050198)
    assert first["raw"].startswith("KSFO 302056Z")


def test_parse_noaa_skips_blank_altimeter_and_preamble():
    text = "\n".join(
        [
            "No errors",
            "2 results",
            "raw_text,station_id,observation_time,altim_in_hg",
            "KTST 010156Z,KTST,2016-01-01T01:56:00Z,30.01",
            "KTST 010256Z,KTST,2016-01-01T02:56:00Z,",  # no altimeter -> skip
        ]
    )
    reports = parse_noaa(text)
    assert len(reports) == 1 and reports[0]["altimeter_inhg"] == 30.01


def _metars(spark):
    return noaa_reports(spark, _text())


def test_lookup_rewind_semantics(spark):
    # TestLookup (metar/metar_test.go:75-106), via the as-of join:
    #   22:58 -> that hour's 22:56 report; 22:50 -> previous hour's
    #   (22:56 is in the 'future'); 12:50 / other-day -> no match.
    from flightdb_spark.operators.metar import asof_join_metar

    tp = spark.createDataFrame(
        [
            ("t1", datetime(2016, 1, 29, 22, 58)),
            ("t2", datetime(2016, 1, 29, 22, 50)),
            ("t3", datetime(2016, 1, 29, 12, 50)),
            ("t4", datetime(2016, 1, 1, 12, 50)),
        ],
        "pid string, ts timestamp",
    )
    got = {
        r["pid"]: (r["metar_time"], r["altimeter_inhg"])
        for r in asof_join_metar(tp, _metars(spark), station="KSFO").collect()
    }
    assert got["t1"] == (datetime(2016, 1, 29, 22, 56), pytest.approx(30.059055))
    assert got["t2"] == (datetime(2016, 1, 29, 21, 56), pytest.approx(30.079725))
    assert got["t3"] == (None, None)
    assert got["t4"] == (None, None)


def test_asof_join_two_stations_same_hour(spark):
    # metar.go:94-119 keys every lookup by station: two stations in one
    # hour must resolve independently, not to whichever reported latest.
    from flightdb_spark.operators.metar import asof_join_metar

    metars = spark.createDataFrame(
        [
            ("KSFO", datetime(2016, 1, 29, 22, 56), 30.05, "r1"),
            ("KSJC", datetime(2016, 1, 29, 22, 58), 29.80, "r2"),
        ],
        "station string, report_time timestamp, altimeter_inhg double, raw string",
    )
    tp = spark.createDataFrame(
        [
            ("p1", "KSFO", datetime(2016, 1, 29, 22, 59)),
            ("p2", "KSJC", datetime(2016, 1, 29, 22, 59)),
        ],
        "pid string, stn string, ts timestamp",
    )
    got = {
        r["pid"]: r["altimeter_inhg"]
        for r in asof_join_metar(tp, metars, station_col="stn").collect()
    }
    assert got == {"p1": pytest.approx(30.05), "p2": pytest.approx(29.80)}

    with pytest.raises(ValueError):
        asof_join_metar(tp, metars)


def test_parse_noaa_documents_distributed(spark):
    docs = spark.createDataFrame([(_text(),), (None,)], "doc string")
    out = parse_noaa_documents(docs)
    assert out.count() == 34
    assert set(out.columns) == {"station", "report_time", "altimeter_inhg", "raw"}
