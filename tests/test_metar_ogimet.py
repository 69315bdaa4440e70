"""Ogimet METAR parser (metar/ogimet.go:20-64) — preparse gluing,
timestamp-prefix decode, A/Q altimeter groups, and contract parity with
the NOAA path so the (station, hour) as-of join consumes either."""

from __future__ import annotations

from datetime import datetime, timezone
from pathlib import Path

import pytest

from flightdb_spark.sources.metar_ogimet import (
    ogimet_reports,
    parse_ogimet,
    parse_ogimet_documents,
    parse_ogimet_line,
    preparse_ogimet,
)

FIXTURE = Path(__file__).parent / "fixtures" / "ogimet_ksfo.txt"


def _text() -> str:
    return FIXTURE.read_text()


def test_preparse_glues_continuations_and_drops_comments():
    recs = preparse_ogimet(_text())
    # 5 records; comments and blank lines dropped; wraps glued with one
    # space and the '=' terminator kept (ogimet.go:29-36)
    assert len(recs) == 5
    assert recs[0].startswith("201601070156 METAR KSFO 070156Z")
    assert recs[0].endswith("SLP168=")
    assert "SCT027 BKN049" in recs[0]  # glued across the wrap


def test_parse_ogimet_fields_and_skips():
    reports = parse_ogimet(_text())
    # 4 of 5 survive: the last record has no altimeter group (the
    # parseNOAA empty-altimeter skip, metar/noaa.go:52-55)
    assert len(reports) == 4
    first = reports[0]
    assert first["station"] == "KSFO"
    assert first["report_time"] == datetime(2016, 1, 7, 1, 56, tzinfo=timezone.utc)
    assert first["altimeter_inhg"] == pytest.approx(30.02)
    assert first["raw"].startswith("METAR KSFO 070156Z")
    assert not first["raw"].endswith("=")


def test_q_group_converts_at_standard_atmosphere():
    # Q1018 -> 1018 hPa * 29.9213 / 1013.25 (metar/metar.go:10 constant)
    speci = parse_ogimet(_text())[3]
    assert speci["report_time"] == datetime(2016, 1, 6, 23, 30, tzinfo=timezone.utc)
    assert speci["altimeter_inhg"] == pytest.approx(1018 * 29.9213 / 1013.25, abs=1e-6)


def test_bad_prefix_raises():
    # OgimetParse errors on records without the 12-digit prefix
    # (ogimet.go:52-55)
    with pytest.raises(ValueError, match="bad ogimet formatting"):
        parse_ogimet_line("METAR KSFO 070156Z 16006KT A3002=")
    with pytest.raises(ValueError, match="bad ogimet timestamp"):
        parse_ogimet_line("201613070156 METAR KSFO 070156Z A3002=")


def test_driver_table_and_bulk_path_agree(spark):
    drv = ogimet_reports(spark, _text())
    assert drv.count() == 4
    assert drv.columns == ["station", "report_time", "altimeter_inhg", "raw"]

    docs = spark.createDataFrame([(_text(),), (None,)], "doc string")
    bulk = parse_ogimet_documents(docs).collect()
    assert sorted(r.raw for r in bulk) == sorted(r.raw for r in drv.collect())


def test_feeds_the_asof_join(spark):
    # Same contract as the NOAA table: the (station, hour) as-of join
    # resolves an Ogimet-sourced archive identically.
    from flightdb_spark.operators.metar import asof_join_metar

    metars = ogimet_reports(spark, _text())
    tp = spark.createDataFrame(
        [(datetime(2016, 1, 7, 1, 58, tzinfo=timezone.utc),)], "ts timestamp"
    )
    out = asof_join_metar(tp, metars, station="KSFO").collect()
    assert len(out) == 1
    assert out[0]["altimeter_inhg"] == pytest.approx(30.02)
