"""fdb — command-line lookups over a flights parquet lake.

The reference's only non-HTTP entry point is a flag-driven query
builder (cmd/fdb/fdb.go:80-97: -icao / -callsign / -foia / -limit
compose an FQuery ordered by -LastUpdate) that prints one line per
match (fdb.go:101-124: identity, start time, point count, idspec).
Same surface here: argparse → api.py predicates → orderBy/limit →
formatted lines. The Spark plan is a pushed-down scan + top-k; no
driver-side filtering.

Usage:
    python -m flightdb_spark.cli --flights /path/to/flights.parquet \
        [--icao A12345] [--callsign UAL123] [--foia] [--tags AL,SFO] \
        [--idspec A12345@2024-06-01T12:00:00] [--limit 40] [--utc]
"""

from __future__ import annotations

import argparse
import sys
from datetime import datetime, timezone
from zoneinfo import ZoneInfo

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import api

PDT_TZ = "America/Los_Angeles"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="fdb", description=__doc__.splitlines()[0])
    p.add_argument("--flights", default="", help="flights parquet path")
    p.add_argument("--icao", default="", help="ICAO id for airframe (6-digit hex)")
    p.add_argument("--callsign", default="", help="callsign or registration")
    p.add_argument("--foia", action="store_true", help="FOIA data only")
    p.add_argument("--tags", default="", help="comma-separated tag AND-list")
    p.add_argument("--idspec", default="", help="idspec string (ID@epoch or ID@s:e)")
    p.add_argument("--limit", type=int, default=40, help="how many matches")
    p.add_argument("--utc", action="store_true",
                   help="print times in UTC (default PDT, like the reference)")
    # archiver mode (fdb.go:63-64, 382-386): when --archivefrom is set,
    # run the day-ranged verified cold archive instead of a query
    p.add_argument("--archivefrom", default="", help="2015.01.01 — archive start day (PDT)")
    p.add_argument("--archiveto", default="", help="2015.01.02 — archive end day (PDT, inclusive)")
    p.add_argument("--out", default="", help="archive output root (required with --archivefrom)")
    # registry-query mode: run any driver-gated query by name
    p.add_argument("--query", default="",
                   help="registry query name (e.g. q01_pricing_summary); "
                        "use 'list' to print all names")
    p.add_argument("--sf-dir", default="",
                   help="test-table dir for --query (default $SPARK_GRAFT_SF_DIR "
                        "or /root/testdata/sf0.001)")
    p.add_argument("--csv", default="",
                   help="with --query: write the result as a single CSV here "
                        "instead of printing")
    return p


def run_query_mode(spark: SparkSession, args: argparse.Namespace) -> int:
    """`fdb --query qNN`: run a registry query, print rows or dump CSV.

    The CLI twin of the driver contract — the same registry the driver
    grades is the one a user can invoke by name."""
    from .queries import load_registry
    from .tables import sf_dir_from_env

    registry = load_registry()
    if args.query == "list":
        for name, qd in sorted(registry.items()):
            first = (qd.doc or "").strip().splitlines()
            print(f"{name}\t{first[0] if first else ''}")
        return 0
    if args.query not in registry:
        print(f"unknown query {args.query!r}; try --query list", file=sys.stderr)
        return 2
    sf_dir = args.sf_dir or sf_dir_from_env()
    df = registry[args.query].fn(spark, sf_dir)
    if args.csv:
        from .sinks import write_report_csv

        write_report_csv(df, args.csv)
        print(f"{args.query}: wrote {args.csv}")
        return 0
    rows = df.limit(args.limit).collect()
    cols = df.columns
    print("\t".join(cols))
    for r in rows:
        print("\t".join(str(r[c]) for c in cols))
    return 0


def query_from_args(flights: DataFrame, args: argparse.Namespace) -> DataFrame:
    """fdb.go:80-97 queryFromArgs, over a DataFrame."""
    pred = F.lit(True)
    if args.foia:
        pred = pred & api.by_tags(["FOIA"])
    if args.tags:
        pred = pred & api.by_tags([t for t in args.tags.split(",") if t])
    if args.icao:
        pred = pred & api.by_icao_id(args.icao)
    if args.callsign:
        pred = pred & api.by_callsign(args.callsign)
    if args.idspec:
        pred = pred & api.by_idspec(args.idspec)
    return flights.filter(pred).orderBy(F.desc("last_ts")).limit(args.limit)


def format_rows(rows: list, tz: str = PDT_TZ) -> list[str]:
    """fdb.go:113-124: '[ i] identity start npts idspec'.

    Display timezone is applied here, from the row's epoch seconds —
    NOT via spark.sql.session.timeZone, which does not affect how
    collect() materializes TimestampType (those come back in the
    driver's OS timezone)."""
    zone = timezone.utc if tz == "UTC" else ZoneInfo(tz)
    out = []
    for i, r in enumerate(rows):
        ident = r["callsign"] or r["icao_id"] or r["flight_id"]
        epoch = r["first_epoch"]
        ts_str = "-" if epoch is None else datetime.fromtimestamp(epoch, zone).isoformat()
        epoch_str = "" if epoch is None else f"{epoch:.6f}".rstrip("0").rstrip(".")
        npts = r["n_points"] or 0
        out.append(f"[{i:2d}] {ident:>25.25s} {ts_str} {npts:4d}pts "
                   f"{r['icao_id'] or ''}@{epoch_str}")
    return out


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    args = build_parser().parse_args(argv)
    own_session = spark is None
    if own_session:
        # the engine's tuned builder (UTC session tz, AQE, Arrow) — a
        # hand-rolled session here would silently drift from the
        # engine's timestamp semantics the moment the CLI collects one
        from .session import get_spark

        spark = get_spark("fdb-cli")
    try:
        if args.query:
            return run_query_mode(spark, args)
        if not args.flights:
            print("--flights is required unless --query is given", file=sys.stderr)
            return 2
        flights = spark.read.parquet(args.flights)
        if args.archivefrom:
            # archiver mode (fdb.go:382-386): day range → verified cold
            # export, one line per day, exit 1 if any day fails verify
            from .jobs import run_archiver

            if not args.out:
                print("--out is required with --archivefrom", file=sys.stderr)
                return 2
            results = run_archiver(
                flights, args.out, args.archivefrom,
                args.archiveto or args.archivefrom,
            )
            ok = True
            for r in results:
                status = ("skipped (no flights)" if r["verified"] is None
                          else "verified" if r["verified"] else "VERIFY FAILED")
                ok = ok and r["verified"] is not False
                print(f"{r['date']}: {r['n_flights']} flights -> "
                      f"{r['path']} [{status}]")
            return 0 if ok else 1
        if "n_points" not in flights.columns:
            flights = flights.withColumn("n_points", F.lit(None).cast("int"))
        # Epoch seconds are timezone-unambiguous across the collect()
        # boundary; the display zone is applied driver-side. A double cast
        # keeps sub-second precision (unix_timestamp truncates to seconds).
        rows = (
            query_from_args(flights, args)
            .withColumn("first_epoch", F.col("first_ts").cast("double"))
            .collect()
        )
        for line in format_rows(rows, tz="UTC" if args.utc else PDT_TZ):
            print(line)
        return 0
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
