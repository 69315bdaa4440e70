"""Summary/export jobs: condensed daily rollup + flights_summary.

- CondensedFlight (condensed.go:15-25): a whole day of regional flights
  in <1 MB — idspec, flight number, icao, start/end, tags, waypoints.
  Our analog is a materialized daily summary table (SURVEY §2.5),
  built only for *closed* partitions (the 2-hour cool-off,
  fgae/condensed.go:18-54).

- FlightForBigQuery (bigquery.go:14-35, bigquery/flight-schema.json):
  the denormalized per-flight export — already the shape the reference's
  author wanted for SQL analytics, so here it is the primary summary
  table, enriched with track stats. Midnight-straddling flights appear
  in two day-partitions of the raw lake; the export dedupes by keeping
  the flight whose first point falls on the partition date
  (app/backend/bigquery.go:162-170) — days are PDT-midnight-based
  (app/backend/batch.go:142-144).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PDT_TZ = "America/Los_Angeles"


def _idspec_str(icao_col, first_ts_col) -> F.Column:
    """flight idspec string ID@epoch (idspec.go:23-37)."""
    return F.concat_ws(
        "@", icao_col, F.unix_timestamp(first_ts_col).cast("string")
    )


def condensed_daily(flights: DataFrame, date_pdt: str) -> DataFrame:
    """One PDT day's flights → condensed summaries
    (condensed.go:48-67 per-flight; keyed (s,e,tags) singleton in the
    reference, a date-partitioned summary table here)."""
    local_date = F.to_date(F.from_utc_timestamp(F.col("first_ts"), PDT_TZ))
    return flights.filter(local_date == F.lit(date_pdt)).select(
        _idspec_str(F.coalesce("icao_id", "callsign"), F.col("first_ts")).alias("idspec"),
        F.coalesce("callsign", "registration").alias("flightnumber"),
        "icao_id",
        "first_ts",
        "last_ts",
        "tags",
        F.map_keys("waypoints").alias("waypoint_names"),
        F.lit(date_pdt).cast("date").alias("date_pdt"),
    )


def flights_summary(flights: DataFrame, tp: DataFrame, date_pdt: str | None = None) -> DataFrame:
    """BigQuery-shaped denormalized export + track stats.

    Columns mirror bigquery/flight-schema.json:1-25 (repeated tags /
    tracks; record-repeated waypoints) plus per-flight track statistics
    the report layer reuses. Partial aggregation runs map-side; the only
    shuffle is the groupBy(flight_id), co-partitioned with the join."""
    stats = tp.groupBy("flight_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.collect_set("track").alias("track_sources"),
        F.min("ts").alias("track_first_ts"),
        F.max("ts").alias("track_last_ts"),
        F.max("alt_ft").alias("max_alt_ft"),
        F.max("groundspeed_kt").alias("max_groundspeed_kt"),
    )
    number = F.col("number") if "number" in flights.columns else F.lit(None).cast("long")
    out = (
        flights.select(
            "flight_id",
            _idspec_str(F.coalesce("icao_id", "callsign"), F.col("first_ts")).alias("idspec"),
            "icao_id",
            "callsign",
            "registration",
            "equip_type",
            "orig",
            "dest",
            number.alias("number"),
            "first_ts",
            "last_ts",
            "tags",
            F.transform(
                F.map_entries("waypoints"),
                lambda e: F.struct(e["key"].alias("name"), e["value"].alias("time")),
            ).alias("waypoints"),
        )
        .join(stats, "flight_id", "left")
        .withColumn(
            "date_pdt", F.to_date(F.from_utc_timestamp(F.col("first_ts"), PDT_TZ))
        )
    )
    if date_pdt is not None:
        # midnight-straddle dedupe: only flights whose first point is on
        # the partition date (app/backend/bigquery.go:162-170)
        out = out.filter(F.col("date_pdt") == F.lit(date_pdt))
    return out


def write_summary(out: DataFrame, path: str) -> None:
    """Daily partitioned write — the BQ load-job analog
    (app/backend/bigquery.go:195-252)."""
    out.write.mode("overwrite").partitionBy("date_pdt").parquet(path)


def run_archiver(
    flights: DataFrame,
    out_root: str,
    date_from: str,
    date_to: str,
    *,
    tz: str = PDT_TZ,
) -> list[dict]:
    """Day-ranged verified cold archive (cmd/fdb/fdb.go:210-296).

    For each PDT day in [date_from, date_to] (inclusive; accepts
    ``2015.01.01`` like the reference flags, or ISO ``2015-01-01``):
    select flights overlapping the day's [midnight, midnight+1d) window
    (ByTimeRange semantics), keep only flights whose FIRST 30-minute
    timeslot is not before the window start — the midnight-straddler
    first-day rule (fdb.go:226-233: a flight straddling midnight shows
    up in two day queries; only the day containing its first timeslot
    archives it) — write ``<out_root>/<YYYY-MM-DD>-flights`` and verify
    the round trip row-for-row (sinks.archive_verified, the decode+
    DeepEqual analog). Returns one dict per day:
    ``{date, path, n_flights, verified}``.

    The reference then deletes archived keys from the hot store in
    ≤500-key passes; here hot-store pruning is the caller's anti-join
    on the archived flight ids (storage mutations stay explicit). The
    per-day driver loop mirrors the reference's day fan-out and is
    bounded by the date range; archiving YEARS at 100 TB would instead
    be one job writing partitionBy(date) with the same first-slot rule
    as a column predicate."""
    from datetime import datetime, timedelta, timezone
    from zoneinfo import ZoneInfo

    from .sinks import archive_verified

    zone = ZoneInfo(tz)

    def parse(d: str) -> datetime:
        return datetime.strptime(d.replace(".", "-"), "%Y-%m-%d")

    day = parse(date_from)
    end = parse(date_to)
    out: list[dict] = []
    slot = 30 * 60
    while day <= end:
        s_local = day.replace(tzinfo=zone)
        e_local = (day + timedelta(days=1)).replace(tzinfo=zone)
        s = s_local.astimezone(timezone.utc).replace(tzinfo=None)
        e = e_local.astimezone(timezone.utc).replace(tzinfo=None)
        first_slot = (F.unix_timestamp("first_ts") / slot).cast("long") * slot
        days_flights = flights.filter(
            (F.col("first_ts") < F.lit(e))
            & (F.col("last_ts") >= F.lit(s))
            & (first_slot >= F.unix_timestamp(F.lit(s)))
        )
        path = f"{out_root}/{day.strftime('%Y-%m-%d')}-flights"
        n = days_flights.count()
        if n == 0:
            # fdb.go:253-256: nothing to archive or verify; skip the day
            out.append(
                {"date": day.strftime("%Y-%m-%d"), "path": path,
                 "n_flights": 0, "verified": None}
            )
        else:
            ok = archive_verified(days_flights, path)
            out.append(
                {"date": day.strftime("%Y-%m-%d"), "path": path,
                 "n_flights": n, "verified": ok}
            )
        day += timedelta(days=1)
    return out
