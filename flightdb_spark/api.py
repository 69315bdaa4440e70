"""Lookup surface — point/range queries over the flights lake.

The reference's query builder FQuery (fgae/fquery.go:16-24) composes
Datastore index filters; here each builder returns a Column predicate
over the partitioned flights table, so Catalyst pushes everything to
the parquet scan (the composite-index table app/index.yaml:15-71 is
replaced by column stats + partition pruning, SURVEY §4).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .functions.idspec import IdSpec, parse_idspec

TIMESLOT_MINUTES = 30  # TimeslotDuration (flightdb.go:6-11)


def by_icao_id(x: str) -> Column:
    """fgae/fquery.go:50-52."""
    return F.col("icao_id") == x


def by_callsign(x: str) -> Column:
    """Equality on the raw callsign; registrations are also matched here,
    as in the reference ("Hmm", fquery.go:82)."""
    return (F.col("callsign") == x) | (F.col("registration") == x)


def by_tags(tags: list[str]) -> Column:
    """AND of tag memberships (fgae/fquery.go:56-61)."""
    cond = F.lit(True)
    for t in tags:
        cond = cond & F.array_contains(F.col("tags"), t)
    return cond


def by_waypoints(wps: list[str]) -> Column:
    """Waypoint membership — no "^"+wp tag-prefix hack needed
    (fquery.go:63-68, blob.go:13)."""
    cond = F.lit(True)
    for w in wps:
        cond = cond & F.array_contains(F.map_keys(F.col("waypoints")), w)
    return cond


def by_time(t: datetime) -> Column:
    """Point-in-time: the flight's span covers t (the reference asserts
    Timeslots = slot(t), fquery.go:27-32 — interval containment is the
    unquantized equivalent)."""
    return (F.col("first_ts") <= t) & (F.col("last_ts") >= t)


def by_time_range(s: datetime, e: datetime) -> Column:
    """Interval overlap (>=1 timeslot in range, fquery.go:34-48)."""
    return (F.col("first_ts") <= e) & (F.col("last_ts") >= s)


def by_idspec(spec: str | IdSpec) -> Column:
    """Composite idspec predicate (fquery.go:70-86): time/timerange +
    identity equality, registration falling back to callsign equality."""
    if isinstance(spec, str):
        spec = parse_idspec(spec)
    time_pred = (
        by_time(spec.start) if spec.end is None else by_time_range(spec.start, spec.end)
    )
    if spec.kind == "icao":
        ident = by_icao_id(spec.raw_id)
    else:  # callsign or registration: both match the Ident column family
        ident = by_callsign(spec.raw_id)
    return time_pred & ident


def lookup_most_recent(flights: DataFrame, pred: Column) -> DataFrame:
    """Latest instance of an airframe (fgae/db.go:117-120:
    Order('-LastUpdate').Limit(1))."""
    return flights.filter(pred).orderBy(F.desc("last_ts")).limit(1)


def lookup_all(flights: DataFrame, pred: Column) -> DataFrame:
    """Range idspecs may match several flights (ui/json.go:14-34)."""
    return flights.filter(pred)


def query_for_recent(flights: DataFrame, tags: list[str], n: int,
                     waypoints: list[str] | None = None) -> DataFrame:
    """QueryForRecent[Waypoint] (fquery.go:89-101): tags [+waypoints],
    newest first, limit n."""
    pred = by_tags(tags)
    if waypoints:
        pred = pred & by_waypoints(waypoints)
    return flights.filter(pred).orderBy(F.desc("first_ts")).limit(n)


def query_for_time_range(flights: DataFrame, tags: list[str],
                         s: datetime, e: datetime,
                         waypoints: list[str] | None = None) -> DataFrame:
    """QueryForTimeRange[Waypoint] (fquery.go:109-122); no ordering, as
    the reference notes 'No index'."""
    pred = by_tags(tags) & by_time_range(s, e)
    if waypoints:
        pred = pred & by_waypoints(waypoints)
    return flights.filter(pred)


def snapshot_at(tp: DataFrame, t: datetime) -> DataFrame:
    """Flight positions as of time t (TakeSnapshotAt, snapshot.go:37-52):
    per flight, the latest point <= t, with prev/next context via
    lag/lead being the neighboring rows. Used by the historical airspace
    view (fgae/airspace.go:47-66)."""
    return (
        tp.filter(F.col("ts") <= t)
        .groupBy("flight_id")
        .agg(
            F.max_by(
                F.struct("ts", "lat", "lon", "alt_ft", "groundspeed_kt", "track"),
                F.col("ts"),
            ).alias("_p")
        )
        .select("flight_id", "_p.*")
    )


def localize_to(snap: DataFrame, ref_lat: float, ref_lon: float, ref_alt_ft: float = 0.0) -> DataFrame:
    """Distance + bearing from each snapshot to a reference point
    (LocalizeTo, snapshot.go:27-33): 2D/3D distance and compass bearing,
    the historical-airspace view's localization (ui/historical.go:55-115)."""
    from .functions.geo import bearing_deg, dist3_km, haversine_km

    return snap.select(
        "*",
        F.round(haversine_km(F.col("lat"), F.col("lon"), F.lit(ref_lat), F.lit(ref_lon)), 3).alias("dist_km"),
        F.round(
            dist3_km(F.col("lat"), F.col("lon"), F.col("alt_ft"),
                     F.lit(ref_lat), F.lit(ref_lon), F.lit(ref_alt_ft)), 3
        ).alias("dist3_km"),
        F.round(bearing_deg(F.lit(ref_lat), F.lit(ref_lon), F.col("lat"), F.col("lon")), 1).alias("bearing_deg"),
    )


def realtime_airspace(
    sources: dict[str, DataFrame], now: datetime, max_stale_s: float = 30.0
) -> DataFrame:
    """Composite current-airspace view (app/frontend/
    realtime-airspace.go:80-137, 243-343): each source contributes its
    latest position per aircraft, keys namespaced with the source prefix
    exactly as the reference namespaces icao keys; positions staler than
    30 s (kMaxStaleDuration, realtime-airspace.go:30) are dropped."""
    if not sources:
        raise ValueError("realtime_airspace needs at least one source feed")
    parts = []
    for prefix, df in sources.items():
        latest = (
            df.filter(
                F.unix_timestamp(F.lit(now)) - F.unix_timestamp("ts") <= max_stale_s
            )
            .groupBy("icao_id")
            .agg(
                F.max_by(
                    F.struct("ts", "lat", "lon", "alt_ft", "groundspeed_kt", "callsign"),
                    F.col("ts"),
                ).alias("_p")
            )
            .select(
                F.concat(F.lit(f"{prefix}:"), F.col("icao_id")).alias("key"),
                F.col("icao_id"),
                F.lit(prefix).alias("source"),
                "_p.*",
            )
        )
        parts.append(latest)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timeslots(first_ts, last_ts) -> F.Column:
    """Exploded 30-minute timeslot array for exact index parity with the
    reference (TimeslotDuration, flightdb.go:6-11; flight.go:337-352):
    every 30-min bucket the flight's span overlaps. The plain interval
    predicates in by_time/by_time_range are the production path; this is
    the quantized variant for parity tests."""
    slot = TIMESLOT_MINUTES * 60
    first_slot = (F.unix_timestamp(first_ts) / slot).cast("long") * slot
    last_slot = (F.unix_timestamp(last_ts) / slot).cast("long") * slot
    return F.transform(
        F.sequence(first_slot, last_slot, F.lit(slot)),
        lambda s: F.timestamp_seconds(s),
    )


def by_time_quantized(t: datetime) -> Column:
    """Timeslot-equality point query (fquery.go:27-32 parity variant):
    requires a `timeslots` column built by `timeslots()`."""
    slot = TIMESLOT_MINUTES * 60
    t_slot = int(t.timestamp()) // slot * slot
    return F.array_contains(F.col("timeslots"), F.timestamp_seconds(F.lit(t_slot)))
