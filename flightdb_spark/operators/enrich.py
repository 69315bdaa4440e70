"""Reference-table enrichment joins (SURVEY §2.3).

All three caches in the reference (airframe, schedule, identity merge)
are broadcast dims here; "fill only blank fields" becomes coalesce with
the flight's own column first (OverlayAirframe, airframe.go:21-25;
MergeIdentityFrom, flight.go:296-330 — first-non-null, never overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AIRFRAME_FIELDS = ("registration", "equip_type", "callsign_prefix")


def overlay_airframe(flights: DataFrame, airframes: DataFrame) -> DataFrame:
    """Broadcast-join the airframes dim (icao24 → registration / equip /
    callsign prefix; ref/airframecache.go:17-44, applied fgae/db.go:15-29)
    and fill only fields the flight lacks."""
    dim = F.broadcast(
        airframes.select(
            F.col("icao24").alias("icao_id"),
            *[F.col(f).alias(f"_af_{f}") for f in AIRFRAME_FIELDS if f in airframes.columns],
        )
    )
    out = flights.join(dim, "icao_id", "left")
    for f in AIRFRAME_FIELDS:
        if f"_af_{f}" in out.columns:
            own = F.col(f) if f in flights.columns else F.lit(None).cast("string")
            own = F.when(own == "", None).otherwise(own)  # blank == missing
            out = out.withColumn(f, F.coalesce(own, F.col(f"_af_{f}"))).drop(f"_af_{f}")
    return out


def merge_identity(flights: DataFrame, snapshots: DataFrame, fields: tuple[str, ...]) -> DataFrame:
    """First-non-null merge of an identity snapshot into stored flights,
    never overwriting (MergeIdentityFrom, flight.go:296-330)."""
    dim = F.broadcast(
        snapshots.select("icao_id", *[F.col(f).alias(f"_sn_{f}") for f in fields])
    )
    out = flights.join(dim, "icao_id", "left")
    for f in fields:
        own = F.col(f) if f in flights.columns else F.lit(None)
        own = F.when(own == "", None).otherwise(own)
        out = out.withColumn(f, F.coalesce(own, F.col(f"_sn_{f}"))).drop(f"_sn_{f}")
    return out


def enrich_schedule(
    flights: DataFrame, schedules: DataFrame, now_ts, max_age_s: int = 1200
) -> DataFrame:
    """Schedule-cache join with the 20-minute staleness rule
    (ref/schedulecache.go:17-47; freshness check
    app/frontend/realtime-airspace.go:184-189): stale rows join as null."""
    fresh = schedules.filter(
        F.unix_timestamp(F.lit(now_ts)) - F.unix_timestamp("fetched_at") <= max_age_s
    )
    dim = F.broadcast(
        fresh.select(
            "icao_id",
            F.col("orig").alias("sched_orig"),
            F.col("dest").alias("sched_dest"),
            F.col("number").alias("sched_number"),
        )
    )
    return flights.join(dim, "icao_id", "left")
