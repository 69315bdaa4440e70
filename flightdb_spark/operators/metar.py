"""METAR as-of join + pressure-altitude correction.

The reference keeps an hour-indexed archive of METAR reports per station
(metar/metar.go:37-45) and looks up the report for a trackpoint's hour,
rewinding one hour when the stored report is *after* the point (reports
land at ~:56 past the hour — metar/metar.go:94-100 Lookup /
:106-119 DirectLookup). Track.AdjustAltitudes (track.go:231-260) then
computes IndicatedAltitude from pressure altitude and the altimeter
setting; the standard-pressure constant 29.9213 inHg is from
metar/metar.go:10.

Spark-first shape: the METAR table is tiny (24 rows/station/day → a few
MB for years), so the as-of join is a **broadcast** join on the truncated
hour — two keyed lookups (current hour, previous hour) resolved by the
rewind rule in a `when()`. No range join, no shuffle of the trackpoint
side, and the whole thing stays in whole-stage codegen. At 100 TB the
trackpoints side streams through map tasks untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Standard atmosphere sea-level pressure, inHg (metar/metar.go:10).
STANDARD_INHG = 29.9213


def asof_join_metar(
    tp: DataFrame,
    metars: DataFrame,
    ts_col: str = "ts",
    station: str | None = None,
    station_col: str | None = None,
) -> DataFrame:
    """Attach `altimeter_inhg` + `metar_time` to each trackpoint row.

    `metars` schema: (station string, report_time timestamp,
    altimeter_inhg double, raw string). Lookup rule (metar.go:94-100):
    take the report stored for hour(t) at the point's station; if
    missing or its report_time is after t, take the report for
    hour(t)-1; else none.

    The archive is per-station (metar.go:37-45 keys Archive by station
    upstream), so every lookup here is keyed by (station, hour):
    ``station_col`` names a station column on ``tp``; otherwise the
    single ``station`` argument applies to every row. One of the two is
    required — an hour-only join would silently collapse multi-station
    tables to whichever station reported latest each hour.
    """
    if station_col is None and station is None:
        raise ValueError("asof_join_metar needs station= or station_col=")
    if station is not None and station_col is None:
        metars = metars.filter(F.col("station") == station)
    # one report per (station, hour), latest wins — the archive invariant
    # the reference maintains on Add (metar.go:125-141: hour-indexed
    # [24]Report per day, later report_time wins). Without this a SPECI
    # in the same hour would duplicate every joined trackpoint row.
    m = (
        metars.groupBy(
            F.col("station").alias("_m_station"),
            F.date_trunc("hour", F.col("report_time")).alias("_m_hour"),
        )
        .agg(
            F.max_by(
                F.struct(F.col("report_time"), F.col("altimeter_inhg")),
                F.col("report_time"),
            ).alias("_r")
        )
        .select("_m_station", "_m_hour", F.col("_r.report_time"), F.col("_r.altimeter_inhg"))
    )
    cur = F.broadcast(
        m.select(
            F.col("_m_station"),
            F.col("_m_hour"),
            F.col("report_time").alias("_cur_time"),
            F.col("altimeter_inhg").alias("_cur_inhg"),
        )
    )
    prv = F.broadcast(
        m.select(
            F.col("_m_station"),
            (F.col("_m_hour") + F.expr("INTERVAL 1 HOUR")).alias("_m_hour"),
            F.col("report_time").alias("_prv_time"),
            F.col("altimeter_inhg").alias("_prv_inhg"),
        )
    )
    tp_station = F.col(station_col) if station_col else F.lit(station)
    t = tp.withColumn("_tp_hour", F.date_trunc("hour", F.col(ts_col))).withColumn(
        "_tp_station", tp_station
    )
    joined = (
        t.join(
            cur,
            (t["_tp_hour"] == cur["_m_hour"]) & (t["_tp_station"] == cur["_m_station"]),
            "left",
        )
        .drop("_m_hour", "_m_station")
        .join(
            prv,
            (t["_tp_hour"] == prv["_m_hour"]) & (t["_tp_station"] == prv["_m_station"]),
            "left",
        )
        .drop("_m_hour", "_m_station")
    )
    use_prev = F.col("_cur_time").isNull() | (F.col("_cur_time") > F.col(ts_col))
    return (
        joined.withColumn(
            "altimeter_inhg",
            F.when(use_prev, F.col("_prv_inhg")).otherwise(F.col("_cur_inhg")),
        )
        .withColumn(
            "metar_time",
            F.when(use_prev, F.col("_prv_time")).otherwise(F.col("_cur_time")),
        )
        .drop("_tp_hour", "_tp_station", "_cur_time", "_cur_inhg", "_prv_time", "_prv_inhg")
    )


def with_indicated_altitude(tp: DataFrame, alt_col: str = "alt_ft") -> DataFrame:
    """IndicatedAltitude from pressure altitude + altimeter setting
    (track.go:231-260): indicated = alt + 1000 * (inHg - 29.9213).
    Points with no METAR keep their pressure altitude, as the reference
    does ("no historic METAR" branch, track.go:244-248)."""
    corrected = F.col(alt_col) + F.lit(1000.0) * (
        F.col("altimeter_inhg") - F.lit(STANDARD_INHG)
    )
    return tp.withColumn(
        "indicated_alt_ft",
        F.when(F.col("altimeter_inhg").isNotNull(), corrected).otherwise(F.col(alt_col)),
    )
