"""Derived trackpoint columns — Track.PostProcess as window functions.

The reference recomputes these per-flight in RAM on every read
(track.go:187-226, fields marked datastore:"-" at trackpoint.go:30-45).
Here they are one window pass over the long-format trackpoints table:
partition by (flight_id, track), order by ts — a single shuffle, then
whole-stage-codegen lag arithmetic. At 100 TB the partition key matches
the table's bucketing so the shuffle disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.geo import haversine_km

# Sanity filter threshold: implied speed > 1000 KPH is bogus radar
# (AsSanityFilteredTrack, track.go:809-839).
MAX_PLAUSIBLE_KPH = 1000.0


def _w():
    return W.partitionBy("flight_id", "track").orderBy(F.col("ts").asc())


def with_derived_columns(tp: DataFrame) -> DataFrame:
    """Add the PostProcess columns (track.go:195-226):

      step_km              — point-to-point haversine
      dist_travelled_km    — running sum (track.go:216)
      groundspeed_kt       — derived for FOIA, which lacks it (track.go:208-213)
      ground_accel_kps     — Δgroundspeed / Δt (track.go:217)
      vertical_speed_fpm   — Δalt / Δminutes (track.go:218)
      vertical_accel_fpmps — Δvertical_speed / Δt (track.go:219-220)
      angle_of_inclination — atan2(Δalt_km, step_km) degrees (track.go:222-224)
    """
    w = _w()
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    lag_lat, lag_lon = F.lag("lat").over(w), F.lag("lon").over(w)
    dt_s = (F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)) / 1e6
    step_km = haversine_km(lag_lat, lag_lon, F.col("lat"), F.col("lon"))

    out = (
        tp.withColumn("dt_s", dt_s)
        .withColumn("step_km", step_km)
        .withColumn(
            "groundspeed_kt",
            F.when(
                F.col("groundspeed_kt").isNull() & (F.col("dt_s") > 0),
                # km / h / 1.852 = knots (track.go:208-213)
                F.col("step_km") / (F.col("dt_s") / 3600.0) / 1.852,
            ).otherwise(F.col("groundspeed_kt")),
        )
        .withColumn("dist_travelled_km", F.sum("step_km").over(wrun))
    )
    lag_gs = F.lag("groundspeed_kt").over(w)
    lag_alt = F.lag("alt_ft").over(w)
    out = out.withColumn(
        "ground_accel_kps",
        F.when(F.col("dt_s") > 0, (F.col("groundspeed_kt") - lag_gs) / F.col("dt_s")),
    ).withColumn(
        "vertical_speed_fpm",
        F.when(F.col("dt_s") > 0, (F.col("alt_ft") - lag_alt) / (F.col("dt_s") / 60.0)),
    )
    lag_vs = F.lag("vertical_speed_fpm").over(w)
    out = out.withColumn(
        "vertical_accel_fpmps",
        F.when(F.col("dt_s") > 0, (F.col("vertical_speed_fpm") - lag_vs) / F.col("dt_s")),
    ).withColumn(
        "angle_of_inclination",
        F.degrees(
            F.atan2((F.col("alt_ft") - lag_alt) * 0.0003048, F.col("step_km"))
        ),
    )
    return out.drop("dt_s")


def sanity_filter(tp: DataFrame) -> DataFrame:
    """Drop points whose implied speed from the last *kept* point exceeds
    1000 KPH, then recompute derived columns (AsSanityFilteredTrack,
    track.go:809-839). The reference scans sequentially, comparing each
    candidate against the last point it kept — a greedy stateful pass, not
    a lag window (a lag pass would also drop the good point *after* a
    teleport, since its lag neighbor is the bogus one). Grouped Arrow UDF
    per (flight_id, track): group = one track, thousands of points, well
    within an Arrow batch."""
    schema = tp.schema

    def _clean(pdf):
        import numpy as np

        from ..functions.geo import np_haversine_km

        pdf = pdf.sort_values("ts").reset_index(drop=True)
        n = len(pdf)
        if n <= 1:
            return pdf
        lat = pdf["lat"].to_numpy(dtype=np.float64)
        lon = pdf["lon"].to_numpy(dtype=np.float64)
        ts = pdf["ts"].astype("int64").to_numpy() / 1e9  # epoch seconds
        keep = np.zeros(n, dtype=bool)
        keep[0] = True
        last = 0
        for i in range(1, n):
            dt_h = (ts[i] - ts[last]) / 3600.0
            step = float(np_haversine_km(lat[last], lon[last], lat[i], lon[i]))
            # dt<=0 (duplicate timestamp): plausible only if co-located
            if (step <= MAX_PLAUSIBLE_KPH * dt_h) if dt_h > 0 else (step < 0.1):
                keep[i] = True
                last = i
        return pdf[keep]

    cleaned = tp.groupBy("flight_id", "track").applyInPandas(_clean, schema)
    return with_derived_columns(cleaned)
