"""Sideview/descent-profile data prep (SURVEY §2.11).

The reference renders PDF side-views of altitude/speed/acceleration
against distance-along-path or distance-to-airport
(ui/sideview.go:20-100, fpdf/descent.go:12-139). PDF rendering is
presentation; the *data prep* — per-flight series (x, y) with optional
smoothing — is an engine deliverable and lives here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.geo import haversine_km


def sideview_series(
    tp_derived: DataFrame,
    x: str = "dist_along_path",  # or 'dist_to_ref'
    ref: tuple[float, float] | None = None,
    smooth_points: int = 0,
) -> DataFrame:
    """Per-flight series rows (flight_id, x, alt_ft, groundspeed_kt,
    ground_accel_kps), x = running distance (fpdf/trackprojector.go's
    along-path projection) or distance to a reference airport
    (descent.go's dist-to-airport axis). `smooth_points` applies the
    reference's optional centered averaging window
    (ui/sideview.go:55-70) as a rows-between window mean."""
    if x == "dist_along_path":
        xcol = F.col("dist_travelled_km")
    else:
        if ref is None:
            raise ValueError("dist_to_ref needs a (lat, lon) reference")
        xcol = haversine_km(F.col("lat"), F.col("lon"), F.lit(ref[0]), F.lit(ref[1]))
    out = tp_derived.select(
        "flight_id",
        "track",
        "ts",
        xcol.alias("x_km"),
        "alt_ft",
        "groundspeed_kt",
        "ground_accel_kps",
    )
    if smooth_points > 0:
        half = smooth_points // 2
        w = W.partitionBy("flight_id", "track").orderBy("ts").rowsBetween(-half, half)
        out = (
            out.withColumn("alt_ft", F.avg("alt_ft").over(w))
            .withColumn("groundspeed_kt", F.avg("groundspeed_kt").over(w))
            .withColumn("ground_accel_kps", F.avg("ground_accel_kps").over(w))
        )
    # series stays in flight order; dist_to_ref is non-monotone by design
    return out.orderBy("flight_id", "track", "ts")
