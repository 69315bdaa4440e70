"""Track-array utility operators (SURVEY §2.4), set-based.

The reference implements these as per-flight Go array walks; each is a
window/filter/aggregate here and runs across every flight at once. All
take the long-format trackpoints DataFrame (flight_id, track, ts, lat,
lon, alt_ft, ...).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.geo import haversine_km


def _w():
    return W.partitionBy("flight_id", "track").orderBy("ts")


def clip_to(tp: DataFrame, s: datetime, e: datetime) -> DataFrame:
    """Points within [s, e], endpoints swapped if reversed
    (ClipTo, track.go:581-596)."""
    lo, hi = (s, e) if s <= e else (e, s)
    return tp.filter(F.col("ts").between(lo, hi))


def padded_trim_to_times(tp: DataFrame, s: datetime, e: datetime, pad: int = 0) -> DataFrame:
    """TrimToTimes with ±pad neighbor points either side
    (PaddedTrimToTimes, track.go:279-299) — row_number arithmetic."""
    w = _w()
    idx = tp.withColumn("_i", F.row_number().over(w))
    bounds = (
        idx.filter(F.col("ts").between(s, e))
        .groupBy("flight_id", "track")
        .agg(F.min("_i").alias("_lo"), F.max("_i").alias("_hi"))
    )
    return (
        idx.join(bounds, ["flight_id", "track"])
        .filter(F.col("_i").between(F.col("_lo") - pad, F.col("_hi") + pad))
        .drop("_i", "_lo", "_hi")
    )


def sample_every(tp: DataFrame, seconds: float, tiebreak: str | None = None) -> DataFrame:
    """≥1 point per time bucket (SampleEvery, track.go:604-631; the
    floor-division bucketing noted in SURVEY §2.4 — same guarantee as
    the reference's greedy walk at bucket granularity). `tiebreak`
    names a column that makes the bucket winner deterministic when
    timestamps collide."""
    bucket = F.floor(F.unix_timestamp("ts") / F.lit(seconds))
    order = [F.col("ts").asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = W.partitionBy("flight_id", "track", bucket).orderBy(*order)
    return tp.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def as_lines_sampled_every(
    tp: DataFrame, seconds: float, tiebreak: str | None = None
) -> DataFrame:
    """Track → line segments, ≥1 per time bucket (AsLinesSampledEvery,
    track.go:784-802). The reference's greedy walk cuts a line whenever
    more than `d` has elapsed since the last cut; the set-based twin
    downsamples to one point per bucket (same ≥1-per-duration guarantee
    as sample_every) and lag-pairs consecutive survivors into lines.
    One row per segment: (flight_id, track, t0, t1, lat0, lon0, lat1,
    lon1) — the waypoint matcher and complaint range join consume this
    shape."""
    pts = sample_every(tp, seconds, tiebreak=tiebreak)
    w = _w()
    return (
        pts.withColumn("lat0", F.lag("lat").over(w))
        .withColumn("lon0", F.lag("lon").over(w))
        .withColumn("t0", F.lag("ts").over(w))
        .filter(F.col("lat0").isNotNull())
        .select(
            "flight_id", "track",
            "t0", F.col("ts").alias("t1"),
            "lat0", "lon0",
            F.col("lat").alias("lat1"), F.col("lon").alias("lon1"),
        )
    )


def sample_every_dist(tp_with_dist: DataFrame, km: float) -> DataFrame:
    """≥1 point per dist_travelled_km bucket (SampleEveryDist,
    track.go:639-666); expects derived columns already computed."""
    bucket = F.floor(F.col("dist_travelled_km") / km)
    w = W.partitionBy("flight_id", "track", bucket).orderBy("ts")
    return (
        tp_with_dist.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def windowed_average_at(tp: DataFrame, t: datetime, window_s: float) -> DataFrame:
    """Synthetic per-flight point = mean of all points within the
    centered window around t (WindowedAverageAt, track.go:530-574;
    TrackpointFromAverage, trackpoint.go:149-181)."""
    half = window_s / 2.0
    return (
        tp.filter(
            (F.unix_timestamp("ts") >= F.unix_timestamp(F.lit(t)) - half)
            & (F.unix_timestamp("ts") <= F.unix_timestamp(F.lit(t)) + half)
        )
        .groupBy("flight_id")
        .agg(
            F.avg("lat").alias("lat"),
            F.avg("lon").alias("lon"),
            F.avg("alt_ft").alias("alt_ft"),
            F.avg("groundspeed_kt").alias("groundspeed_kt"),
            F.count(F.lit(1)).alias("n_averaged"),
        )
        .withColumn("ts", F.lit(t))
    )


def prune_track_contents(tp: DataFrame) -> DataFrame:
    """Keep only the first and last point per track — the RAM-saver for
    list views (PruneTrackContents, flight.go:207-214)."""
    w = _w()
    wd = W.partitionBy("flight_id", "track").orderBy(F.desc("ts"))
    return (
        tp.withColumn("_a", F.row_number().over(w))
        .withColumn("_z", F.row_number().over(wd))
        .filter((F.col("_a") == 1) | (F.col("_z") == 1))
        .drop("_a", "_z")
    )


def full_bounding_box(tp: DataFrame) -> DataFrame:
    """Per-track bbox (FullBoundingBox, track.go:57-65)."""
    return tp.groupBy("flight_id", "track").agg(
        F.min("lat").alias("lat_min"),
        F.max("lat").alias("lat_max"),
        F.min("lon").alias("lon_min"),
        F.max("lon").alias("lon_max"),
    )


def start_end_bounding_box(tp: DataFrame) -> DataFrame:
    """Bbox of just the endpoints (StartEndBoundingBox, track.go:46-50)."""
    ends = prune_track_contents(tp)
    return full_bounding_box(ends)


def indices_at_dists_from(
    tp: DataFrame, ref_lat: float, ref_lon: float, dist_kms: list[float]
) -> DataFrame:
    """First point inside each of a decreasing list of distances from a
    reference point (IndicesAtDistKMsFrom, track.go:501-522) — per-target
    conditional min-by, one aggregation for all targets."""
    d = haversine_km(F.col("lat"), F.col("lon"), F.lit(ref_lat), F.lit(ref_lon))
    base = tp.withColumn("_d", d)
    aggs = [
        F.min_by(F.struct("ts", "lat", "lon", "alt_ft"), F.when(F.col("_d") < km, F.col("ts"))).alias(
            f"at_{str(km).replace('.', '_')}km"
        )
        for km in dist_kms
    ]
    return base.groupBy("flight_id").agg(*aggs)


def merge_tracks(a: DataFrame, b: DataFrame) -> DataFrame:
    """Concat + stable time order (Track.Merge, track.go:266-271) —
    ordering is deferred to the consuming window/sort."""
    return a.unionByName(b, allowMissingColumns=True)


# --- scalar point math (trackpoint.go) --------------------------------------


def interpolate(v1: Column, v2: Column, ratio: Column) -> Column:
    """Linear interpolation (InterpolateTo, trackpoint.go:199-220)."""
    return v1 + (v2 - v1) * ratio


def interpolate_heading(h1: Column, h2: Column, ratio: Column) -> Column:
    """Circular interpolation for headings (trackpoint.go:212-216):
    take the short way around the compass."""
    diff = F.pmod(h2 - h1 + 540.0, F.lit(360.0)) - 180.0
    return F.pmod(h1 + diff * ratio, F.lit(360.0))


def reposition_by_time(
    lat: Column, lon: Column, groundspeed_kt: Column, heading_deg: Column, dt_s: Column
) -> tuple[Column, Column]:
    """Dead-reckon a point forward/backward at constant velocity
    (RepositionByTime, trackpoint.go:228-238). Returns (lat', lon')."""
    dist_km = groundspeed_kt * 1.852 * (dt_s / 3600.0)
    dlat = dist_km * F.cos(F.radians(heading_deg)) / 111.32
    dlon = dist_km * F.sin(F.radians(heading_deg)) / (111.32 * F.cos(F.radians(lat)))
    return lat + dlat, lon + dlon
