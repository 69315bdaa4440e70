"""Waypoint spatial join — which named fixes did each flight cross?

MatchWaypoints (flightpath.go:26-43): sample the track into line
segments, test each against a 1-km snap box around every waypoint
(KWaypointSnapKM, flightpath.go:9-11); the crossing time is the END
point of the first intersecting segment.

Spark shape: lag-window to build segments, a broadcast *range-predicate*
join against the (tiny) waypoint dim on coarse bbox overlap — no shuffle
of the trackpoint side, pushdown-friendly — then the exact segment×box
test vectorized in an Arrow batch over the few candidates. min_by(ts)
per (flight, waypoint) gives the reference's "break at first line".
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.geo import segment_intersects_box

WAYPOINT_SNAP_KM = 1.0  # flightpath.go:9-11
KM_PER_DEG_LAT = 111.32


def _seg_hits_box_udf():
    # created lazily: pandas_udf parses its DDL return type against the
    # active session, so the decorator can't run at import time
    @pandas_udf("boolean")
    def _seg_hits_box(
        lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series,
        blat_min: pd.Series, blat_max: pd.Series, blon_min: pd.Series, blon_max: pd.Series,
    ) -> pd.Series:
        out = [
            segment_intersects_box((a1, o1), (a2, o2), bl, bh, gl, gh)
            for a1, o1, a2, o2, bl, bh, gl, gh in zip(
                lat1, lon1, lat2, lon2, blat_min, blat_max, blon_min, blon_max
            )
        ]
        return pd.Series(out)

    return _seg_hits_box


def _waypoint_boxes(waypoints: DataFrame) -> DataFrame:
    """Waypoint dim (name, lat, lon) → snap boxes (pos.Box(1KM, 1KM))."""
    half_lat = WAYPOINT_SNAP_KM / 2.0 / KM_PER_DEG_LAT
    half_lon_expr = (WAYPOINT_SNAP_KM / 2.0) / (
        KM_PER_DEG_LAT * F.cos(F.radians(F.col("lat")))
    )
    return waypoints.select(
        F.col("name").alias("wp_name"),
        (F.col("lat") - half_lat).alias("blat_min"),
        (F.col("lat") + half_lat).alias("blat_max"),
        (F.col("lon") - half_lon_expr).alias("blon_min"),
        (F.col("lon") + half_lon_expr).alias("blon_max"),
    )


def match_waypoints(tp: DataFrame, waypoints: DataFrame) -> DataFrame:
    """(flight_id, track, ts, lat, lon) × waypoint dim → one row per
    (flight_id, waypoint): earliest crossing, ts = segment end
    (flightpath.go:37-39)."""
    w = W.partitionBy("flight_id", "track").orderBy("ts")
    segs = (
        tp.select("flight_id", "track", "ts", "lat", "lon")
        .withColumn("lat_prev", F.lag("lat").over(w))
        .withColumn("lon_prev", F.lag("lon").over(w))
        .filter(F.col("lat_prev").isNotNull())
    )
    boxes = F.broadcast(_waypoint_boxes(waypoints))
    # coarse prejoin: segment bbox overlaps waypoint box (plain range
    # predicates — the broadcast-nested-loop stays tiny because the
    # waypoint dim is tiny)
    coarse = (
        (F.least("lat_prev", "lat") <= F.col("blat_max"))
        & (F.greatest("lat_prev", "lat") >= F.col("blat_min"))
        & (F.least("lon_prev", "lon") <= F.col("blon_max"))
        & (F.greatest("lon_prev", "lon") >= F.col("blon_min"))
    )
    cand = segs.join(boxes, coarse)
    exact = cand.filter(
        _seg_hits_box_udf()(
            F.col("lat_prev"), F.col("lon_prev"), F.col("lat"), F.col("lon"),
            F.col("blat_min"), F.col("blat_max"), F.col("blon_min"), F.col("blon_max"),
        )
    )
    return (
        exact.groupBy("flight_id", "wp_name")
        .agg(F.min("ts").alias("ts"))  # first intersecting line wins
        .select("flight_id", F.col("wp_name").alias("waypoint"), "ts")
    )


def match_waypoints_points(
    ts: list, lat: list, lon: list, fixes: dict[str, tuple[float, float]]
) -> dict[str, float]:
    """Pure-Python MatchWaypoints over one point array (flightpath.go:
    26-43): first segment intersecting a fix's 1-km snap box wins, the
    crossing time is the segment END. Used by the streaming assembler's
    incremental per-fragment matching (addtrackfragment.go:123-136) —
    fragments are tiny, so the per-row loop is bounded and stays off
    the hot DataFrame path (match_waypoints above is the batch op)."""
    out: dict[str, float] = {}
    half_lat = WAYPOINT_SNAP_KM / 2.0 / KM_PER_DEG_LAT
    for name, (wlat, wlon) in fixes.items():
        half_lon = (WAYPOINT_SNAP_KM / 2.0) / (
            KM_PER_DEG_LAT * math.cos(math.radians(wlat))
        )
        box = (wlat - half_lat, wlat + half_lat, wlon - half_lon, wlon + half_lon)
        for i in range(1, len(ts)):
            if segment_intersects_box(
                (lat[i - 1], lon[i - 1]), (lat[i], lon[i]), *box
            ):
                out[name] = ts[i]
                break
    return out


def set_waypoints(flights: DataFrame, crossings: DataFrame) -> DataFrame:
    """Fold crossings back into the flights table's waypoints map
    (SetWaypoint, flight.go; AnalyseWaypoints full-reset semantics)."""
    wp_map = (
        crossings.groupBy("flight_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("waypoint", "ts"))
            ).alias("_wp_new")
        )
    )
    return (
        flights.drop("waypoints")
        .join(wp_map, "flight_id", "left")
        .withColumn(
            "waypoints",
            F.coalesce(F.col("_wp_new"), F.create_map().cast("map<string,timestamp>")),
        )
        .drop("_wp_new")
    )


def match_waypoints_bucketed(
    tp: DataFrame, waypoints: DataFrame, *, cell_deg: float = 0.05
) -> DataFrame:
    """``match_waypoints`` through a grid-cell equi-join — the scale
    path for a LARGE waypoint dimension (the broadcast range join above
    is right while the dim stays tiny; its cost is segments × boxes).

    Both sides map to the integer lat/lon cells their bboxes cover
    (segments are short → 1-2 cells; snap boxes are ~1 km → 1-4 cells),
    candidates come from a hash equi-join on the cell id, duplicates
    from multi-cell overlap collapse before the exact Arrow-batched
    segment×box test. Identical output to match_waypoints (equality-
    tested); the join key is (cell), so cost tracks cell co-occupancy
    — never segments × boxes."""
    w = W.partitionBy("flight_id", "track").orderBy("ts")
    segs = (
        tp.select("flight_id", "track", "ts", "lat", "lon")
        .withColumn("lat_prev", F.lag("lat").over(w))
        .withColumn("lon_prev", F.lag("lon").over(w))
        .filter(F.col("lat_prev").isNotNull())
    )
    inv = 1.0 / cell_deg

    def cells_of(lat_lo, lat_hi, lon_lo, lon_hi):
        return F.expr(
            f"flatten(transform(sequence(floor({lat_lo} * {inv}), "
            f"floor({lat_hi} * {inv})), "
            f"la -> transform(sequence(floor({lon_lo} * {inv}), "
            f"floor({lon_hi} * {inv})), "
            "lo -> concat(la, ':', lo))))"
        )
    seg_cells = segs.withColumn(
        "cell",
        F.explode(
            cells_of(
                "least(lat_prev, lat)", "greatest(lat_prev, lat)",
                "least(lon_prev, lon)", "greatest(lon_prev, lon)",
            )
        ),
    )
    boxes = _waypoint_boxes(waypoints)
    box_cells = boxes.withColumn(
        "cell", F.explode(cells_of("blat_min", "blat_max", "blon_min", "blon_max"))
    )
    cand = (
        seg_cells.join(box_cells, "cell")
        .dropDuplicates(
            ["flight_id", "track", "ts", "lat_prev", "lon_prev", "wp_name"]
        )
    )
    exact = cand.filter(
        _seg_hits_box_udf()(
            F.col("lat_prev"), F.col("lon_prev"), F.col("lat"), F.col("lon"),
            F.col("blat_min"), F.col("blat_max"), F.col("blon_min"), F.col("blon_max"),
        )
    )
    return (
        exact.groupBy("flight_id", "wp_name")
        .agg(F.min("ts").alias("ts"))
        .select("flight_id", F.col("wp_name").alias("waypoint"), "ts")
    )
