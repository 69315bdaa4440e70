"""Trajectory-metrics batch 29 (q290-q291): path tortuosity (flown
distance over great-circle displacement — the wandering index that
separates vectoring from direct routing) and per-track convex hulls
(monotone chain, the operating-area summary). Tortuosity is fully
oracle-checked; the hull is rows-only (sequential chain scan) with a
pure-Python parity pin, the bounded-per-key applyInPandas pattern
(q234/q258/q261).

Reference basis: trajectory analysis family (SURVEY §2.4; track.go's
DistanceTravelledKM + bounding boxes — the hull is the tighter
operating-area summary the reference approximates with boxes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..functions.geo import HAVERSINE_SQL, haversine_km
from . import query
from .synth import SYNTH_TP_CTE, synth_trackpoints


# ---------------------------------------------------------------------------
# q290 — path tortuosity


@query(
    "q290_tortuosity",
    oracle=f"""
    WITH {SYNTH_TP_CTE},
    steps AS (
      SELECT flight_id, ts, event_id, lat, lon,
             CAST(ROUND({HAVERSINE_SQL.format(
                 lat1="LAG(lat) OVER w", lon1="LAG(lon) OVER w",
                 lat2="lat", lon2="lon")}, 6) AS DECIMAL(38,6)) AS step6,
             ROW_NUMBER() OVER (PARTITION BY flight_id
                                ORDER BY ts, event_id) AS rn_first,
             ROW_NUMBER() OVER (PARTITION BY flight_id
                                ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM trackpoints
      WINDOW w AS (PARTITION BY flight_id ORDER BY ts, event_id)
    ),
    flown AS (
      SELECT flight_id,
             CAST(COUNT(*) AS BIGINT) AS n_points,
             SUM(step6) AS flown6
      FROM steps GROUP BY flight_id
    ),
    ends AS (
      SELECT f.flight_id,
             ROUND({HAVERSINE_SQL.format(
                 lat1="f.lat", lon1="f.lon", lat2="l.lat", lon2="l.lon")}, 6)
               AS straight_km
      FROM (SELECT * FROM steps WHERE rn_first = 1) f
      JOIN (SELECT * FROM steps WHERE rn_last = 1) l USING (flight_id)
    )
    SELECT fl.flight_id, fl.n_points,
           ROUND(CAST(fl.flown6 AS DOUBLE), 3) AS flown_km,
           e.straight_km,
           ROUND(CAST(fl.flown6 AS DOUBLE) / NULLIF(e.straight_km, 0.0), 4)
             AS tortuosity
    FROM flown fl JOIN ends e USING (flight_id)
    ORDER BY fl.flight_id
    """,
)
def q290_tortuosity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path tortuosity: flown distance (6-dp-rounded DECIMAL step sums
    — order-free, unlike q21's display-grade double sum) divided by
    the great-circle displacement between the track's first and last
    points (total (ts, event_id) order). Tortuosity ~1 is a direct
    route; large values are vectoring/holding — the one-number route-
    efficiency metric beside q202's geometry simplification.

    Plan: ONE flight-partitioned Exchange carries the step lag and
    both endpoint ranks; the per-flight rollup and the endpoint join
    ride the same key. NULLIF guards a zero-displacement loop."""
    tp = synth_trackpoints(spark, sf_dir)
    wp = Window.partitionBy("flight_id")
    w = wp.orderBy("ts", "event_id")
    step6 = F.round(
        haversine_km(
            F.lag("lat").over(w), F.lag("lon").over(w), F.col("lat"), F.col("lon")
        ),
        6,
    ).cast("decimal(38,6)")
    steps = tp.select(
        "flight_id",
        "lat",
        "lon",
        step6.alias("step6"),
        F.row_number().over(w).alias("rn_first"),
        F.row_number()
        .over(wp.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rn_last"),
    )
    flown = steps.groupBy("flight_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum("step6").alias("flown6"),
    )
    f = steps.filter(F.col("rn_first") == 1).select(
        "flight_id", F.col("lat").alias("lat_f"), F.col("lon").alias("lon_f")
    )
    l = steps.filter(F.col("rn_last") == 1).select(
        "flight_id", F.col("lat").alias("lat_l"), F.col("lon").alias("lon_l")
    )
    ends = f.join(l, "flight_id").select(
        "flight_id",
        F.round(
            haversine_km(
                F.col("lat_f"), F.col("lon_f"), F.col("lat_l"), F.col("lon_l")
            ),
            6,
        ).alias("straight_km"),
    )
    return (
        flown.join(ends, "flight_id")
        .select(
            "flight_id",
            "n_points",
            F.round(F.col("flown6").cast("double"), 3).alias("flown_km"),
            "straight_km",
            F.round(
                F.col("flown6").cast("double")
                / F.nullif(F.col("straight_km"), F.lit(0.0)),
                4,
            ).alias("tortuosity"),
        )
        .orderBy("flight_id")
    )


# ---------------------------------------------------------------------------
# q291 — convex hull (rows-only; Python-parity pinned)


_HULL_SCHEMA = StructType(
    [
        StructField("flight_id", LongType()),
        StructField("n_points", LongType()),
        StructField("n_hull_points", IntegerType()),
        StructField("hull_area_deg2", DoubleType()),
    ]
)


def convex_hull_stats(pdf):
    """Andrew's monotone chain over one flight's (lon, lat) points;
    returns hull size and shoelace area. Pure function shared with
    the parity test."""
    import pandas as pd

    fid = int(pdf["flight_id"].iloc[0])
    pts = sorted(set(zip(pdf["lon"].tolist(), pdf["lat"].tolist())))
    n = len(pdf)

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    if len(pts) <= 2:
        hull = pts
    else:
        lower, upper = [], []
        for p in pts:
            while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
                lower.pop()
            lower.append(p)
        for p in reversed(pts):
            while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
                upper.pop()
            upper.append(p)
        hull = lower[:-1] + upper[:-1]
    area = 0.0
    for i in range(len(hull)):
        x1, y1 = hull[i]
        x2, y2 = hull[(i + 1) % len(hull)]
        area += x1 * y2 - x2 * y1
    area = abs(area) / 2.0 if len(hull) >= 3 else 0.0
    return pd.DataFrame(
        [(fid, n, len(hull), round(area, 9))],
        columns=["flight_id", "n_points", "n_hull_points", "hull_area_deg2"],
    )


@query("q291_convex_hull")  # rows-only: sequential chain scan
def q291_convex_hull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-track convex hull (Andrew's monotone chain): hull vertex
    count and shoelace area in squared degrees — the tight
    operating-area summary the reference approximates with bounding
    boxes (track.go's FullBoundingBox / AsContiguousBoxes, q22/
    boxes.py). The chain scan is sequential over the sorted point
    set, so it runs per flight in Arrow-batched applyInPandas over
    the BOUNDED per-flight points — rows-only, with the hull pinned
    against a direct Python run in tests (plus the containment
    invariant: hull area <= bounding-box area, vertices <= distinct
    points).

    Plan: one flight-keyed shuffle; Python sees (flight_id, lat, lon)
    only."""
    tp = synth_trackpoints(spark, sf_dir)

    def _apply(pdf):
        return convex_hull_stats(pdf)

    return (
        tp.select("flight_id", "lat", "lon")
        .groupBy("flight_id")
        .applyInPandas(_apply, schema=_HULL_SCHEMA)
        .orderBy("flight_id")
    )
